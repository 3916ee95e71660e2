"""Direct oracle tests for the EP moment layer (ops/moments.py).

These pin down the load-bearing quantities of the whole EP fixed point:
  - lZ against a dense high-order Gauss-Hermite tensor-grid oracle
    (ref likModulatorNMFPower.m:58-83 math, evaluated brute-force in f64),
  - dlZ/d2lZ against central finite differences of lZ w.r.t. the cavity
    means (the reference never tests these; engine-agreement was the only
    indirect check before),
  - f32 vs f64 agreement, including the far-tail regime where the raw
    normpdf accumulation used to underflow in f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsgp_tpu.ops.moments import MomentParams, moments, softplus


def _gh_oracle(mp, sn2, y, mu, s2, W, frac=1.0, n_gh=40):
    """Brute-force lZ: analytic z-integral + dense GH tensor grid over g.

    Z = E_{g ~ N(mu_g, diag(s2_g))} N(y | a(g)' mu_z, sn2/frac + a^2' s2_z)
    """
    D, N = mp.D, mp.N
    mu = np.asarray(mu, np.float64)
    s2 = np.asarray(s2, np.float64)
    W = np.asarray(W, np.float64)
    mu_z, mu_g = mu[:D], mu[D:]
    s2_z, s2_g = s2[:D], s2[D:]

    x1, w1 = np.polynomial.hermite_e.hermegauss(n_gh)  # weight e^{-x^2/2}
    w1 = w1 / np.sqrt(2 * np.pi)
    grids = np.meshgrid(*([x1] * N), indexing="ij")
    xi = np.stack([g.ravel() for g in grids], -1)  # (S, N)
    wgrids = np.meshgrid(*([w1] * N), indexing="ij")
    ws = np.ones(xi.shape[0])
    for g in wgrids:
        ws = ws * g.ravel()

    xn = mu_g[None] + np.sqrt(s2_g)[None] * xi  # (S, N)
    link = np.logaddexp(0.0, xn) if mp.link == "softplus" else np.exp(xn)
    a = link @ W.T  # (S, D)
    if mp.variant == "sq":
        a = np.sqrt(a)
    s_eff = sn2 / frac + (a * a) @ s2_z
    mean = a @ mu_z
    dens = np.exp(-0.5 * (y - mean) ** 2 / s_eff) / np.sqrt(2 * np.pi * s_eff)
    Z = float(np.sum(ws * dens))
    return np.log(Z)


def _rand_inputs(key, D, N):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    mu = jnp.concatenate(
        [0.5 * jax.random.normal(k1, (D,)), 0.3 * jax.random.normal(k2, (N,))]
    )
    s2 = jnp.concatenate(
        [0.1 + 0.3 * jax.random.uniform(k3, (D,)), 0.2 + 0.5 * jax.random.uniform(k3, (N,))]
    )
    W = 0.1 + jax.random.uniform(k4, (D, N))
    return mu, s2, W


@pytest.mark.parametrize("variant", ["amp", "sq"])
@pytest.mark.parametrize("p", [5, 7, 9])
def test_lz_matches_dense_gh_oracle(variant, p):
    D, N = 4, 2
    mp = MomentParams(D=D, N=N, p_cubature=p, variant=variant)
    mu, s2, W = _rand_inputs(jax.random.PRNGKey(0), D, N)
    sn2, y, frac = 1e-2, 0.7, 0.5
    lZ, _, _ = moments(mp, sn2, jnp.asarray(y), mu, s2, W, frac)
    lZ_or = _gh_oracle(mp, sn2, y, mu, s2, W, frac)
    # symmetric rules are exact only to polynomial degree p; on this smooth
    # non-polynomial integrand the residual error is ~1e-2 and NOT monotone
    # in p (measured: amp p=7 err 1.0e-2, p=9 err 5.1e-3)
    assert abs(float(lZ) - lZ_or) < 2e-2, (p, float(lZ), lZ_or)


@pytest.mark.parametrize("variant", ["amp", "sq"])
@pytest.mark.parametrize("link", ["softplus", "exp"])
def test_dlz_d2lz_match_finite_differences(variant, link):
    """dlZ/d2lZ are derivatives of lZ w.r.t. the CAVITY MEAN components."""
    D, N = 3, 2
    mp = MomentParams(D=D, N=N, p_cubature=9, variant=variant, link=link)
    mu, s2, W = _rand_inputs(jax.random.PRNGKey(1), D, N)
    sn2, y, frac = 1e-2, 0.4, 0.8

    lZ, dlZ, d2lZ = moments(mp, sn2, jnp.asarray(y), mu, s2, W, frac)
    eps = 1e-5
    for i in range(D + N):
        e = jnp.zeros(D + N).at[i].set(eps)
        lp, dp, _ = moments(mp, sn2, jnp.asarray(y), mu + e, s2, W, frac)
        lm, dm, _ = moments(mp, sn2, jnp.asarray(y), mu - e, s2, W, frac)
        fd1 = (float(lp) - float(lm)) / (2 * eps)
        fd2 = (float(dp[i]) - float(dm[i])) / (2 * eps)
        if i < D:
            # z-dims: dlZ is the EXACT derivative of the quadrature formula
            # (sigma points do not depend on mu_z) -> tight agreement.
            tol1, tol2 = 1e-7, 1e-6
        else:
            # g-dims: the reference uses the score form E[(x-mu)/s2 f]/Z —
            # the derivative of the TRUE integral, which differs from FD of
            # the quadrature lZ by cubature error (~1e-3 measured at ut9).
            tol1, tol2 = 5e-3, 2e-2
        assert abs(fd1 - float(dlZ[i])) < tol1 * max(1.0, abs(fd1)), (i, fd1, float(dlZ[i]))
        assert abs(fd2 - float(d2lZ[i])) < tol2 * max(1.0, abs(fd2)), (i, fd2, float(d2lZ[i]))


def test_f32_matches_f64_well_scaled():
    D, N = 4, 2
    mp = MomentParams(D=D, N=N, p_cubature=9)
    mu, s2, W = _rand_inputs(jax.random.PRNGKey(2), D, N)
    sn2, y = 1e-3, 0.5
    lZ64, dlZ64, d2lZ64 = moments(mp, sn2, jnp.asarray(y), mu, s2, W, 0.5)
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    lZ32, dlZ32, d2lZ32 = moments(
        mp, f32(sn2), f32(y), f32(mu), f32(s2), f32(W), 0.5
    )
    assert abs(float(lZ32) - float(lZ64)) < 1e-4 * max(1.0, abs(float(lZ64)))
    np.testing.assert_allclose(np.asarray(dlZ32), np.asarray(dlZ64), rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(d2lZ32), np.asarray(d2lZ64), rtol=5e-3, atol=5e-3)


def test_far_tail_floors_at_reference_jitter():
    """A far-tail residual underflows the raw normpdf sum, so the reference
    floors Z at 1e-10 (likModulatorNMFPower.m:55) => lZ == log(1e-10).  The
    raw-scale floor must reproduce that exactly in both precisions."""
    D, N = 4, 2
    mp = MomentParams(D=D, N=N, p_cubature=9)  # default z_floor = 1e-10
    mu, s2, W = _rand_inputs(jax.random.PRNGKey(3), D, N)
    lZ64, _, _ = moments(mp, 1e-3, jnp.asarray(50.0), mu, s2, W, 1.0)
    assert abs(float(lZ64) - np.log(1e-10)) < 1e-9
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    lZ32, _, _ = moments(mp, f32(1e-3), f32(50.0), f32(mu), f32(s2), f32(W), 1.0)
    assert abs(float(lZ32) - np.log(1e-10)) < 1e-4


def test_f32_far_tail_no_underflow():
    """Max-shifted accumulation: an extreme residual (all densities tiny)
    must produce a finite, f64-consistent lZ in f32.  z_floor=1e-300
    disables the reference's Z floor (it casts to 0.0 in f32, making the
    floor -inf == no floor) so this exercises the shift machinery itself."""
    D, N = 4, 2
    mp = MomentParams(D=D, N=N, p_cubature=9, z_floor=1e-300)
    mu, s2, W = _rand_inputs(jax.random.PRNGKey(3), D, N)
    sn2 = 1e-3
    y = 50.0  # ~ 50-sigma residual: log-density ~ -1e6 in the worst case
    lZ64, dlZ64, _ = moments(mp, sn2, jnp.asarray(y), mu, s2, W, 1.0)
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    lZ32, dlZ32, _ = moments(mp, f32(sn2), f32(y), f32(mu), f32(s2), f32(W), 1.0)
    assert np.isfinite(float(lZ32))
    assert float(lZ64) < -100.0  # genuinely far tail
    assert abs(float(lZ32) - float(lZ64)) < 1e-3 * abs(float(lZ64))
    # gradient direction must survive in f32 (pulls the cavity toward y)
    assert np.all(np.isfinite(np.asarray(dlZ32)))
    assert np.dot(np.asarray(dlZ32), np.asarray(dlZ64)) > 0.0
