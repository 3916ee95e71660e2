"""Kernel -> state-space conversions vs analytic covariance functions.

Oracle structure per SURVEY.md section 4: closed-form kernel <-> SS
conversions tested against analytic covariances k(r) = H expm(F r) Pinf H'.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.scipy.linalg import expm

from nsgp_tpu.ops import kernels as K


def ss_cov(ss, r):
    """Covariance at lag r >= 0 implied by the SS model."""
    return float((ss.H @ expm(ss.F * r) @ ss.Pinf @ ss.H.T)[0, 0])


def analytic(name, sigma2, ell, r):
    if name == "exp":
        return sigma2 * np.exp(-r / ell)
    if name == "matern32":
        a = np.sqrt(3.0) * r / ell
        return sigma2 * (1 + a) * np.exp(-a)
    if name == "matern52":
        a = np.sqrt(5.0) * r / ell
        return sigma2 * (1 + a + a * a / 3.0) * np.exp(-a)
    if name == "matern72":
        a = np.sqrt(7.0) * r / ell
        return sigma2 * (1 + a + 2.0 / 5.0 * a**2 + a**3 / 15.0) * np.exp(-a)
    if name == "se":
        return sigma2 * np.exp(-0.5 * (r / ell) ** 2)
    raise ValueError(name)


@pytest.mark.parametrize("name", ["exp", "matern32", "matern52", "matern72"])
@pytest.mark.parametrize("sigma2,ell", [(1.0, 1.0), (2.5, 0.3), (0.01, 150.0)])
def test_matern_family_covariance(name, sigma2, ell):
    ss = K.get_kernel(name)(sigma2, ell, dtype=jnp.float64)
    for r in [0.0, 0.1 * ell, ell, 3.0 * ell]:
        got = ss_cov(ss, r)
        want = analytic(name, sigma2, ell, r)
        assert abs(got - want) < 1e-9 * max(1.0, sigma2), (name, r, got, want)


@pytest.mark.parametrize("sigma2,ell", [(1.0, 1.0), (4.0, 2.0)])
def test_se_approximation(sigma2, ell):
    ss = K.se_to_ss(sigma2, ell, order=6, dtype=jnp.float64)
    # order-6 Taylor approximation: a few percent accuracy near the origin
    for r in [0.0, 0.25 * ell, 0.5 * ell, ell]:
        got = ss_cov(ss, r)
        want = analytic("se", sigma2, ell, r)
        assert abs(got - want) < 0.05 * sigma2, (r, got, want)
    assert abs(ss_cov(ss, 0.0) - sigma2) < 1e-2 * sigma2


@pytest.mark.parametrize("name", ["exp", "matern32", "matern52", "matern72", "se"])
def test_pinf_solves_lyapunov(name):
    ss = K.get_kernel(name)(1.7, 0.8, dtype=jnp.float64)
    resid = ss.F @ ss.Pinf + ss.Pinf @ ss.F.T + ss.L @ ss.Qc @ ss.L.T
    assert np.max(np.abs(np.asarray(resid))) < 1e-8


def test_lyap_matches_scipy():
    from scipy.linalg import solve_lyapunov

    rng = np.random.default_rng(0)
    A = rng.normal(size=(5, 5))
    A = A - 6 * np.eye(5)  # make stable
    Q = rng.normal(size=(5, 5))
    Q = Q @ Q.T
    got = np.asarray(K.lyap(jnp.asarray(A), jnp.asarray(Q)))
    want = solve_lyapunov(A, -Q)
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_kernels_jit_and_grad():
    f = jax.jit(lambda s2, ell: K.matern52_to_ss(s2, ell).Pinf.sum())
    g = jax.grad(f, argnums=(0, 1))(1.0, 2.0)
    assert np.isfinite(np.asarray(g)).all()
