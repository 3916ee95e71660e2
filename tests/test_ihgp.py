"""IHGP engine: DARE solver vs scipy oracle; steady-state EP vs full EP."""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from nsgp_tpu.inference import ep, ihgp
from nsgp_tpu.models.gtnmf import GTNMFModel, GTNMFParams, sample_prior
from nsgp_tpu.ops import dare as dare_mod


def test_dare_filter_vs_scipy():
    """Doubling-iteration DARE matches scipy's Schur solver."""
    from scipy.linalg import solve_discrete_are

    rng = np.random.default_rng(0)
    for trial in range(5):
        bs = 4
        # stable random A
        A = rng.normal(size=(bs, bs)) * 0.3
        A = A / max(1.0, 1.1 * np.max(np.abs(np.linalg.eigvals(A))))
        h = rng.normal(size=bs)
        Lq = rng.normal(size=(bs, bs)) * 0.5
        Q = Lq @ Lq.T + 0.01 * np.eye(bs)
        r = float(10.0 ** rng.uniform(-2, 2))

        # filtering DARE == control DARE with (A', h) swap
        P_ref = solve_discrete_are(A.T, h[:, None], Q, np.array([[r]]))
        P = dare_mod.dare_filter(jnp.asarray(A), jnp.asarray(h), jnp.asarray(Q), r)
        np.testing.assert_allclose(np.asarray(P), P_ref, rtol=1e-8, atol=1e-10)


def test_dlyap_doubling_vs_scipy():
    from scipy.linalg import solve_discrete_lyapunov

    rng = np.random.default_rng(1)
    bs = 5
    M = rng.normal(size=(bs, bs)) * 0.3
    M = M / max(1.0, 1.5 * np.max(np.abs(np.linalg.eigvals(M))))
    Lq = rng.normal(size=(bs, bs))
    Q = Lq @ Lq.T
    X_ref = solve_discrete_lyapunov(M, Q)
    X = dare_mod.dlyap_doubling(jnp.asarray(M), jnp.asarray(Q))
    np.testing.assert_allclose(np.asarray(X), X_ref, rtol=1e-9, atol=1e-10)


def test_cubic_interp_matrix_reproduces_smooth_fn():
    xg = np.linspace(0.0, 1.0, 20)
    xq = np.linspace(0.0, 1.0, 97)
    W = dare_mod.cubic_interp_matrix(xg, xq)
    np.testing.assert_allclose(W.sum(1), 1.0, atol=1e-12)
    f = np.sin(2 * np.pi * xg)
    fq = W @ f
    # full cubic accuracy in the interior; clamped (lower-order) at edges
    np.testing.assert_allclose(fq[5:-5], np.sin(2 * np.pi * xq)[5:-5], atol=2e-3)
    np.testing.assert_allclose(fq, np.sin(2 * np.pi * xq), atol=5e-2)


def _toy():
    model = GTNMFModel(D=3, N=2, kernel1="matern32", kernel2="matern52",
                       p_cubature=7)
    key = jax.random.PRNGKey(0)
    params = GTNMFParams(
        lik=jnp.asarray(0.05),
        sub_var=jnp.linspace(0.5, 1.5, 3),
        sub_len=jnp.linspace(30.0, 90.0, 3),
        omega=jnp.linspace(0.2, 1.2, 3),
        mod_var=jnp.full((2,), 1.5),
        mod_len=jnp.asarray([300.0, 500.0]),
        W=jax.random.uniform(key, (3, 2), minval=0.2, maxval=1.0),
    )
    return model, params


def test_ihgp_matches_full_ep_posterior():
    """Steady-state EP approximates the full-Kalman EP posterior.

    The reference validates IHGP the same way (synthetic_data_experiment.m:
    engine-vs-engine RMSE); agreement is approximate because IHGP uses
    steady-state covariances.
    """
    model, params = _toy()
    y, sub, g = sample_prior(jax.random.PRNGKey(42), model, params, T=600)

    res_ep = ep.ep_infer(model, params, y, None, ep.EPConfig(ep_itts=4))
    # Reference-exact IHGP wants the reference's heavy-damping regime
    # (source_sep_piano.m:84-88); 0.5 damping can diverge on low-noise toys.
    res_ih = ihgp.ihgp_infer(model, params, y, None,
                             ihgp.IHGPConfig(ep_itts=10, damping=(0.1,)))

    # Subband posterior means correlate near-perfectly away from the
    # boundary transient (the steady recursions are exact for fast channels;
    # slow modulator channels carry the IHGP approximation error, like the
    # reference).  Fixed points differ slightly (ADF at steady variances),
    # so we check correlation rather than equality.
    sl = slice(60, -60)
    for c in range(model.D):
        a = np.asarray(res_ep.Eft[sl, c])
        b = np.asarray(res_ih.Eft[sl, c])
        r = np.corrcoef(a, b)[0, 1]
        assert r > 0.99, (c, r)

    # Both engines should track the true signal: compare reconstruction RMSE.
    def recon(res):
        from nsgp_tpu.ops.moments import LINKS
        zf = np.asarray(res.Eft[:, :3])
        gf = np.asarray(res.Eft[:, 3:])
        amps = np.asarray(LINKS["softplus"](jnp.asarray(gf)) @ params.W.T)
        return (zf * amps).sum(-1)

    rmse_ep = np.sqrt(np.mean((recon(res_ep) - np.asarray(y)) ** 2))
    rmse_ih = np.sqrt(np.mean((recon(res_ih) - np.asarray(y)) ** 2))
    assert rmse_ih < 2.0 * rmse_ep + 0.05, (rmse_ih, rmse_ep)


def test_ihgp_energy_finite_and_differentiable():
    model, params = _toy()
    y, _, _ = sample_prior(jax.random.PRNGKey(7), model, params, T=300)
    e = ihgp.ihgp_energy(model, params, y, None, ihgp.IHGPConfig(ep_itts=1))
    assert np.isfinite(float(e))
    g = jax.grad(
        lambda p: ihgp.ihgp_energy(model, p, y, None, ihgp.IHGPConfig(ep_itts=1))
    )(params)
    flat, _ = jax.flatten_util.ravel_pytree(g)
    assert np.all(np.isfinite(np.asarray(flat)))


def test_blocked_steady_passes_match_one_level():
    """parallel=True with chunk>0 (blocked two-level scan, the long-signal
    fast path that never materializes (T, C, bs, bs)) must agree with the
    one-level associative scan (chunk=0) to float tolerance."""
    model, params = _toy()
    y, _, _ = sample_prior(jax.random.PRNGKey(3), model, params, T=1500)
    kw = dict(ep_itts=5, damping=(0.1,), parallel=True)
    r_one = ihgp.ihgp_infer(model, params, y, None,
                            ihgp.IHGPConfig(chunk=0, **kw))
    r_blk = ihgp.ihgp_infer(model, params, y, None,
                            ihgp.IHGPConfig(chunk=256, **kw))
    np.testing.assert_allclose(
        np.asarray(r_blk.Eft), np.asarray(r_one.Eft), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(r_blk.Varft), np.asarray(r_one.Varft), atol=1e-10
    )


def test_pf_correct_steady_smoothed_variance_matches_exact():
    """Table-level check of IHGPConfig.pf_correct: for CONSTANT strong sites
    the steady smoothed variance must match an exact fixed-site
    filter/smoother run, while the reference quirk Pf = PP - K ro K'
    (ihgp_ep_modulator_nmf.m:162) overestimates it by a large factor
    (ROUND4_NOTES item 2b: 5-20x measured at audio scale)."""
    from nsgp_tpu.ops import kalman

    model, params = _toy()
    params = params._replace(lik=jnp.asarray(1e-4))
    ssm = model.build_ssm(params)
    C = ssm.num_channels
    T = 400
    ttau_val = 1.0 / 1e-3  # strong site: effective noise R = 1e-3
    sites = kalman.Sites(jnp.full((T, C), ttau_val), jnp.zeros((T, C)))
    fr = kalman.filter_with_sites(ssm, sites, store=True)
    ms, Ps = kalman.rts_smoother(ssm, fr)
    _, var_exact = kalman.observable_marginals(ssm, ms, Ps)
    v_exact = np.asarray(var_exact[T // 2])  # (C,) mid-signal steady value

    cfg = ihgp.IHGPConfig(grid_lo=-6.0)
    idx = ihgp._lookup_idx(ihgp.build_tables(ssm, cfg),
                           jnp.full((C,), ttau_val))
    v_quirk = np.asarray(
        ihgp.build_tables(ssm, cfg).hPSh[np.arange(C), np.asarray(idx)])
    tab_fix = ihgp.build_tables(ssm, cfg._replace(pf_correct=True))
    v_fix = np.asarray(tab_fix.hPSh[np.arange(C), np.asarray(idx)])

    D = model.D
    r_quirk = np.median(v_quirk[:D] / v_exact[:D])
    r_fix = np.median(v_fix[:D] / v_exact[:D])
    # the quirk overestimates the subband smoothed variance severely;
    # the corrected tables land within interpolation error of exact
    assert r_quirk > 3.0, r_quirk
    assert 0.5 < r_fix < 1.5, r_fix


def test_pf_correct_multisweep_reduces_cavity_bias():
    """End-to-end: with converged-ish sites the corrected tables cut the
    posterior-variance overestimate vs full EP by at least 2x (the EP-loop
    keeps a residual gap from site-strength differences, so only the
    relative improvement is asserted)."""
    model, params = _toy()
    params = params._replace(lik=jnp.asarray(1e-4))
    y, _, _ = sample_prior(jax.random.PRNGKey(7), model, params, T=600)

    res_ep = ep.ep_infer(
        model, params, y, None,
        ep.EPConfig(ep_itts=12, ep_fraction=0.75, damping=(0.5,)),
    )
    cfg = ihgp.IHGPConfig(ep_itts=12, ep_fraction=0.75, damping=(0.1,),
                          grid_lo=-9.0)
    r_quirk = ihgp.ihgp_infer(model, params, y, None, cfg)
    r_fix = ihgp.ihgp_infer(model, params, y, None,
                            cfg._replace(pf_correct=True))

    sl = slice(60, -60)
    D = model.D
    ve = np.asarray(res_ep.Varft[sl, :D])
    ratio_quirk = np.median(np.asarray(r_quirk.Varft[sl, :D]) / ve)
    ratio_fix = np.median(np.asarray(r_fix.Varft[sl, :D]) / ve)
    assert ratio_quirk > 2.0 * ratio_fix, (ratio_quirk, ratio_fix)
    assert bool(jnp.all(jnp.isfinite(r_fix.Eft)))


def test_keep_best_never_worse_than_best_sweep():
    """keep_best (energy-based sweep selection): the returned posterior's
    evaluation energy can never exceed every recorded per-sweep energy, and
    on a benign run it must coincide with a normal run's trajectory entry."""
    model, params = _toy()
    y, _, _ = sample_prior(jax.random.PRNGKey(9), model, params, T=500)
    cfg = ihgp.IHGPConfig(ep_itts=6, damping=(0.1,), grid_lo=-6.0)
    r = ihgp.ihgp_infer(model, params, y, None, cfg)
    rb = ihgp.ihgp_infer(model, params, y, None, cfg._replace(keep_best=True))
    assert bool(jnp.all(jnp.isfinite(rb.Eft)))
    # the selected posterior matches one of the plain run's sweeps in
    # energy terms: its own trajectory is identical (sites unchanged), so
    # nlZ arrays agree
    np.testing.assert_allclose(np.asarray(rb.nlZ), np.asarray(r.nlZ),
                               rtol=1e-10)
    # and on this benign config the energies decrease, so keep_best returns
    # the final sweep — posteriors equal
    if bool(jnp.all(jnp.diff(r.nlZ[1:]) <= 0)):
        np.testing.assert_allclose(np.asarray(rb.Eft), np.asarray(r.Eft),
                                   atol=1e-9)
