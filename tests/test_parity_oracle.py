"""Posterior parity against the reference implementation (via numpy oracle).

THE acceptance test of BASELINE.json ("posterior moments match MATLAB within
MC error"), VERDICT round-2 item 1.  tests/ref_oracle.py is a line-faithful
numpy port of the reference inference path (gf_ep_modulator_nmf.m +
ss_modulators_nmf.m + likModulator*Power.m + the cubature rules); both the
oracle and the JAX engine are fed the SAME observations, and the JAX EP
posterior must reproduce the oracle's Eft / Varft / nlZ far inside MC error
(we assert near float64 round-off, orders of magnitude tighter than MC
error).

Two configs, mirroring the reference's seeded toy demos:
  - demo_toy_modulators_nmf.m:4-24 (D=10, N=2, T=5000, matern32+matern52,
    p_cubature=9, ep_fraction=0.5, 3 sweeps at damping 0.5, w_lik=1e-4)
  - demo_toy_modulators.m:5-30 (per-subband D=2, T=2000, 5 sweeps at
    damping 0.3, w_lik=1e-5) — the NMF model with N=D, W=I.

MATLAB's RNG stream cannot be reproduced here, so the demo's *parameter
distributions* are sampled with a fixed numpy seed and the signal is drawn
from the oracle's own state-space prior — exactly the "export the sampled
signal rather than matching RNGs" recipe.  The scale (T, D, N, kernels,
EP knobs) is the demos' own.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nsgp_tpu.inference.ep import EPConfig, ep_energy, ep_infer
from nsgp_tpu.models.gtnmf import GTNMFModel, GTNMFParams, per_subband_params

import ref_oracle as ref


# ---------------------------------------------------------------------------
# Config A: demo_toy_modulators_nmf.m
# ---------------------------------------------------------------------------


def _nmf_demo_setup(T=5000, D=10, N=2, seed=100):
    """Parameters per demo_toy_modulators_nmf.m:28-33 (numpy rng)."""
    rng = np.random.default_rng(seed)
    len_fast = 150.0 + 400.0 * rng.random(D)
    var_fast = 0.01 * np.ones(D)
    omega = np.linspace(np.pi / 3, np.pi / 50, D)
    len_slow = np.linspace(200.0, 1500.0, N)
    var_slow = 5.0 + 5.0 * rng.random(N)
    W = 0.1 * np.abs((2.0 * rng.random((D, N))) ** 2 - 0.2)
    w_lik = 1e-4

    ssm = ref.ss_modulators_nmf(
        np.concatenate([var_fast, len_fast, omega]),
        np.concatenate([var_slow, len_slow]),
        "matern32",
        "matern52",
    )
    y, _ = ref.sample_prior(ssm, W, T, rng)

    params = GTNMFParams(
        lik=jnp.asarray(w_lik),
        sub_var=jnp.asarray(var_fast),
        sub_len=jnp.asarray(len_fast),
        omega=jnp.asarray(omega),
        mod_var=jnp.asarray(var_slow),
        mod_len=jnp.asarray(len_slow),
        W=jnp.asarray(W),
    )
    model = GTNMFModel(D=D, N=N, kernel1="matern32", kernel2="matern52",
                       p_cubature=9, variant="amp")
    mom = lambda mu, s2, frac, k: ref.lik_modulator_nmf_power(
        w_lik, y[k], mu, s2, W, 9, frac
    )
    return ssm, mom, y, model, params, D + N


@pytest.fixture(scope="module")
def nmf_case():
    ssm, mom, y, model, params, C = _nmf_demo_setup()
    cfg = EPConfig(ep_fraction=0.5, ep_itts=3, damping=(0.5, 0.5, 0.5))
    oracle = ref.gf_ep_modulator_nmf_predict(
        ssm, mom, y, C, cfg.ep_fraction, list(cfg.damping), cfg.ep_itts
    )
    res = ep_infer(model, params, jnp.asarray(y), None, cfg)
    return oracle, res, (ssm, mom, y, model, params, C, cfg)


def test_nmf_demo_posterior_mean_matches_reference(nmf_case):
    oracle, res, _ = nmf_case
    assert oracle["n_jitter"] == 0  # no random-jitter path taken
    scale = np.abs(oracle["Eft"]).max()
    err = np.abs(np.asarray(res.Eft) - oracle["Eft"]).max()
    assert err < 1e-8 * scale, f"Eft max err {err:.3g} vs scale {scale:.3g}"


def test_nmf_demo_posterior_variance_matches_reference(nmf_case):
    oracle, res, _ = nmf_case
    scale = np.abs(oracle["Varft"]).max()
    err = np.abs(np.asarray(res.Varft) - oracle["Varft"]).max()
    assert err < 1e-8 * scale


def test_nmf_demo_nlZ_trace_matches_reference(nmf_case):
    oracle, res, _ = nmf_case
    np.testing.assert_allclose(np.asarray(res.nlZ), oracle["nlZ"], rtol=1e-9)


def test_nmf_demo_sites_match_reference(nmf_case):
    oracle, res, _ = nmf_case
    np.testing.assert_allclose(
        np.asarray(res.sites.ttau), oracle["ttau"], rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(res.lZ), oracle["lZ"], rtol=1e-8, atol=1e-12
    )


def test_nmf_demo_energy_matches_reference(nmf_case):
    _, _, (ssm, mom, y, model, params, C, cfg) = nmf_case
    e_ref = ref.gf_ep_modulator_nmf_energy(
        ssm, mom, y, C, cfg.ep_fraction, list(cfg.damping), cfg.ep_itts
    )
    e_jax = float(ep_energy(model, params, jnp.asarray(y), None, cfg))
    assert abs(e_jax - e_ref) < 1e-8 * abs(e_ref)


# ---------------------------------------------------------------------------
# Config B: demo_toy_modulators.m (per-subband model, W = I)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def per_subband_case():
    """demo_toy_modulators.m:5-30 exact parameter values."""
    T = 2000
    var_fast = np.array([0.1, 0.1])
    len_fast = np.array([50.0, 40.0])
    omega = np.array([np.pi / 4, np.pi / 6])
    var_slow = np.array([2.0, 3.0])
    len_slow = np.array([500.0, 700.0])
    w_lik = 1e-5
    D = 2
    rng = np.random.default_rng(123)

    ssm = ref.ss_modulators_nmf(
        np.concatenate([var_fast, len_fast, omega]),
        np.concatenate([var_slow, len_slow]),
        "matern32",
        "matern52",
    )
    W = np.eye(D)
    y, _ = ref.sample_prior(ssm, W, T, rng)

    mom = lambda mu, s2, frac, k: ref.lik_modulator_power(
        w_lik, y[k], mu, s2, 9, frac
    )
    cfg = EPConfig(ep_fraction=0.5, ep_itts=5, damping=(0.3,) * 5)
    oracle = ref.gf_ep_modulator_nmf_predict(
        ssm, mom, y, 2 * D, cfg.ep_fraction, list(cfg.damping), cfg.ep_itts
    )

    params = per_subband_params(w_lik, var_fast, len_fast, omega, var_slow,
                                len_slow)
    model = GTNMFModel(D=D, N=D, kernel1="matern32", kernel2="matern52",
                       p_cubature=9, variant="amp", z_floor=1e-8)
    res = ep_infer(model, params, jnp.asarray(y), None, cfg)
    return oracle, res


def test_per_subband_demo_posterior_matches_reference(per_subband_case):
    oracle, res = per_subband_case
    assert oracle["n_jitter"] == 0
    e_scale = np.abs(oracle["Eft"]).max()
    v_scale = np.abs(oracle["Varft"]).max()
    assert np.abs(np.asarray(res.Eft) - oracle["Eft"]).max() < 1e-8 * e_scale
    assert np.abs(np.asarray(res.Varft) - oracle["Varft"]).max() < 1e-8 * v_scale


def test_per_subband_demo_nlZ_matches_reference(per_subband_case):
    oracle, res = per_subband_case
    np.testing.assert_allclose(np.asarray(res.nlZ), oracle["nlZ"], rtol=1e-9)


# ---------------------------------------------------------------------------
# Oracle self-checks (cheap)
# ---------------------------------------------------------------------------


def test_oracle_ssm_matches_jax_blocks():
    """The oracle's dense joint model == the JAX channel-blocked model."""
    from nsgp_tpu.ops.ssm import build_modulator_ssm

    _, _, _, model, params, _ = _nmf_demo_setup(T=2)
    F, L, Qc, H, Pinf = ref.ss_modulators_nmf(
        np.concatenate(
            [np.asarray(params.sub_var), np.asarray(params.sub_len),
             np.asarray(params.omega)]
        ),
        np.concatenate([np.asarray(params.mod_var), np.asarray(params.mod_len)]),
        "matern32",
        "matern52",
    )
    A_ref, Q_ref = ref.lti_disc(F, L, Qc)
    ssm = model.build_ssm(params)
    C, bs = ssm.H.shape
    D = model.D
    # subband blocks occupy the first D*tau1*tau2 dense dims, modulators next
    tau1tau2 = 4
    for c in range(C):
        if c < D:
            sl = slice(c * tau1tau2, (c + 1) * tau1tau2)
        else:
            off = D * tau1tau2
            tau3 = 3
            sl = slice(off + (c - D) * tau3, off + (c - D + 1) * tau3)
        n = sl.stop - sl.start
        np.testing.assert_allclose(
            np.asarray(ssm.A[c])[:n, :n], A_ref[sl, sl], atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(ssm.Q[c])[:n, :n], Q_ref[sl, sl], atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(ssm.Pinf[c])[:n, :n], Pinf[sl, sl], atol=1e-12
        )
        np.testing.assert_allclose(np.asarray(ssm.H[c])[:n], H[c, sl], atol=0)
    # cross-block couplings of the reference joint model are exactly zero
    mask = np.ones_like(A_ref, dtype=bool)
    for c in range(D):
        sl = slice(c * tau1tau2, (c + 1) * tau1tau2)
        mask[sl, sl] = False
    for c in range(model.N):
        off = D * tau1tau2
        sl = slice(off + c * 3, off + (c + 1) * 3)
        mask[sl, sl] = False
    assert np.abs(A_ref[mask]).max() == 0.0


def test_oracle_cubature_matches_jax_cubature():
    """ut9 for n=2: the reference quirk term vanishes, rules must agree."""
    from nsgp_tpu.ops import cubature

    w_ref, x_ref = ref.utp_ws(9, 2)
    w_jax, x_jax = cubature.unit_sigma_points(9, 2, "symmetric")
    # order-insensitive compare: sort by (x0, x1)
    def key(x):
        return np.lexsort(x)

    i_r, i_j = key(x_ref), key(np.asarray(x_jax))
    np.testing.assert_allclose(x_ref[:, i_r], np.asarray(x_jax)[:, i_j], atol=1e-12)
    np.testing.assert_allclose(w_ref[i_r], np.asarray(w_jax)[i_j], atol=1e-12)
    # and the ref-bug flag changes nothing at n = 2
    w_bug, _ = ref.ut9_ws(2, ref_bug=True)
    w_fix, _ = ref.ut9_ws(2, ref_bug=False)
    np.testing.assert_allclose(w_bug, w_fix, atol=0)


# ---------------------------------------------------------------------------
# GIEKF parity (gf_giekf_modulator_nmf.m)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def giekf_case():
    """Smaller NMF toy (T=1200) — the oracle runs dense numpy loops."""
    from nsgp_tpu.inference.giekf import GIEKFConfig, giekf_energy, giekf_infer

    ssm, mom, y, model, params, C = _nmf_demo_setup(T=1200, D=6, N=2, seed=7)
    W = np.asarray(params.W)
    sn2 = float(params.lik)
    oracle = ref.gf_giekf_modulator_nmf_predict(ssm, W, sn2, y, g_iter=3,
                                                l_iter=5)
    # accept_tol < 0: the oracle replicates the reference's keep-every-pass
    # trajectory; the default NLL acceptance gate (round-5 robustness
    # feature) may legitimately reject a pass and diverge from it.
    res = giekf_infer(model, params, jnp.asarray(y), None,
                      GIEKFConfig(g_iter=3, l_iter=5, jitter=0.0,
                                  accept_tol=-1.0))
    e_ref = ref.gf_giekf_modulator_nmf_energy(ssm, W, sn2, y)
    e_jax = float(giekf_energy(model, params, jnp.asarray(y), None,
                               GIEKFConfig()))
    return oracle, res, e_ref, e_jax


def test_giekf_posterior_matches_reference(giekf_case):
    oracle, res, _, _ = giekf_case
    e_scale = np.abs(oracle["Eft"]).max()
    v_scale = np.abs(oracle["Varft"]).max()
    assert np.abs(np.asarray(res.Eft) - oracle["Eft"]).max() < 1e-7 * e_scale
    assert np.abs(np.asarray(res.Varft) - oracle["Varft"]).max() < 1e-7 * v_scale


def test_giekf_energy_matches_reference(giekf_case):
    _, _, e_ref, e_jax = giekf_case
    assert abs(e_jax - e_ref) < 1e-8 * abs(e_ref)


# ---------------------------------------------------------------------------
# IHGP parity (ihgp_ep_modulator_nmf.m)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ihgp_case():
    """NMF toy at T=1200: dense numpy oracle incl. DARE bank + lookups."""
    from nsgp_tpu.inference.ihgp import IHGPConfig, ihgp_infer

    ssm, mom, y, model, params, C = _nmf_demo_setup(T=1200, D=6, N=2, seed=7)
    itts = 5
    damp = [0.1] * itts
    block_sizes = [4] * model.D + [3] * model.N
    oracle = ref.ihgp_ep_modulator_nmf_predict(
        ssm, mom, y, C, block_sizes, 0.5, damp, itts
    )
    res = ihgp_infer(model, params, jnp.asarray(y), None,
                     IHGPConfig(ep_itts=itts, damping=(0.1,)))
    return oracle, res


def test_ihgp_posterior_matches_reference(ihgp_case):
    """The steady-state engine must track the reference's IHGP exactly:
    same DARE-bank tables (incl. the P = PP - K ro K' quirk), same
    derive-at-coarse-then-interpolate smoother tables, same
    previous-step-lookup gain convention."""
    oracle, res = ihgp_case
    e_scale = np.abs(oracle["Eft"]).max()
    v_scale = np.abs(oracle["Varft"]).max()
    assert np.abs(np.asarray(res.Eft) - oracle["Eft"]).max() < 1e-6 * e_scale
    assert np.abs(np.asarray(res.Varft) - oracle["Varft"]).max() < 1e-6 * v_scale


def test_ihgp_sites_match_reference(ihgp_case):
    oracle, res = ihgp_case
    np.testing.assert_allclose(
        np.asarray(res.sites.ttau), oracle["ttau"], rtol=1e-5, atol=1e-8
    )
