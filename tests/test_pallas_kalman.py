"""Fused Pallas filter/smoother vs the sequential oracle (interpret mode).

On CPU these run through the Pallas interpreter — same program the Mosaic
compiler sees on a real chip, minus the hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsgp_tpu.models.gtnmf import GTNMFModel, GTNMFParams
from nsgp_tpu.ops import kalman, pallas_kalman
from nsgp_tpu.ops.kalman import Sites


def _toy_model(D=3, N=2, kernel2="matern52"):
    model = GTNMFModel(D=D, N=N, kernel1="matern32", kernel2=kernel2)
    key = jax.random.PRNGKey(0)
    params = GTNMFParams(
        lik=jnp.asarray(0.05),
        sub_var=jnp.linspace(0.5, 1.5, D),
        sub_len=jnp.linspace(20.0, 80.0, D),
        omega=jnp.linspace(0.1, 1.0, D),
        mod_var=jnp.full((N,), 1.5),
        mod_len=jnp.linspace(300.0, 600.0, N),
        W=jax.random.uniform(key, (D, N), minval=0.2, maxval=1.0),
    )
    return model, params


def _random_sites(key, T, C):
    k1, k2 = jax.random.split(key)
    ttau = jax.random.uniform(k1, (T, C), minval=0.0, maxval=5.0)
    ttau = ttau * (jax.random.uniform(k2, (T, C)) > 0.2)
    tnu = jax.random.normal(k2, (T, C)) * ttau
    return Sites(ttau, tnu)


@pytest.mark.parametrize("T,block", [(64, 16), (200, 64)])
def test_pallas_filter_smoother_matches_sequential(T, block):
    model, params = _toy_model()
    ssm = model.build_ssm(params)
    sites = _random_sites(jax.random.PRNGKey(1), T, ssm.num_channels)

    traj = kalman.filter_with_sites(ssm, sites, store=True)
    sm_seq, sP_seq = kalman.rts_smoother(ssm, traj)
    sm_pl, sP_pl = pallas_kalman.filter_smoother_pallas(
        ssm, sites, block, True  # interpret mode
    )
    np.testing.assert_allclose(sm_pl, sm_seq, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(sP_pl, sP_seq, rtol=1e-7, atol=1e-9)


def test_pallas_handles_padded_modulator_blocks():
    """matern32 modulators (tau=3 < bs=4): zero-padded state dims must stay
    exactly inert through the fused kernels."""
    model, params = _toy_model(kernel2="matern32")
    ssm = model.build_ssm(params)
    T = 96
    sites = _random_sites(jax.random.PRNGKey(2), T, ssm.num_channels)
    traj = kalman.filter_with_sites(ssm, sites, store=True)
    sm_seq, sP_seq = kalman.rts_smoother(ssm, traj)
    sm_pl, sP_pl = pallas_kalman.filter_smoother_pallas(ssm, sites, 32, True)
    np.testing.assert_allclose(sm_pl, sm_seq, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(sP_pl, sP_seq, rtol=1e-7, atol=1e-9)


def test_ep_infer_pallas_backend_matches_parallel():
    """Full EP with the pallas backend == the parallel (pscan) path (both
    skip the last-step re-match quirk, so they share the exact EP path)."""
    from nsgp_tpu.inference import ep
    from nsgp_tpu.models.gtnmf import sample_prior

    model, params = _toy_model(D=2, N=2)
    y, _, _ = sample_prior(jax.random.PRNGKey(3), model, params, T=200)
    r_ps = ep.ep_infer(model, params, y, None,
                       ep.EPConfig(ep_itts=3, parallel=True, chunk=0))
    r_pl = ep.ep_infer(model, params, y, None,
                       ep.EPConfig(ep_itts=3, backend="pallas",
                                   pallas_block=64))
    np.testing.assert_allclose(np.asarray(r_pl.Eft), np.asarray(r_ps.Eft),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(r_pl.nlZ), np.asarray(r_ps.nlZ),
                               rtol=1e-9)


def test_ep_infer_pallas_full_matches_sequential():
    """backend='pallas' now covers the ADF sweep too (in-kernel cubature):
    the full 3-sweep EP must match the sequential engine up to the last-step
    re-match quirk (bulk tolerance; see test_golden for its decay shape)."""
    from nsgp_tpu.inference import ep
    from nsgp_tpu.models.gtnmf import sample_prior

    model, params = _toy_model(D=3, N=2)
    y, _, _ = sample_prior(jax.random.PRNGKey(5), model, params, T=256)
    r_seq = ep.ep_infer(model, params, y, None, ep.EPConfig(ep_itts=3))
    r_pl = ep.ep_infer(model, params, y, None,
                       ep.EPConfig(ep_itts=3, backend="pallas",
                                   pallas_block=64))
    # sweep-1 nlZ comes from identical ADF math -> tight agreement
    np.testing.assert_allclose(float(r_pl.nlZ[0]), float(r_seq.nlZ[0]),
                               rtol=1e-9)
    d = np.abs(np.asarray(r_pl.Eft) - np.asarray(r_seq.Eft))
    assert d[:-30].max() < 5e-3, d[:-30].max()
    assert np.all(np.isfinite(np.asarray(r_pl.Varft)))


def test_ep_infer_pallas_handles_nan_gaps():
    """Missing data through the fused kernels: masked steps carry zero
    sites (pure prediction) exactly like the scan engine."""
    from nsgp_tpu.inference import ep
    from nsgp_tpu.models.gtnmf import sample_prior

    model, params = _toy_model(D=2, N=2)
    y, _, _ = sample_prior(jax.random.PRNGKey(7), model, params, T=192)
    y = y.at[60:90].set(jnp.nan)
    r_seq = ep.ep_infer(model, params, y, None, ep.EPConfig(ep_itts=2))
    r_pl = ep.ep_infer(model, params, y, None,
                       ep.EPConfig(ep_itts=2, backend="pallas",
                                   pallas_block=64))
    assert np.all(np.isfinite(np.asarray(r_pl.Eft)))
    np.testing.assert_allclose(float(r_pl.nlZ[0]), float(r_seq.nlZ[0]),
                               rtol=1e-9)
    d = np.abs(np.asarray(r_pl.Eft[:-20]) - np.asarray(r_seq.Eft[:-20]))
    assert d.max() < 5e-3, d.max()


def test_adf_pallas_zfloor_matches_xla_on_outliers():
    """Raw-scale Z floor parity (the speech6_female NaN, round 4): at steps
    where the observation is wildly unlikely under the prediction, the
    reference floors Z and divides the derivatives by the FLOORED Z
    (likModulatorNMFPower.m:55), gently rejecting the site.  The fused ADF
    kernel must reproduce that — flooring the shifted sum instead produced
    huge wrong-curvature modulator sites at onsets."""
    from nsgp_tpu.inference import ep
    from nsgp_tpu.models.gtnmf import sample_prior

    model, params = _toy_model(D=3, N=2)
    y, _, _ = sample_prior(jax.random.PRNGKey(9), model, params, T=256)
    # inject a violent onset: a 50-sigma outlier drives Z under the floor
    y = y.at[128].set(50.0 * jnp.std(y))
    r_seq = ep.ep_infer(model, params, y, None, ep.EPConfig(ep_itts=1))
    r_pl = ep.ep_infer(model, params, y, None,
                       ep.EPConfig(ep_itts=1, backend="pallas",
                                   pallas_block=64))
    np.testing.assert_allclose(float(r_pl.nlZ[0]), float(r_seq.nlZ[0]),
                               rtol=1e-9)
    tt_s = np.asarray(r_seq.sites.ttau)
    tt_p = np.asarray(r_pl.sites.ttau)
    np.testing.assert_allclose(tt_p, tt_s, rtol=1e-5, atol=1e-7)
    assert np.all(np.isfinite(np.asarray(r_pl.Eft)))
