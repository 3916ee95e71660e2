"""Parallel (associative-scan) filter/smoother vs sequential lax.scan oracle.

The prefix-sum Kalman passes must match the sequential recursions (which are
themselves validated against dense numpy in test_ssm.py) to float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsgp_tpu.models.gtnmf import GTNMFModel, GTNMFParams, sample_prior
from nsgp_tpu.ops import kalman, pscan
from nsgp_tpu.ops.kalman import Sites


def _toy_model(D=3, N=2):
    model = GTNMFModel(D=D, N=N, kernel1="matern32", kernel2="matern52")
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
    # Sprinkle exact zeros (missing observations / clamped sites)
    ttau = ttau * (jax.random.uniform(k2, (T, C)) > 0.2)
    tnu = jax.random.normal(k2, (T, C)) * ttau
    return Sites(ttau, tnu)


@pytest.mark.parametrize("T", [7, 200])
def test_parallel_filter_matches_sequential(T):
    model, params = _toy_model()
    ssm = model.build_ssm(params)
    sites = _random_sites(jax.random.PRNGKey(1), T, ssm.num_channels)

    traj = kalman.filter_with_sites(ssm, sites, store=True)
    fr_par = pscan.parallel_filter_with_sites(ssm, sites)

    C, bs = ssm.num_channels, ssm.block_size
    np.testing.assert_allclose(
        fr_par.ms, traj.ms.reshape(T, C, bs), rtol=1e-8, atol=1e-9
    )
    np.testing.assert_allclose(
        fr_par.Ps, traj.Ps.reshape(T, C, bs, bs), rtol=1e-8, atol=1e-9
    )


@pytest.mark.parametrize("T", [7, 200])
def test_parallel_smoother_matches_sequential(T):
    model, params = _toy_model()
    ssm = model.build_ssm(params)
    sites = _random_sites(jax.random.PRNGKey(2), T, ssm.num_channels)

    C, bs = ssm.num_channels, ssm.block_size
    traj = kalman.filter_with_sites(ssm, sites, store=True)
    ms_seq, Ps_seq = kalman.rts_smoother(ssm, traj)  # flattened (T, C*bs[*bs])
    fr = kalman.FilterResult(
        ms=traj.ms.reshape(T, C, bs), Ps=traj.Ps.reshape(T, C, bs, bs)
    )
    ms_par, Ps_par = pscan.parallel_rts_smoother(ssm, fr)

    np.testing.assert_allclose(ms_par.reshape(T, -1), ms_seq, rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(Ps_par.reshape(T, -1), Ps_seq, rtol=1e-7, atol=1e-8)


def test_parallel_ep_inference_matches_sequential():
    """Full EP with parallel sweeps stays close to the sequential engine.

    Sweeps >= 2 in parallel mode skip the reference's last-step forward
    re-match quirk, so we compare posteriors loosely (the EP fixed point is
    the same; the path differs slightly).
    """
    from nsgp_tpu.inference import ep

    model, params = _toy_model(D=2, N=2)
    key = jax.random.PRNGKey(3)
    y, _, _ = sample_prior(key, model, params, T=256)

    res_seq = ep.ep_infer(model, params, y, None, ep.EPConfig(ep_itts=3))
    res_par = ep.ep_infer(
        model, params, y, None, ep.EPConfig(ep_itts=3, parallel=True)
    )
    # Posteriors agree to ~the EP convergence tolerance at 3 sweeps (the
    # fixed point is shared; the last-site quirk perturbs the path).
    np.testing.assert_allclose(res_par.Eft, res_seq.Eft, rtol=0.0, atol=0.1)
    np.testing.assert_allclose(res_par.Varft, res_seq.Varft, rtol=0.3, atol=0.02)
    # Energies agree to < 0.5%.
    np.testing.assert_allclose(res_par.nlZ[-1], res_seq.nlZ[-1], rtol=5e-3)
