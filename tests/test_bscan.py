"""Blocked two-level scan vs the sequential oracle (float tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsgp_tpu.models.gtnmf import GTNMFModel, GTNMFParams
from nsgp_tpu.ops import bscan, kalman
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
    ttau = ttau * (jax.random.uniform(k2, (T, C)) > 0.2)
    tnu = jax.random.normal(k2, (T, C)) * ttau
    return Sites(ttau, tnu)


@pytest.mark.parametrize("T,chunk", [(64, 16), (200, 32), (515, 64)])
def test_blocked_filter_matches_sequential(T, chunk):
    model, params = _toy_model()
    ssm = model.build_ssm(params)
    sites = _random_sites(jax.random.PRNGKey(1), T, ssm.num_channels)

    traj = kalman.filter_with_sites(ssm, sites, store=True)
    ms_b, Ps_b = bscan.blocked_filter_with_sites(ssm, sites, chunk)

    np.testing.assert_allclose(ms_b, traj.ms, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(Ps_b, traj.Ps, rtol=1e-8, atol=1e-9)


@pytest.mark.parametrize("T,chunk", [(64, 16), (200, 32), (515, 64)])
def test_blocked_smoother_matches_sequential(T, chunk):
    model, params = _toy_model()
    ssm = model.build_ssm(params)
    sites = _random_sites(jax.random.PRNGKey(2), T, ssm.num_channels)

    traj = kalman.filter_with_sites(ssm, sites, store=True)
    sm_seq, sP_seq = kalman.rts_smoother(ssm, traj)
    sm_b, sP_b = bscan.blocked_rts_smoother(ssm, traj.ms, traj.Ps, chunk)

    np.testing.assert_allclose(sm_b, sm_seq, rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(sP_b, sP_seq, rtol=1e-7, atol=1e-8)
