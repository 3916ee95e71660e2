"""Multi-device mesh tests on the 8-virtual-CPU mesh (conftest provisions
XLA_FLAGS=--xla_force_host_platform_device_count=8).

Correctness contract: sharded execution is the SAME math — channel-sharded
EP inference and dp-sharded training steps must match their single-device
equivalents to float tolerance.  (The reference has no distributed story at
all, SURVEY 2.0; these axes are the TPU-native addition.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsgp_tpu.inference import ep
from nsgp_tpu.models.gtnmf import GTNMFModel, GTNMFParams, sample_prior
from nsgp_tpu.parallel import mesh as pmesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _toy(D=6, N=2):  # C = D + N = 8 divides the channel axis
    model = GTNMFModel(D=D, N=N, kernel1="matern32", kernel2="matern52",
                       p_cubature=7)
    key = jax.random.PRNGKey(0)
    params = GTNMFParams(
        lik=jnp.asarray(0.05),
        sub_var=jnp.linspace(0.5, 1.5, D),
        sub_len=jnp.linspace(30.0, 90.0, D),
        omega=jnp.linspace(0.2, 1.6, D),
        mod_var=jnp.full((N,), 1.5),
        mod_len=jnp.linspace(250.0, 450.0, N),
        W=jax.random.uniform(key, (D, N), minval=0.2, maxval=1.0),
    )
    return model, params


@pytest.mark.parametrize("n_chan", [2, 8])
def test_channel_sharded_ep_matches_unsharded(n_chan):
    model, params = _toy()
    y, _, _ = sample_prior(jax.random.PRNGKey(3), model, params, T=300)
    cfg = ep.EPConfig(ep_itts=3)

    ref = ep.ep_infer(model, params, y, None, cfg)

    mesh = pmesh.make_mesh({"channel": n_chan}, jax.devices()[:n_chan])
    res = pmesh.shard_inference_over_channels(model, params, y, mesh, cfg)

    np.testing.assert_allclose(np.asarray(res.Eft), np.asarray(ref.Eft),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.Varft), np.asarray(ref.Varft),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.nlZ), np.asarray(ref.nlZ),
                               rtol=1e-10)


def test_dp_train_step_matches_single_device():
    """One dp-sharded training step == the same step on one device."""
    import optax

    model, params = _toy()
    B, T = 4, 128
    keys = jax.random.split(jax.random.PRNGKey(5), B)
    ys = jnp.stack([sample_prior(k, model, params, T=T)[0] for k in keys])
    masks = jnp.ones((B, T), bool)
    cfg = ep.EPConfig(ep_itts=2)
    opt = optax.sgd(1e-2)

    def run(mesh_axes, devices):
        mesh = pmesh.make_mesh(mesh_axes, devices)
        with jax.sharding.set_mesh(mesh):
            step = pmesh.make_train_step(model, cfg, mesh, opt)
            state = pmesh.init_train_state(params, opt)
            p2, _, loss = step(params, state, ys, masks)
        return jax.device_get(p2), float(loss)

    p_multi, loss_multi = run({"data": 4}, jax.devices()[:4])
    p_single, loss_single = run({"data": 1}, jax.devices()[:1])

    np.testing.assert_allclose(loss_multi, loss_single, rtol=1e-10)
    for a, b in zip(jax.tree.leaves(p_multi), jax.tree.leaves(p_single)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9,
                                   atol=1e-12)


def test_train_step_keeps_params_positive():
    """Regression for the unconstrained-space fix: a large-lr step must not
    produce negative variances/lengthscales/weights (pre-fix, additive
    updates on natural-scale params could)."""
    import optax

    model, params = _toy()
    B, T = 2, 96
    keys = jax.random.split(jax.random.PRNGKey(6), B)
    ys = jnp.stack([sample_prior(k, model, params, T=T)[0] for k in keys])
    masks = jnp.ones((B, T), bool)
    cfg = ep.EPConfig(ep_itts=1)
    opt = optax.sgd(0.5)  # aggressive step (log-space update stays positive)
    mesh = pmesh.make_mesh({"data": 2}, jax.devices()[:2])
    with jax.sharding.set_mesh(mesh):
        step = pmesh.make_train_step(model, cfg, mesh, opt)
        state = pmesh.init_train_state(params, opt)
        p2, _, _ = step(params, state, ys, masks)
    for name in ("lik", "sub_var", "sub_len", "omega", "mod_var", "mod_len", "W"):
        assert np.all(np.asarray(getattr(p2, name)) > 0), name


def test_time_sharded_ep_matches_unsharded():
    """Blocked-scan chunk axis sharded over an 8-device 'time' mesh axis
    must reproduce the unsharded blocked path exactly (VERDICT r2 item 7:
    the stand-in for the unmeasurable multi-host scaling target)."""
    from nsgp_tpu.parallel import mesh as pmesh

    model, params = _toy()
    y, _, _ = sample_prior(jax.random.PRNGKey(5), model, params, T=2048)
    cfg = ep.EPConfig(ep_itts=3, parallel=True, chunk=256)
    r_ref = ep.ep_infer(model, params, y, None, cfg)

    m = pmesh.make_mesh({"time": 8})
    r_sh = pmesh.shard_inference_over_time(model, params, y, m, cfg,
                                           chunk=256)
    np.testing.assert_allclose(
        np.asarray(r_sh.Eft), np.asarray(r_ref.Eft), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(r_sh.Varft), np.asarray(r_ref.Varft), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(r_sh.nlZ), np.asarray(r_ref.nlZ), rtol=1e-10
    )


def test_time_and_channel_mesh_ep():
    """2D time x channel mesh: both axes sharded simultaneously."""
    from jax.sharding import Mesh
    from nsgp_tpu.parallel import mesh as pmesh

    model, params = _toy()
    y, _, _ = sample_prior(jax.random.PRNGKey(6), model, params, T=1024)
    cfg = ep.EPConfig(ep_itts=2, parallel=True, chunk=128,
                      channel_axis="channel", time_axis="time")
    r_ref = ep.ep_infer(
        model, params, y, None,
        ep.EPConfig(ep_itts=2, parallel=True, chunk=128),
    )
    m = pmesh.make_mesh({"time": 4, "channel": 2})
    with jax.sharding.set_mesh(m):
        r_sh = ep.ep_infer(model, params, y, None, cfg)
    np.testing.assert_allclose(
        np.asarray(r_sh.Eft), np.asarray(r_ref.Eft), atol=1e-9
    )
