"""Device-mesh parallelism for GT-NMF inference and training.

The reference is single-threaded MATLAB with no distributed story (SURVEY.md
section 2.0); all scaling axes here are new TPU-native design:

- ``data``    : independent signals (or signal segments) — pure data
                parallelism; gradients reduced by XLA's automatic psum.
- ``channel`` : subband/modulator channel blocks — model parallelism.  The
                block-diagonal filter algebra is embarrassingly parallel over
                C; the only cross-channel coupling is the per-step moment
                matching (einsum reductions over D/N), which GSPMD lowers to
                small psums over ICI.
- ``chain``   : HMC/VI chains over hyperparameters (nsgp_tpu.inference.hmc).

We use GSPMD sharding propagation (jit + NamedSharding constraints) rather
than hand-written collectives: annotate the batch and channel axes once and
let XLA insert all_gather/psum where the einsums demand it.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nsgp_tpu.inference import ep
from nsgp_tpu.models.gtnmf import GTNMFModel, GTNMFParams


def make_mesh(axis_sizes: dict, devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh from {'axis': size} (row-major over the device list)."""
    if devices is None:
        devices = jax.devices()
    names = tuple(axis_sizes.keys())
    shape = tuple(axis_sizes.values())
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    dev = np.array(devices[:n]).reshape(shape)
    return Mesh(dev, names)


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batched_ep_energy(
    model: GTNMFModel,
    params: GTNMFParams,
    ys: jax.Array,  # (B, T)
    masks: jax.Array,  # (B, T) bool
    config: ep.EPConfig,
) -> jax.Array:
    """Mean EP energy over a batch of signals (vmapped; dp-shardable)."""
    e = jax.vmap(lambda y, m: ep.ep_energy(model, params, y, m, config))(ys, masks)
    return jnp.mean(e)


def make_train_step(
    model: GTNMFModel,
    config: ep.EPConfig,
    mesh: Mesh,
    optimizer,
):
    """Jitted distributed training step: dp over 'data', autodiff EP energy.

    The whole step (filter/smoother scans, moment matching, grads, optimizer
    update) compiles to one XLA program over the mesh.  The reference's
    analogue is fminunc + finite differences (train_model.m:222-246) — no
    gradients, no parallelism.
    """
    dspec = NamedSharding(mesh, P("data"))
    rep = replicated(mesh)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, ys, masks):
        ys = jax.lax.with_sharding_constraint(ys, dspec)
        masks = jax.lax.with_sharding_constraint(masks, dspec)

        def loss_fn(p):
            return batched_ep_energy(model, p, ys, masks, config)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda a, u: a + u, params, updates)
        return params, opt_state, loss

    return step


def shard_inference_over_channels(
    model: GTNMFModel,
    params: GTNMFParams,
    y: jax.Array,
    mesh: Mesh,
    config: ep.EPConfig = ep.EPConfig(),
):
    """Single-signal EP inference with the channel axis sharded over 'channel'.

    Uses GSPMD propagation seeded by a sharding constraint on the EP site
    arrays (T, C): the per-channel filter algebra partitions cleanly; moment
    matching introduces psums over the channel axis.
    """
    cfg = config._replace(channel_axis="channel")
    with jax.sharding.set_mesh(mesh):
        return ep.ep_infer(model, params, y, None, cfg)
