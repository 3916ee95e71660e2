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


def init_train_state(params: GTNMFParams, optimizer, transform=None):
    """Optimizer state for ``make_train_step`` (over the unconstrained pytree)."""
    from nsgp_tpu.inference.learn import Transform

    tf = transform if transform is not None else Transform({})
    return optimizer.init(tf.to_unconstrained(params))


def make_train_step(
    model: GTNMFModel,
    config: ep.EPConfig,
    mesh: Mesh,
    optimizer,
    transform=None,
):
    """Jitted distributed training step: dp over 'data', autodiff EP energy.

    The whole step (filter/smoother scans, moment matching, grads, optimizer
    update) compiles to one XLA program over the mesh.  The reference's
    analogue is fminunc + finite differences (train_model.m:222-246) — no
    gradients, no parallelism.

    Optimization happens in the unconstrained space of ``learn.Transform``
    (default: log-space for every positivity-constrained group), so additive
    optimizer updates can never push variances/lengthscales/W negative; the
    natural-scale params are only materialized for the energy evaluation.
    Init the optimizer state with ``init_train_state``.
    """
    from nsgp_tpu.inference.learn import Transform

    tf = transform if transform is not None else Transform({})
    dspec = NamedSharding(mesh, P("data"))

    @jax.jit
    def step(params, opt_state, ys, masks):
        import optax

        ys = jax.lax.with_sharding_constraint(ys, dspec)
        masks = jax.lax.with_sharding_constraint(masks, dspec)
        u = tf.to_unconstrained(params)

        def loss_fn(uu):
            p = tf.to_params(uu, params)
            return batched_ep_energy(model, p, ys, masks, config)

        loss, grads = jax.value_and_grad(loss_fn)(u)
        updates, opt_state = optimizer.update(grads, opt_state, u)
        u = optax.apply_updates(u, updates)
        return tf.to_params(u, params), opt_state, loss

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


def shard_inference_over_time(
    model: GTNMFModel,
    params: GTNMFParams,
    y: jax.Array,
    mesh: Mesh,
    config: ep.EPConfig = ep.EPConfig(),
    chunk: int = 512,
):
    """Single-signal EP inference with the TIME axis sharded over 'time'.

    Uses the blocked two-level scan (ops.bscan): its chunk dimension is
    sharded across the mesh, so passes 1/3 (the within-chunk work — all the
    O(T) compute) partition with zero communication and only the pass-2
    chunk-total compose exchanges (nc, C, bs, bs)-sized elements.  This is
    the credible stand-in for multi-host time parallelism on long signals
    (BASELINE.md's 2-host scaling target): per-device work is T/n_dev while
    comms stay O(T/chunk).
    """
    cfg = config._replace(parallel=True, chunk=chunk, time_axis="time")
    with jax.sharding.set_mesh(mesh):
        return ep.ep_infer(model, params, y, None, cfg)
