"""Batched multi-signal inference: B files through the chip at once.

The reference processes corpora serially (missing_data_music.m:43-133 loops
files one at a time); on TPU that leaves the engines latency-bound — the
single-file EP Pallas path uses C = D+N = 19 of 128 VPU lanes and the
GIEKF/IHGP scans pay their per-step dispatch floor once per file.  This
module runs B files *concurrently* with one compilation:

- **EP (backend='pallas')**: the fused kernels run with B*C channels on the
  lane axis in z-major file layout (ops.pallas_kalman._adf_kernel_mb) —
  same sequential depth as one file, ~B x the lane occupancy.
- **EP (XLA backends), IHGP, GIEKF**: ``jax.vmap`` over the file axis of
  the single-file engines (same compiled program, B x the per-step work,
  amortizing the scan dispatch floor).

All files must share (D, N, kernels) — corpus artifacts do — and are
padded to one T with mask=False padding (the grid drivers already do this
for one-compile-per-shape reasons).  Per-file hyperparameters differ freely.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from nsgp_tpu.inference import ep as ep_mod
from nsgp_tpu.inference.ep import EPConfig
from nsgp_tpu.models.gtnmf import GTNMFModel, GTNMFParams
from nsgp_tpu.ops import kalman
from nsgp_tpu.ops.kalman import Sites
from nsgp_tpu.ops.ssm import BlockSSM
from nsgp_tpu.utils.precision import f32_matmuls


def stack_params(params_list) -> GTNMFParams:
    """Stack per-file GTNMFParams pytrees along a new leading file axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


def flatten_ssm_zmajor(ssmB: BlockSSM, D: int, N: int) -> BlockSSM:
    """(BF, C, ...) channel-stacked SSM -> flat (BF*C, ...) in z-major layout.

    Lane order: all BF files' subband channels first (file-major), then all
    modulator channels — so the fused ADF kernel can slice the z/g halves
    (see ops.pallas_kalman._adf_kernel_mb).
    """
    BF = ssmB.F.shape[0]

    def flat(x):
        z = x[:, :D].reshape((BF * D,) + x.shape[2:])
        g = x[:, D:].reshape((BF * N,) + x.shape[2:])
        return jnp.concatenate([z, g], axis=0)

    return BlockSSM(
        F=flat(ssmB.F), LQcLT=flat(ssmB.LQcLT), H=flat(ssmB.H),
        Pinf=flat(ssmB.Pinf), A=flat(ssmB.A), Q=flat(ssmB.Q),
        pad_eye=flat(ssmB.pad_eye), D=BF * D, N=BF * N,
    )


def _to_per_file(x_flat, BF: int, D: int, N: int):
    """(T, BF*C) z-major -> (BF, T, C) per-file reference layout."""
    T = x_flat.shape[0]
    z = x_flat[:, : BF * D].reshape(T, BF, D)
    g = x_flat[:, BF * D :].reshape(T, BF, N)
    return jnp.concatenate([z, g], axis=-1).transpose(1, 0, 2)


def _to_flat(x_pf, BF: int, D: int, N: int):
    """(BF, T, C) -> (T, BF*C) z-major."""
    T = x_pf.shape[1]
    z = x_pf[:, :, :D].transpose(1, 0, 2).reshape(T, BF * D)
    g = x_pf[:, :, D:].transpose(1, 0, 2).reshape(T, BF * N)
    return jnp.concatenate([z, g], axis=1)


def _block_diag_WT(W_stacked: jax.Array) -> jax.Array:
    """(BF, D, N) per-file weights -> (BF*N, BF*D) block-diagonal W'."""
    BF, D, N = W_stacked.shape
    e = jnp.eye(BF, dtype=W_stacked.dtype)
    Wt = W_stacked.transpose(0, 2, 1)  # (BF, N, D)
    return (e[:, None, :, None] * Wt[:, :, None, :]).reshape(BF * N, BF * D)


class BatchEPResult(NamedTuple):
    Eft: jax.Array  # (BF, T, C)
    Varft: jax.Array  # (BF, T, C)
    nlZ: jax.Array  # (BF, ep_itts)
    maxdiff: jax.Array  # (BF, ep_itts)
    sites: Sites  # (BF, T, C)


def ep_infer_batch(
    model: GTNMFModel,
    paramsB: GTNMFParams,  # leaves with leading (BF,) file axis
    yB: jax.Array,  # (BF, T); NaNs allowed (-> missing)
    maskB: Optional[jax.Array] = None,
    config: EPConfig = EPConfig(),
) -> BatchEPResult:
    """Power-EP inference over BF files at once (one compile, shared passes).

    backend='pallas' uses the lane-batched fused kernels with a HOST-LEVEL
    sweep loop — one jit per sweep, reused ep_itts times.  Fusing the whole
    multi-sweep batched program into one XLA executable miscompiles on real
    TPU hardware (measured: a sweep's re-site result changes when a LATER
    consumer exists in the same program — identical files diverged at sweep
    3; per-piece execution of the bit-identical graph is clean), and
    per-sweep executions also keep single-execution runtimes under the
    TPU-tunnel watchdog (the GIEKF precedent).  Other backends vmap the
    single-file engine in one fused program (no Pallas calls — unaffected).

    Semantics per file match ep.ep_infer with the parallel/pallas all-T
    re-site convention (same EP fixed point).
    """
    if maskB is None:
        maskB = ~jnp.isnan(yB)
    yB = jnp.nan_to_num(yB)
    BF, T = yB.shape

    if config.backend != "pallas":
        return _ep_infer_batch_vmap(model, paramsB, yB, maskB, config)

    dt_ = yB.dtype
    mu, var, nlZ0, tt, tn = _adf_smooth_batch(model, paramsB, yB, maskB,
                                              config)
    nlZ = [nlZ0]
    maxdiff = [jnp.full((BF,), jnp.inf, dt_)]
    for itt in range(1, config.ep_itts):
        damp = jnp.asarray(config.damp(itt), dt_)
        tt, tn, lZ_i = _resite_batch(model, paramsB, yB, maskB, mu, var,
                                     tt, tn, damp, config)
        nlZ.append(-jnp.sum(lZ_i, axis=1))
        mu_new, var_new = _pass_batch(model, paramsB, tt, tn, config)
        maxdiff.append(jnp.maximum(
            jnp.max(jnp.abs(mu_new - mu), axis=(1, 2)),
            jnp.max(jnp.abs(var_new - var), axis=(1, 2)),
        ))
        mu, var = mu_new, var_new

    return BatchEPResult(Eft=mu, Varft=var, nlZ=jnp.stack(nlZ, axis=1),
                         maxdiff=jnp.stack(maxdiff, axis=1),
                         sites=Sites(tt, tn))


@partial(jax.jit, static_argnums=(0, 4))
@f32_matmuls
def _ep_infer_batch_vmap(model, paramsB, yB, maskB, config):
    core = ep_mod.ep_infer.__wrapped__  # un-jitted impl

    def one(p, y, m):
        r = core(model, p, y, m, config)
        return BatchEPResult(Eft=r.Eft, Varft=r.Varft, nlZ=r.nlZ,
                             maxdiff=r.maxdiff, sites=r.sites)

    return jax.vmap(one)(paramsB, yB, maskB)


def _flat_model(model, paramsB):
    """(traced) flat z-major SSM + block-diag W' for the fused kernels."""
    ssmB = jax.vmap(lambda p: model.build_ssm(p))(paramsB)
    ssm_flat = flatten_ssm_zmajor(ssmB, model.D, model.N)
    return ssm_flat, _block_diag_WT(paramsB.W)


@partial(jax.jit, static_argnums=(0, 4))
@f32_matmuls
def _adf_smooth_batch(model, paramsB, yB, maskB, config):
    """Sweep 1: fused ADF filter + smoother + observable marginals."""
    from nsgp_tpu.ops import pallas_kalman

    BF, T = yB.shape
    D, N = model.D, model.N
    interpret = jax.default_backend() not in ("tpu", "axon")
    ssm_flat, WbdT = _flat_model(model, paramsB)
    ms_b, Ps_b, lZ, sites_flat = pallas_kalman.adf_filter_pallas_mb(
        model.moment_params(), ssm_flat, WbdT, paramsB.lik, yB.T, maskB.T,
        BF, config.damp(0), config.pallas_block, config.s_chunk, interpret,
    )
    ms, Ps = pallas_kalman.smoother_pallas_bmajor(
        ssm_flat, ms_b, Ps_b, T, config.pallas_block, interpret
    )
    mu_f, var_f = kalman.observable_marginals(ssm_flat, ms, Ps)
    return (_to_per_file(mu_f, BF, D, N), _to_per_file(var_f, BF, D, N),
            -jnp.sum(lZ, axis=0),
            _to_per_file(sites_flat.ttau, BF, D, N),
            _to_per_file(sites_flat.tnu, BF, D, N))


@partial(jax.jit, static_argnums=(0, 9))
@f32_matmuls
def _resite_batch(model, paramsB, yB, maskB, mu, var, tt, tn, damp, config):
    """Vmapped EP re-site at the smoothed cavities (damp traced — one
    compile across damping schedules)."""
    def one(p, y, m, mu1, var1, tt1, tn1):
        s, lZ = ep_mod._ep_resite(model, p, config, y, m, mu1, var1,
                                  Sites(tt1, tn1), damp, exclude_last=False)
        return s.ttau, s.tnu, lZ

    return jax.vmap(one)(paramsB, yB, maskB, mu, var, tt, tn)


@partial(jax.jit, static_argnums=(0, 4))
@f32_matmuls
def _pass_batch(model, paramsB, tt, tn, config):
    """One fixed-site filter+smoother pass + marginals (sweeps >= 2)."""
    from nsgp_tpu.ops import pallas_kalman

    BF, T = tt.shape[0], tt.shape[1]
    D, N = model.D, model.N
    interpret = jax.default_backend() not in ("tpu", "axon")
    ssm_flat, _ = _flat_model(model, paramsB)
    sites_flat = Sites(_to_flat(tt, BF, D, N), _to_flat(tn, BF, D, N))
    ms, Ps = pallas_kalman.filter_smoother_pallas(
        ssm_flat, sites_flat, config.pallas_block, interpret
    )
    mu_f, var_f = kalman.observable_marginals(ssm_flat, ms, Ps)
    return _to_per_file(mu_f, BF, D, N), _to_per_file(var_f, BF, D, N)


def infer_batch(engine: str, model, paramsB, yB, maskB=None, config=None,
                **cfg_kwargs):
    """Batched analogue of registry.infer: one compiled program over the
    leading file axis of (paramsB, yB, maskB)."""
    from nsgp_tpu.inference import registry

    _, _, config_cls = registry.get_engine(
        "ihgp" if engine.startswith("ihgp") else engine
    )
    cfg = config if config is not None else (
        config_cls(**cfg_kwargs) if cfg_kwargs else config_cls()
    )
    if engine == "ep":
        return ep_infer_batch(model, paramsB, yB, maskB, cfg)
    if engine.startswith("ihgp"):
        return ihgp_infer_batch(model, paramsB, yB, maskB, cfg)
    if engine == "giekf":
        return giekf_infer_batch(model, paramsB, yB, maskB, cfg)
    raise ValueError(f"unknown engine {engine!r}")


def ihgp_infer_batch(model, paramsB, yB, maskB=None, config=None):
    """IHGP inference over BF files at once (vmap of the single-file engine,
    incl. the per-file DARE table banks)."""
    from nsgp_tpu.inference import ihgp as ihgp_mod

    if config is None:
        config = ihgp_mod.IHGPConfig()
    if maskB is None:
        maskB = ~jnp.isnan(yB)
    yB = jnp.nan_to_num(yB)
    return _ihgp_vmapped(model, config, paramsB, yB, maskB)


@partial(jax.jit, static_argnums=(0, 1))
@f32_matmuls
def _ihgp_vmapped(model, config, paramsB, yB, maskB):
    from nsgp_tpu.inference import ihgp as ihgp_mod

    core = ihgp_mod.ihgp_infer.__wrapped__
    return jax.vmap(lambda p, y, m: core(model, p, y, m, config))(
        paramsB, yB, maskB
    )


def giekf_infer_batch(model, paramsB, yB, maskB=None, config=None):
    """GIEKF inference over BF files (vmapped per-pass jit + host loop over
    global passes, preserving giekf_infer's watchdog-safe pass structure and
    per-file last-finite-pass fallback)."""
    from nsgp_tpu.inference import giekf as giekf_mod

    if config is None:
        config = giekf_mod.GIEKFConfig()
    if maskB is None:
        maskB = ~jnp.isnan(yB)
    yB = jnp.nan_to_num(yB)

    m0, P0, Hd = _giekf_init_batch(model, paramsB)
    ms = Ps = None
    nll = jnp.zeros((yB.shape[0],), m0.dtype)
    for g in range(config.g_iter):
        ms_g, Ps_g, nll_g, good = _giekf_pass_batch(
            model, paramsB, yB, maskB, m0, P0, config
        )
        if ms is None:
            ms, Ps, nll = ms_g, Ps_g, nll_g
        else:
            if config.accept_tol >= 0.0:
                # per-file NLL acceptance gate (see giekf.GIEKFConfig)
                good = good & (
                    nll_g <= nll + config.accept_tol * jnp.abs(nll)
                )
            ms = jnp.where(good[:, None, None], ms_g, ms)
            Ps = jnp.where(good[:, None, None, None], Ps_g, Ps)
            nll = jnp.where(good, nll_g, nll)
        m0, P0 = ms[:, 0], Ps[:, 0]

    Eft = jnp.einsum("btm,bcm->btc", ms, Hd)
    Varft = jnp.einsum("bci,btij,bcj->btc", Hd, Ps, Hd)
    from nsgp_tpu.inference.giekf import GIEKFResult

    return GIEKFResult(Eft=Eft, Varft=Varft, ms=ms, Ps=Ps, nll=nll)


@partial(jax.jit, static_argnums=(0,))
@f32_matmuls
def _giekf_init_batch(model, paramsB):
    from nsgp_tpu.inference import giekf as giekf_mod

    return jax.vmap(
        lambda p: giekf_mod._giekf_init.__wrapped__(model, p)
    )(paramsB)


@partial(jax.jit, static_argnums=(0, 6))
@f32_matmuls
def _giekf_pass_batch(model, paramsB, yB, maskB, m0, P0, config):
    from nsgp_tpu.inference import giekf as giekf_mod

    return jax.vmap(
        lambda p, y, m, m0_, P0_: giekf_mod._giekf_pass.__wrapped__(
            model, p, y, m, m0_, P0_, config
        )
    )(paramsB, yB, maskB, m0, P0)
