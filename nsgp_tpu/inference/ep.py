"""Power EP inference for the GT-NMF model family.

TPU-native re-design of gf_ep_modulator_nmf.m / gf_ep_modulator.m /
gf_ep_modulator_nmf_constraints.m.  Faithful to the reference's EP scheme:

- sweep 1 = ADF: sites matched at the forward-filter marginal (sequential
  lax.scan; the site at step k feeds the filter at steps > k),
- sweeps >= 2: forward filter with *fixed* sites, RTS smoothing, then EP
  site re-matching at the smoothed cavity.  In the reference the site update
  is interleaved in the backward loop, but the smoother never reads the
  updated sites within a pass, so re-matching all T sites *after* the
  smoothing pass is mathematically identical — and fully vectorizable.

This makes every sweep after the first a pair of linear-Gaussian passes
(parallelizable over time via associative scans — see nsgp_tpu.ops.pscan)
plus one big batched moment-matching call.

Key EP math replicated exactly (SURVEY.md section 2.1):
    site:    ttau <- (1-d*frac)*ttau + d*(-d2lZ/(1+d2lZ*v))
             tnu  <- (1-d*frac)*tnu  + d*((dlZ-mu*d2lZ)/(1+d2lZ*v))
    cavity:  v_cav = 1/(1/v_marg - frac*ttau),
             m_cav = v_cav*(m_marg/v_marg - frac*tnu)
    clamp ttau >= 0; update only sites with v_cav > 0; first-sweep damping
    uses frac = 1 (ADF); nlml = -sum_k lZ_k.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from nsgp_tpu.models.gtnmf import GTNMFModel, GTNMFParams
from nsgp_tpu.ops import kalman
from nsgp_tpu.ops.kalman import Sites
from nsgp_tpu.ops.moments import moments, moments_chunked
from nsgp_tpu.utils.precision import f32_matmuls


class EPConfig(NamedTuple):
    """EP solver knobs (hashable, jit-static)."""

    ep_fraction: float = 0.5
    ep_itts: int = 3
    damping: tuple = ()  # per-iteration damping; empty = 0.5 everywhere
    moment_chunk: int = 4096
    parallel: bool = False  # use parallel-in-time passes for sweeps >= 2
    chunk: int = 512  # blocked-scan chunk length for the parallel path;
    # 0 = one-level associative scan (ops.pscan — small T only, it
    # materializes (T, C, bs, bs) elements)
    jitter: float = 0.0  # smoother pseudo-prediction ridge
    unroll: int = 8  # lax.scan unroll factor for the sequential passes
    # (TPU while-loop per-step overhead ~16us dominates these tiny-block
    # scans; unrolling amortizes it at modest compile cost)
    backend: str = "xla"  # 'xla' | 'pallas': 'pallas' runs the fixed-sites
    # forward/backward passes (sweeps >= 2) as fused VMEM-resident kernels
    # (ops/pallas_kalman.py) — one kernel per pass instead of T scan steps
    pallas_block: int = 256  # time-block length of the fused kernels
    s_chunk: int = 0  # sigma-point chunk for the fused ADF kernel's online
    # max-rescaled accumulation (batched/mixture path); 0 = single chunk
    channel_axis: str = ""  # mesh axis name to shard the channel dim over
    # (requires an ambient mesh via jax.sharding.set_mesh; see
    # nsgp_tpu.parallel.mesh.shard_inference_over_channels)
    time_axis: str = ""  # mesh axis name to shard the blocked-scan CHUNK
    # dimension over (parallel=True + chunk > 0 only): passes 1/3 partition
    # with zero comms, pass 2's chunk-total compose is the only exchange

    def damp(self, itt: int) -> float:
        if len(self.damping) == 0:
            return 0.5
        return self.damping[min(itt, len(self.damping) - 1)]


class EPResult(NamedTuple):
    Eft: jax.Array  # (T, C) posterior mean of H x (subbands then modulators)
    Varft: jax.Array  # (T, C) posterior marginal variance
    lZ: jax.Array  # (T,) site log-normalizers from the last EP pass
    sites: Sites
    nlZ: jax.Array  # (ep_itts,) per-sweep negative log marginal likelihood
    ms: jax.Array  # (T, C*bs) smoothed state means, trailing axis flattened
    Ps: jax.Array  # (T, C*bs*bs) smoothed state covariances, flattened
    # (flat layout avoids the 32-40x TPU tile-padding blowup of
    # (T, C, bs, bs); reshape with (T, C, bs[, bs]) for small-T analysis)
    maxdiff: jax.Array  # (ep_itts,) max |change| in posterior mean/variance
    # vs the previous sweep — the reference's convergence monitor
    # (gf_ep_modulator.m:279-289); entry 0 is inf (no previous sweep)


def _mom_point(model: GTNMFModel, params: GTNMFParams):
    """Per-step moment closure for the sequential ADF scan."""
    mp = model.moment_params()

    def mom_fn(y_k, fmu, fs2, frac):
        lZ, dlZ, d2lZ = moments(mp, params.lik, y_k, fmu, fs2, params.W, frac)
        return lZ, dlZ, d2lZ

    return mom_fn


def _ep_resite(
    model: GTNMFModel,
    params: GTNMFParams,
    cfg: EPConfig,
    y: jax.Array,
    mask: jax.Array,
    mu: jax.Array,  # (T, C) smoothed observable means
    var: jax.Array,  # (T, C) smoothed observable variances
    sites: Sites,
    damp: float,
    exclude_last: bool = False,
):
    """Vectorized EP site re-matching at the smoothed cavity (all T at once).

    Ref gf_ep_modulator_nmf.m:240-267 (the backward-pass EP block).
    ``exclude_last`` reproduces the reference exactly: its backward loop runs
    k = T-1..1 and never re-sites the last time step (site T is refreshed in
    the *forward* pass of the next sweep instead, the ``k == numel(yall)``
    branch at :141).  The sequential engine sets this; the parallel/Pallas
    backends keep the all-T re-site (same fixed point, different path).
    """
    if exclude_last:
        mask = mask.at[-1].set(False)
    frac = cfg.ep_fraction
    mp = model.moment_params()
    v_cav_raw = 1.0 / (1.0 / var - frac * sites.ttau)
    ok = (v_cav_raw > 0.0) & mask[:, None]
    v_cav = jnp.where(ok, v_cav_raw, 1.0)
    m_cav = jnp.where(ok, v_cav_raw * (mu / var - frac * sites.tnu), 0.0)

    lZ, dlZ, d2lZ = moments_chunked(
        mp, params.lik, y, m_cav, v_cav, params.W, frac, chunk=cfg.moment_chunk
    )
    lZ = jnp.where(mask, lZ, 0.0)

    denom = 1.0 + d2lZ * v_cav
    ttau_prop = (1.0 - damp * frac) * sites.ttau + damp * (-d2lZ / denom)
    tnu_prop = (1.0 - damp * frac) * sites.tnu + damp * (
        (dlZ - m_cav * d2lZ) / denom
    )
    ttau = jnp.where(ok, ttau_prop, sites.ttau)
    tnu = jnp.where(ok, tnu_prop, sites.tnu)
    ttau = jnp.maximum(ttau, 0.0)
    return Sites(ttau, tnu), lZ


def _constrain_channel(ssm, sites: Sites, axis: str):
    """Seed GSPMD with channel-axis shardings (no-op if axis is empty).

    One constraint on each channel-stacked array is enough: the filter/
    smoother algebra is elementwise over C so the sharding propagates through
    the scans; moment-matching reductions over channels become psums.
    """
    if not axis:
        return ssm, sites
    from jax.sharding import PartitionSpec as P

    wsc = jax.lax.with_sharding_constraint
    c = lambda x: wsc(x, P(axis, *([None] * (x.ndim - 1))))
    ssm = ssm._replace(
        F=c(ssm.F), LQcLT=c(ssm.LQcLT), H=c(ssm.H), Pinf=c(ssm.Pinf),
        A=c(ssm.A), Q=c(ssm.Q), pad_eye=c(ssm.pad_eye),
    )
    sites = Sites(
        wsc(sites.ttau, P(None, axis)), wsc(sites.tnu, P(None, axis))
    )
    return ssm, sites


def _forward_backward(ssm, sites, cfg: EPConfig):
    """Filter with fixed sites + RTS smooth; sequential or parallel-in-time.

    Returns FLATTENED smoothed trajectories (T, C*bs) / (T, C*bs*bs) — see
    kalman.PackedTrajectory for the TPU layout rationale.
    """
    if cfg.backend == "pallas":
        from nsgp_tpu.ops import pallas_kalman

        # Mosaic on TPU; the Pallas interpreter elsewhere (tests on CPU).
        interpret = jax.default_backend() not in ("tpu", "axon")
        return pallas_kalman.filter_smoother_pallas(
            ssm, sites, cfg.pallas_block, interpret
        )
    if cfg.parallel:
        if cfg.chunk:
            from nsgp_tpu.ops import bscan

            return bscan.blocked_filter_smoother(ssm, sites, cfg.chunk,
                                                 time_axis=cfg.time_axis)
        from nsgp_tpu.ops import pscan

        ms, Ps = pscan.filter_smoother_with_sites(ssm, sites, jitter=cfg.jitter)
        T = ms.shape[0]
        return ms.reshape(T, -1), Ps.reshape(T, -1)
    fr = kalman.filter_with_sites(ssm, sites, store=True, jitter=cfg.jitter,
                                  unroll=cfg.unroll)
    ms, Ps = kalman.rts_smoother(ssm, fr, unroll=cfg.unroll)
    return ms, Ps


@partial(jax.jit, static_argnums=(0, 4))
@f32_matmuls
def ep_infer(
    model: GTNMFModel,
    params: GTNMFParams,
    y: jax.Array,  # (T,) observations; NaNs allowed (-> missing)
    mask: Optional[jax.Array] = None,  # (T,) bool; default = ~isnan(y)
    config: EPConfig = EPConfig(),
) -> EPResult:
    """Full Power-EP posterior inference (prediction mode of the reference).

    Equivalent call: gf_ep_modulator_nmf(w, t, y, ss, mom, t, ...) —
    the test inputs are implicitly the training grid; missing steps
    (mask False / NaN y) get pure GP interpolation like the reference's
    NaN handling.
    """
    if mask is None:
        mask = ~jnp.isnan(y)
    y = jnp.nan_to_num(y)
    T = y.shape[0]
    ssm = model.build_ssm(params)
    C = ssm.num_channels
    dtype = ssm.A.dtype
    sites = kalman.init_sites(T, C, dtype)
    ssm, sites = _constrain_channel(ssm, sites, config.channel_axis)
    mom_fn = _mom_point(model, params)

    nlZ = jnp.zeros((config.ep_itts,), dtype)
    maxdiff = jnp.full((config.ep_itts,), jnp.inf, dtype)
    lZ_final = jnp.zeros((T,), dtype)
    last_only = jnp.zeros((T,), bool).at[-1].set(True)
    # Sequential backend follows the reference's exact last-site bookkeeping
    # (forward re-match at k=T, backward re-site over k<T, nlZ mixing the
    # forward lZ(T) with the backward lZ(1..T-1) — gf_ep_modulator_nmf.m:141,
    # :207, :277).  Parallel/Pallas keep the simpler all-T re-site.
    seq = config.backend != "pallas" and not config.parallel
    lZ_last = jnp.zeros((), dtype)  # forward-pass lZ at the final step

    mu = var = None
    for itt in range(config.ep_itts):
        damp = config.damp(itt)
        if itt == 0:
            if config.backend == "pallas":
                from nsgp_tpu.ops import pallas_kalman

                interpret = jax.default_backend() not in ("tpu", "axon")
                ms_b, Ps_b, lZ, sites = pallas_kalman.adf_filter_pallas(
                    model.moment_params(), ssm, params.W, params.lik, y, mask,
                    damp, config.pallas_block, interpret,
                )
                ms, Ps = pallas_kalman.smoother_pallas_bmajor(
                    ssm, ms_b, Ps_b, T, config.pallas_block, interpret
                )
            else:
                fr, lZ, sites = kalman.adf_filter(
                    ssm, y, mask, sites, mom_fn, damp, match_mask=None,
                    store=True, unroll=config.unroll,
                )
                ms, Ps = kalman.rts_smoother(ssm, fr, unroll=config.unroll)
            nlZ = nlZ.at[0].set(-jnp.sum(lZ))
            lZ_final = lZ
            lZ_last = lZ[-1]
        elif config.parallel or config.backend == "pallas":
            # Linear-Gaussian pass with fixed sites: associative scans
            # (parallel) or fused Pallas kernels (backend='pallas').  Both
            # skip the reference's last-step forward re-match quirk (same
            # EP fixed point, slightly different path).
            ms, Ps = _forward_backward(ssm, sites, config)
        else:
            # Reference quirk: later forward passes still re-match the site
            # at the very last step (itt == 1 || k == numel(yall) branch).
            fr, lZ_fwd, sites = kalman.adf_filter(
                ssm, y, mask, sites, mom_fn, damp, match_mask=last_only, store=True,
                unroll=config.unroll,
            )
            lZ_last = lZ_fwd[-1]
            ms, Ps = kalman.rts_smoother(ssm, fr, unroll=config.unroll)

        mu_new, var_new = kalman.observable_marginals(ssm, ms, Ps)
        if itt > 0:
            # Convergence monitor (ref gf_ep_modulator.m:279-289).
            md = jnp.maximum(
                jnp.max(jnp.abs(mu_new - mu)), jnp.max(jnp.abs(var_new - var))
            )
            maxdiff = maxdiff.at[itt].set(md)
        mu, var = mu_new, var_new

        if itt < config.ep_itts - 1:
            sites, lZ = _ep_resite(
                model, params, config, y, mask, mu, var, sites,
                config.damp(itt + 1), exclude_last=seq,
            )
            if seq:
                lZ = lZ.at[-1].set(lZ_last)
            nlZ = nlZ.at[itt + 1].set(-jnp.sum(lZ))
            lZ_final = lZ

    if seq and config.ep_itts > 1:
        # The final forward pass refreshed site T after the last re-site;
        # the reference's out.lZ carries that fresher value (:141, :313).
        lZ_final = lZ_final.at[-1].set(lZ_last)

    return EPResult(Eft=mu, Varft=var, lZ=lZ_final, sites=sites, nlZ=nlZ,
                    ms=ms, Ps=Ps, maxdiff=maxdiff)


@partial(jax.jit, static_argnums=(0, 4))
@f32_matmuls
def ep_energy(
    model: GTNMFModel,
    params: GTNMFParams,
    y: jax.Array,
    mask: Optional[jax.Array] = None,
    config: EPConfig = EPConfig(),
) -> jax.Array:
    """Negative log marginal likelihood (energy mode, xt=[] in the ref).

    nlml = -sum_k lZ_k from the final EP moment evaluation
    (gf_ep_modulator_nmf.m:355-533).  Fully differentiable w.r.t. ``params``
    by autodiff — a capability the reference lacks (it returns zero
    gradients and relies on fminunc finite differences).
    """
    if mask is None:
        mask = ~jnp.isnan(y)
    y = jnp.nan_to_num(y)
    T = y.shape[0]
    ssm = model.build_ssm(params)
    sites = kalman.init_sites(T, ssm.num_channels, ssm.A.dtype)
    ssm, sites = _constrain_channel(ssm, sites, config.channel_axis)
    mom_fn = _mom_point(model, params)

    # Sweep 1: ADF — this is the lZ if ep_itts == 1.
    store = config.ep_itts > 1
    fr, lZ, sites = kalman.adf_filter(
        ssm, y, mask, sites, mom_fn, config.damp(0), match_mask=None,
        store=store, unroll=config.unroll,
    )
    lZ_last = lZ[-1]  # forward-pass lZ at the final step (ref :413)
    for itt in range(1, config.ep_itts):
        ms, Ps = kalman.rts_smoother(ssm, fr, unroll=config.unroll)
        mu, var = kalman.observable_marginals(ssm, ms, Ps)
        sites, lZ = _ep_resite(
            model, params, config, y, mask, mu, var, sites, config.damp(itt),
            exclude_last=True,
        )
        lZ = lZ.at[-1].set(lZ_last)
        if itt < config.ep_itts - 1:
            fr, lZ_fwd, sites = kalman.adf_filter(
                ssm,
                y,
                mask,
                sites,
                mom_fn,
                config.damp(itt),
                match_mask=jnp.zeros((T,), bool).at[-1].set(True),
                store=True,
            )
            lZ_last = lZ_fwd[-1]
    return -jnp.sum(lZ)
