"""Sequential (lax.scan) Kalman filtering / RTS smoothing on block channels.

Faithful TPU re-design of the reference's dense per-sample recursions
(gf_ep_modulator_nmf.m:126-274).  All state is channel-stacked:

    m (C, bs),  P (C, bs, bs),  sites ttau/tnu (T, C)

and every step is batched over C with einsums (the dense joint covariance is
block-diagonal for all time — see nsgp_tpu.ops.ssm).  The EP measurement
update uses the branch-free "z-form"

    z = ttau * HPH + 1
    K = (P H) * ttau / z
    m <- m - (P H) * (ttau * fmu - tnu) / z
    P <- P - K (P H)'

which is algebraically identical to BOTH branches of the reference's update
(gf_ep_modulator_nmf.m:159-176: the ttau==0 rank-1 form and the normal
K = W/(HPH + 1/ttau) form) but needs no data-dependent branching — exactly
what XLA wants.  Missing observations are handled by zero sites (z=1 makes
the update a no-op), matching the reference's NaN -> pure-prediction path.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from nsgp_tpu.ops.ssm import BlockSSM


class Sites(NamedTuple):
    """EP site (natural) parameters per time step and channel."""

    ttau: jax.Array  # (T, C) site precisions (>= 0)
    tnu: jax.Array  # (T, C) site precision-adjusted means


def init_sites(T: int, C: int, dtype=jnp.float32) -> Sites:
    return Sites(jnp.zeros((T, C), dtype), jnp.zeros((T, C), dtype))


# ---------------------------------------------------------------------------
# Primitive steps (batched over channels)
# ---------------------------------------------------------------------------


def predict(ssm: BlockSSM, m, P):
    """One prediction step: m <- A m, P <- A P A' + Q (per channel)."""
    m = jnp.einsum("cij,cj->ci", ssm.A, m)
    P = jnp.einsum("cij,cjk,clk->cil", ssm.A, P, ssm.A) + ssm.Q
    return m, P


def marginals(ssm: BlockSSM, m, P):
    """Per-channel observable marginals: fmu (C,), PH (C,bs), HPH (C,)."""
    fmu = jnp.einsum("ci,ci->c", ssm.H, m)
    PH = jnp.einsum("cij,cj->ci", P, ssm.H)
    HPH = jnp.einsum("ci,ci->c", ssm.H, PH)
    return fmu, PH, HPH


def site_update(ssm: BlockSSM, m, P, ttau_k, tnu_k):
    """Branch-free EP measurement update for all channels at one step."""
    fmu, PH, HPH = marginals(ssm, m, P)
    z = ttau_k * HPH + 1.0
    v = (ttau_k * fmu - tnu_k) / z
    m = m - PH * v[:, None]
    P = P - (ttau_k / z)[:, None, None] * PH[:, None, :] * PH[:, :, None]
    P = 0.5 * (P + jnp.swapaxes(P, -1, -2))
    return m, P


def moment_match(lZk, dlZ, d2lZ, fmu, fs2, ttau, tnu, damp, frac=1.0):
    """Damped EP site update from tilted-moment derivatives.

    Ref gf_ep_modulator_nmf.m:147-151 (ADF, frac-scaled damping on the
    smoothing pass per :256-259).  Returns clamped (ttau >= 0) sites.
    """
    denom = 1.0 + d2lZ * fs2
    ttau_new = (1.0 - damp * frac) * ttau + damp * (-d2lZ / denom)
    tnu_new = (1.0 - damp * frac) * tnu + damp * ((dlZ - fmu * d2lZ) / denom)
    ttau_new = jnp.maximum(ttau_new, 0.0)
    return ttau_new, tnu_new


# ---------------------------------------------------------------------------
# Whole-sequence passes
# ---------------------------------------------------------------------------


class FilterResult(NamedTuple):
    ms: jax.Array  # (T, C, bs) filtered means (dense; parallel-scan path)
    Ps: jax.Array  # (T, C, bs, bs) filtered covariances


class PackedTrajectory(NamedTuple):
    """Time-stacked filter trajectories, flattened on the trailing axis.

    TPU layout note: stacking (T, C, bs, bs) directly makes XLA tile each
    trailing (bs, bs) = (4, 4) matrix to an (8, 128) lane tile — a measured
    32-40x HBM padding blowup (a 116 MB trajectory ballooned to 3.6 GB and
    OOMed the chip at T = 100k).  Flattening to (T, C*bs*bs) pads only T to
    a multiple of 8 and the lane dim up to the next 128 (~1.26x).
    """

    ms: jax.Array  # (T, C*bs) filtered means
    Ps: jax.Array  # (T, C*bs*bs) filtered covariances
    Gs: jax.Array  # (T, C*bs*bs) smoother gains: row k holds
    #   G_{k-1} = P_{k-1} A' Pp_k^{-1} (row 0 is zeros)
    Pps: jax.Array  # (T, C*bs*bs) pseudo-predictions Pp_k = A P_{k-1} A' + Q
    #   (row 0 is zeros; both computed in the forward pass where P_{k-1}
    #   and Pp_k coexist, so the smoother needs no per-step solves)


def _smoother_gain(ssm: BlockSSM, P_prev, Pp):
    """G = P_prev A' Pp^{-1} per channel (pad_eye keeps padded dims regular)."""
    PA = jnp.einsum("cij,ckj->cik", P_prev, ssm.A)  # P A'
    Gt = jnp.linalg.solve(
        jnp.swapaxes(Pp + ssm.pad_eye, -1, -2), jnp.swapaxes(PA, -1, -2)
    )
    return jnp.swapaxes(Gt, -1, -2)


def filter_with_sites(
    ssm: BlockSSM, sites: Sites, store: bool = True, jitter: float = 0.0
) -> PackedTrajectory:
    """Linear-Gaussian forward filter given fixed EP sites.

    Used for EP sweeps >= 2 where the sites do not change during the pass
    (ref gf_ep_modulator_nmf.m:126-184 with the itt>1 branch inactive).
    Emits the smoother gains on the fly (see PackedTrajectory).
    """
    m0 = jnp.zeros(ssm.H.shape, ssm.A.dtype)
    P0 = ssm.Pinf
    eyeb = jitter * jnp.eye(ssm.block_size, dtype=ssm.A.dtype)

    def step(carry, site_k):
        m, P, first = carry
        mp, Pp = jax.lax.cond(first, lambda: (m, P), lambda: predict(ssm, m, P))
        Pp = 0.5 * (Pp + jnp.swapaxes(Pp, -1, -2)) + eyeb
        G = _smoother_gain(ssm, P, Pp)
        G = jnp.where(first, 0.0, G)
        ttau_k, tnu_k = site_k
        m, P = site_update(ssm, mp, Pp, ttau_k, tnu_k)
        out = (
            (m.reshape(-1), P.reshape(-1), G.reshape(-1),
             jnp.where(first, 0.0, Pp).reshape(-1))
            if store
            else None
        )
        return (m, P, jnp.zeros_like(first)), out

    first = jnp.asarray(True)
    (mT, PT, _), outs = jax.lax.scan(step, (m0, P0, first), (sites.ttau, sites.tnu))
    if store:
        return PackedTrajectory(ms=outs[0], Ps=outs[1], Gs=outs[2], Pps=outs[3])
    z = jnp.zeros((1, PT.size), PT.dtype)
    return PackedTrajectory(ms=mT.reshape(1, -1), Ps=PT.reshape(1, -1), Gs=z, Pps=z)


def rts_smoother(ssm: BlockSSM, traj: PackedTrajectory, jitter: float = 0.0):
    """RTS smoothing pass over a stored packed trajectory.

    Ref gf_ep_modulator_nmf.m:207-234 — per-channel version.  The smoother
    gains were already emitted by the forward pass, so this is a pure affine
    backward recursion (no solves):

        m_k <- m_k + G_k (m_{k+1} - A m_k)
        P_k <- P_k + G_k (P_{k+1} - Pp_{k+1}) G_k'

    ``jitter`` is accepted for API compatibility; the ridge is applied in
    the forward pass where Pp is formed.
    """
    del jitter
    C, bs = ssm.H.shape
    A = ssm.A
    unm = lambda v: v.reshape(C, bs)
    unP = lambda v: v.reshape(C, bs, bs)

    def step(carry, inp):
        m_next, P_next = carry
        ms_k, Ps_k, G_k1, Pp_k1 = inp
        ms_k, Ps_k = unm(ms_k), unP(Ps_k)
        G, Pp1 = unP(G_k1), unP(Pp_k1)
        m = ms_k + jnp.einsum("cij,cj->ci", G, m_next - jnp.einsum("cij,cj->ci", A, ms_k))
        P = Ps_k + jnp.einsum("cij,cjk,clk->cil", G, P_next - Pp1, G)
        P = 0.5 * (P + jnp.swapaxes(P, -1, -2))
        return (m, P), (m.reshape(-1), P.reshape(-1))

    mT, PT = unm(traj.ms[-1]), unP(traj.Ps[-1])
    # Row k+1 of Gs/Pps holds G_k and Pp_{k+1} (emitted on the forward pass).
    xs = (traj.ms[:-1], traj.Ps[:-1], traj.Gs[1:], traj.Pps[1:])
    (_, _), (ms_rev, Ps_rev) = jax.lax.scan(step, (mT, PT), xs, reverse=True)
    ms = jnp.concatenate([ms_rev, traj.ms[-1:]], axis=0)
    Ps = jnp.concatenate([Ps_rev, traj.Ps[-1:]], axis=0)
    return ms, Ps


def observable_marginals(ssm: BlockSSM, ms, Ps):
    """(T, C) mean and variance of H x from FLATTENED state trajectories.

    ms (T, C*bs), Ps (T, C*bs*bs).  Implemented as two block-structured
    matmuls (T, C*bs) @ (C*bs, C) — MXU-friendly and, crucially, never
    materializing a (T, C, bs, bs) intermediate (see PackedTrajectory).
    """
    C, bs = ssm.H.shape
    eyeC = jnp.eye(C, dtype=ssm.H.dtype)
    Hm = (ssm.H[:, :, None] * eyeC[:, None, :]).reshape(C * bs, C)
    HH = ssm.H[:, :, None] * ssm.H[:, None, :]  # (C, bs, bs)
    HHm = (HH[:, :, :, None] * eyeC[:, None, None, :]).reshape(C * bs * bs, C)
    mu = ms @ Hm
    var = Ps @ HHm
    return mu, var


def adf_filter(
    ssm: BlockSSM,
    y: jax.Array,  # (T,)
    mask: jax.Array,  # (T,) bool, True = observed
    sites: Sites,
    mom_fn,  # (y_k, fmu (C,), fs2 (C,), frac) -> (lZ, dlZ (C,), d2lZ (C,))
    damp: float,
    match_mask: Optional[jax.Array] = None,  # (T,) bool: do moment matching
    store: bool = True,
):
    """Forward filter WITH interleaved moment matching (ADF / first EP pass).

    Ref gf_ep_modulator_nmf.m:126-192.  ``match_mask`` selects steps where
    sites are re-matched from the filter marginal (itt==1: all observed
    steps; itt>1: only the last step, per the reference's
    ``itt == 1 || k == numel(yall)`` branch).
    """
    if match_mask is None:
        match_mask = jnp.ones_like(mask)

    m0 = jnp.zeros(ssm.H.shape, ssm.A.dtype)
    P0 = ssm.Pinf

    def step(carry, inp):
        m, P, first = carry
        y_k, obs_k, mm_k, ttau_k, tnu_k = inp
        mp, Pp = jax.lax.cond(first, lambda: (m, P), lambda: predict(ssm, m, P))
        G = _smoother_gain(ssm, P, Pp)
        G = jnp.where(first, 0.0, G)

        fmu, PH, HPH = marginals(ssm, mp, Pp)

        def do_match():
            lZk, dlZ, d2lZ = mom_fn(y_k, fmu, HPH, 1.0)
            tt, tn = moment_match(lZk, dlZ, d2lZ, fmu, HPH, ttau_k, tnu_k, damp, 1.0)
            return lZk, tt, tn

        lZk, ttau_new, tnu_new = jax.lax.cond(
            jnp.logical_and(obs_k, mm_k),
            do_match,
            lambda: (jnp.zeros((), m.dtype), jnp.maximum(ttau_k, 0.0), tnu_k),
        )
        # Masked (unobserved) steps: zero sites => update is a no-op.
        tt_eff = jnp.where(obs_k, ttau_new, 0.0)
        tn_eff = jnp.where(obs_k, tnu_new, 0.0)
        m, P = site_update(ssm, mp, Pp, tt_eff, tn_eff)

        out = (
            (m.reshape(-1), P.reshape(-1), G.reshape(-1),
             jnp.where(first, 0.0, Pp).reshape(-1))
            if store
            else None
        )
        return (m, P, jnp.zeros_like(first)), (out, lZk, ttau_new, tnu_new)

    first = jnp.asarray(True)
    (mT, PT, _), (outs, lZ, ttau, tnu) = jax.lax.scan(
        step, (m0, P0, first), (y, mask, match_mask, sites.ttau, sites.tnu)
    )
    if store:
        traj = PackedTrajectory(ms=outs[0], Ps=outs[1], Gs=outs[2], Pps=outs[3])
    else:
        z = jnp.zeros((1, PT.size), PT.dtype)
        traj = PackedTrajectory(ms=mT.reshape(1, -1), Ps=PT.reshape(1, -1),
                                Gs=z, Pps=z)
    return traj, lZ, Sites(ttau, tnu)
