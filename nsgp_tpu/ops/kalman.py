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


def smoother_gains_chunked(ssm: BlockSSM, Ps_flat, jitter: float = 0.0,
                           chunk: int = 4096):
    """Smoother gains G_k = P_k A' (A P_k A' + Q)^{-1} for ALL steps.

    Computed OUTSIDE the scans as chunked batched solves: an in-scan
    per-step (C, bs, bs) LU costs ~40 us/step on a v5e (it dominated the
    forward pass); one big batched solve over (chunk*C, bs, bs) runs at
    full vector throughput.  Chunking bounds the transiently-padded
    (chunk, C, bs, bs) intermediates (see PackedTrajectory).

    Returns (Gs (T, C*bs*bs), Pps (T, C*bs*bs)) with Pp_k = A P_k A' + Q
    (the pseudo-prediction INTO step k+1).
    """
    C, bs = ssm.H.shape
    A, Q = ssm.A, ssm.Q
    eyeb = jitter * jnp.eye(bs, dtype=A.dtype)
    T = Ps_flat.shape[0]
    nchunk = -(-T // chunk)
    pad = nchunk * chunk - T
    Pp_flat = jnp.pad(Ps_flat, ((0, pad), (0, 0)), constant_values=0.0)
    # padded rows get P = pad_eye-ish via the solve guard below

    def f(Pb):
        P = Pb.reshape(-1, C, bs, bs)
        Pp = jnp.einsum("cij,ncjk,clk->ncil", A, P, A) + Q[None]
        Pp = 0.5 * (Pp + jnp.swapaxes(Pp, -1, -2)) + eyeb
        PA = jnp.einsum("ncij,ckj->ncik", P, A)
        Gt = jnp.linalg.solve(
            jnp.swapaxes(Pp + ssm.pad_eye[None] + jnp.eye(bs, dtype=A.dtype)
                         * jnp.all(Pb == 0.0, axis=-1)[:, None, None, None],
                         -1, -2),
            jnp.swapaxes(PA, -1, -2),
        )
        G = jnp.swapaxes(Gt, -1, -2)
        n = P.shape[0]
        return G.reshape(n, -1), Pp.reshape(n, -1)

    Gs, Pps = jax.lax.map(f, Pp_flat.reshape(nchunk, chunk, -1))
    return Gs.reshape(-1, C * bs * bs)[:T], Pps.reshape(-1, C * bs * bs)[:T]


def filter_with_sites(
    ssm: BlockSSM, sites: Sites, store: bool = True, jitter: float = 0.0,
    unroll: int = 1,
) -> PackedTrajectory:
    """Linear-Gaussian forward filter given fixed EP sites.

    Used for EP sweeps >= 2 where the sites do not change during the pass
    (ref gf_ep_modulator_nmf.m:126-184 with the itt>1 branch inactive).
    """
    m0 = jnp.zeros(ssm.H.shape, ssm.A.dtype)
    P0 = ssm.Pinf
    eyeb = jitter * jnp.eye(ssm.block_size, dtype=ssm.A.dtype)

    def step(carry, site_k):
        m, P, first = carry
        mp, Pp = jax.lax.cond(first, lambda: (m, P), lambda: predict(ssm, m, P))
        Pp = 0.5 * (Pp + jnp.swapaxes(Pp, -1, -2)) + eyeb
        ttau_k, tnu_k = site_k
        m, P = site_update(ssm, mp, Pp, ttau_k, tnu_k)
        out = (m.reshape(-1), P.reshape(-1)) if store else None
        return (m, P, jnp.zeros_like(first)), out

    first = jnp.asarray(True)
    (mT, PT, _), outs = jax.lax.scan(step, (m0, P0, first),
                                     (sites.ttau, sites.tnu), unroll=unroll)
    if store:
        return PackedTrajectory(ms=outs[0], Ps=outs[1])
    return PackedTrajectory(ms=mT.reshape(1, -1), Ps=PT.reshape(1, -1))


def rts_smoother(ssm: BlockSSM, traj: PackedTrajectory, jitter: float = 0.0,
                 unroll: int = 1):
    """RTS smoothing pass over a stored packed trajectory.

    Ref gf_ep_modulator_nmf.m:207-234 — per-channel version.  The smoother
    gains for ALL steps come from one chunked batched solve
    (smoother_gains_chunked), so the backward scan is a pure affine
    recursion (no per-step solves):

        m_k <- m_k + G_k (m_{k+1} - A m_k)
        P_k <- P_k + G_k (P_{k+1} - Pp_{k+1}) G_k'
    """
    C, bs = ssm.H.shape
    A = ssm.A
    unm = lambda v: v.reshape(C, bs)
    unP = lambda v: v.reshape(C, bs, bs)
    Gs, Pps = smoother_gains_chunked(ssm, traj.Ps[:-1], jitter)

    def step(carry, inp):
        m_next, P_next = carry
        ms_k, Ps_k, G_k, Pp_k1 = inp
        ms_k, Ps_k = unm(ms_k), unP(Ps_k)
        G, Pp1 = unP(G_k), unP(Pp_k1)
        m = ms_k + jnp.einsum("cij,cj->ci", G, m_next - jnp.einsum("cij,cj->ci", A, ms_k))
        P = Ps_k + jnp.einsum("cij,cjk,clk->cil", G, P_next - Pp1, G)
        P = 0.5 * (P + jnp.swapaxes(P, -1, -2))
        return (m, P), (m.reshape(-1), P.reshape(-1))

    mT, PT = unm(traj.ms[-1]), unP(traj.Ps[-1])
    # Row k of Gs/Pps holds G_k and Pp_{k+1} (both derived from P_k).
    xs = (traj.ms[:-1], traj.Ps[:-1], Gs, Pps)
    (_, _), (ms_rev, Ps_rev) = jax.lax.scan(step, (mT, PT), xs, reverse=True,
                                            unroll=unroll)
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
    unroll: int = 1,
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

        out = (m.reshape(-1), P.reshape(-1)) if store else None
        return (m, P, jnp.zeros_like(first)), (out, lZk, ttau_new, tnu_new)

    first = jnp.asarray(True)
    (mT, PT, _), (outs, lZ, ttau, tnu) = jax.lax.scan(
        step, (m0, P0, first), (y, mask, match_mask, sites.ttau, sites.tnu),
        unroll=unroll,
    )
    if store:
        traj = PackedTrajectory(ms=outs[0], Ps=outs[1])
    else:
        traj = PackedTrajectory(ms=mT.reshape(1, -1), Ps=PT.reshape(1, -1))
    return traj, lZ, Sites(ttau, tnu)
