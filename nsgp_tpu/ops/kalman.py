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
    ms: jax.Array  # (T, C, bs) filtered means
    Ps: jax.Array  # (T, C, bs, bs) filtered covariances


def filter_with_sites(ssm: BlockSSM, sites: Sites, store: bool = True):
    """Linear-Gaussian forward filter given fixed EP sites.

    Used for EP sweeps >= 2 where the sites do not change during the pass
    (ref gf_ep_modulator_nmf.m:126-184 with the itt>1 branch inactive).
    """
    m0 = jnp.zeros(ssm.H.shape, ssm.A.dtype)
    P0 = ssm.Pinf

    def step(carry, site_k):
        m, P, first = carry
        m, P = jax.lax.cond(first, lambda: (m, P), lambda: predict(ssm, m, P))
        ttau_k, tnu_k = site_k
        m, P = site_update(ssm, m, P, ttau_k, tnu_k)
        out = (m, P) if store else None
        return (m, P, jnp.zeros_like(first)), out

    first = jnp.asarray(True)
    (mT, PT, _), outs = jax.lax.scan(step, (m0, P0, first), (sites.ttau, sites.tnu))
    if store:
        return FilterResult(ms=outs[0], Ps=outs[1])
    return FilterResult(ms=mT[None], Ps=PT[None])


def rts_smoother(ssm: BlockSSM, fr: FilterResult, jitter: float = 0.0):
    """RTS smoothing pass over stored filtered moments.

    Ref gf_ep_modulator_nmf.m:207-234 — per-channel version; the Cholesky
    solve of the pseudo-prediction A P A' + Q happens on (bs, bs) blocks.
    ``jitter`` adds a deterministic diagonal ridge (the reference retries a
    failed Cholesky with random jitter 1e-4; we use a fixed ridge instead).
    """
    A, Q = ssm.A, ssm.Q
    eyeb = jnp.eye(ssm.block_size, dtype=A.dtype)

    def step(carry, inp):
        m_next, P_next = carry
        ms_k, Ps_k = inp
        Pp = jnp.einsum("cij,cjk,clk->cil", A, Ps_k, A) + Q
        Pp = 0.5 * (Pp + jnp.swapaxes(Pp, -1, -2)) + jitter * eyeb
        PA = jnp.einsum("cij,ckj->cik", Ps_k, A)  # Ps A'
        # G = Ps A' Pp^{-1}; solve Pp' G' = (Ps A')' per channel.
        # pad_eye keeps zero-padded blocks nonsingular (their PA rows are 0).
        Gt = jnp.linalg.solve(Pp + ssm.pad_eye, jnp.swapaxes(PA, -1, -2))
        G = jnp.swapaxes(Gt, -1, -2)
        m = ms_k + jnp.einsum("cij,cj->ci", G, m_next - jnp.einsum("cij,cj->ci", A, ms_k))
        P = Ps_k + jnp.einsum("cij,cjk,clk->cil", G, P_next - Pp, G)
        P = 0.5 * (P + jnp.swapaxes(P, -1, -2))
        return (m, P), (m, P)

    mT, PT = fr.ms[-1], fr.Ps[-1]
    (_, _), (ms_rev, Ps_rev) = jax.lax.scan(
        step, (mT, PT), (fr.ms[:-1], fr.Ps[:-1]), reverse=True
    )
    ms = jnp.concatenate([ms_rev, mT[None]], axis=0)
    Ps = jnp.concatenate([Ps_rev, PT[None]], axis=0)
    return ms, Ps


def observable_marginals(ssm: BlockSSM, ms, Ps):
    """(T, C) mean and variance of H x for stored state moments."""
    mu = jnp.einsum("ci,tci->tc", ssm.H, ms)
    var = jnp.einsum("ci,tcij,cj->tc", ssm.H, Ps, ssm.H)
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
        m, P = jax.lax.cond(first, lambda: (m, P), lambda: predict(ssm, m, P))

        fmu, PH, HPH = marginals(ssm, m, P)

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
        m, P = site_update(ssm, m, P, tt_eff, tn_eff)

        out = (m, P) if store else None
        return (m, P, jnp.zeros_like(first)), (out, lZk, ttau_new, tnu_new)

    first = jnp.asarray(True)
    (mT, PT, _), (outs, lZ, ttau, tnu) = jax.lax.scan(
        step, (m0, P0, first), (y, mask, match_mask, sites.ttau, sites.tnu)
    )
    fr = FilterResult(ms=outs[0], Ps=outs[1]) if store else FilterResult(mT[None], PT[None])
    return fr, lZ, Sites(ttau, tnu)
