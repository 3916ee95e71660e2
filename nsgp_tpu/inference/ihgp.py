"""Infinite-horizon (steady-state) Power-EP inference — the IHGP engine.

TPU-native re-design of ihgp_ep_modulator_nmf.m / _constraints.m and the
mixture variant.  The reference solves a bank of DAREs per channel over a
log-spaced grid of effective noise levels ro = logspace(-2, 4, 32)
(ihgp_ep_modulator_nmf.m:112-191), cubically upsamples to 200 grid points,
and at run time looks up each channel's steady-state quantities by nearest
effective noise R = 1/ttau — giving O(T * m_blk^2) filtering with O(1)
covariance memory.

TPU-first departures from the reference:

- DAREs are solved by the batched doubling iteration (nsgp_tpu.ops.dare),
  all (channel x grid) problems at once, instead of 32 sequential LAPACK
  ``dare`` calls.
- The steady filter recursion  m_k = M(i_{k}) m_{k-1} + K(i_k) ys_k  is an
  *affine scan*: once sites are fixed (EP sweeps >= 2) we gather all T
  matrices and run ``jax.lax.associative_scan`` — O(log T) depth.  The same
  holds for the steady smoother  ms_k = G(i_k) ms_{k+1} + c_k.  Only the
  first ADF sweep (sites feed back into the filter) is a sequential
  ``lax.scan``.
- Lookup is direct log-space indexing into the 200-point grid instead of
  nearest-neighbor argmin (equivalent for a log-uniform grid).

Covariances are never propagated: marginal variances come from the tables
(filter: steady predictive/filtered; smoother: steady PS), exactly like the
reference's constant-variance outputs (ihgp_ep_modulator_nmf.m:492).

Multi-sweep damping (round-4 analysis, see ROUND4_NOTES.md): the re-site
cavity uses the steady smoothed variance, which under-estimates the true
variance near transitions, so converged sites inflate the cavity mean
mu/var and with it the subband posterior means (~25% measured on music) —
an approximation error inherited from the reference.  The reference
mitigates by damping 20-sweep runs at a flat 0.0025
(missing_data_music.m:25), which leaves the sites ~5% converged and scores
below its own 1-sweep run; a (0.1 ADF, 0.025 re-site) schedule — pass
``damping=(0.1, 0.025)`` — is stable (0.5 diverges) and tracks full EP on
17/20 speech and 16/20 music file-kernel combos of the reference grid.

Round-5 robustness additions (see IHGPConfig fields for the full stories):
``keep_best`` returns the lowest-EP-energy sweep's posterior (the 20-sweep
iteration is marginally stable on strongly-harmonic files and f32 noise
can flip it into divergence); ``pf_correct`` offers the Joseph-consistent
steady smoothed variance as an analysis variant — measured at grid scale,
the reference quirk's variance inflation turned out to be load-bearing for
multi-sweep stability, so no shipped driver enables it.  For multi-sweep
quality beyond the tuned damping, use the full-EP engine (the fused-Pallas
path is faster than IHGP on-chip at audio scale: 0.073 vs 0.59 s/sweep at
T = 100k).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nsgp_tpu.models.gtnmf import GTNMFModel, GTNMFParams
from nsgp_tpu.ops import dare as dare_mod
from nsgp_tpu.ops.kalman import Sites
from nsgp_tpu.ops.moments import moments, moments_chunked
from nsgp_tpu.ops.ssm import BlockSSM
from nsgp_tpu.utils.precision import f32_matmuls


class IHGPConfig(NamedTuple):
    ep_fraction: float = 0.5
    ep_itts: int = 3
    damping: tuple = ()
    moment_chunk: int = 8192
    grid_lo: float = -2.0  # log10 of smallest effective noise (ref :112).
    # IMPORTANT: the grid must span the REALIZED effective noise
    # R = lik / ttau — for small lik and strong sites that is several
    # decades below lik (drivers use -4 to -7); a clamped lookup silently
    # substitutes the wrong steady covariance.
    grid_hi: float = 4.0
    grid_coarse: int = 32
    grid_fine: int = 200
    unroll: int = 8  # lax.scan unroll for the sequential steady passes
    pf_correct: float = 0.0  # blend weight toward the CORRECT steady
    # smoothed VARIANCE (from Pf = PP - K S K') for the re-site cavity and
    # Varft output, vs the variance implied by the reference's quirk
    # Pf = PP - K ro K' (ihgp_ep_modulator_nmf.m:162).  The quirk leaves
    # h'Pf h ~= h'PP h at strong sites (ro << h'PP h) instead of ~= ro — a
    # many-x overestimate of the smoothed variance at observed steps: the
    # re-site cavity bias that makes converged sites degrade harmonic files
    # (ROUND4_NOTES item 2b, 5-20x measured).  HOWEVER the multi-sweep
    # iteration RELIES on that inflation for stability: the fully-corrected
    # variance (1.0) NaN'd guitar and cost sax 3 dB even with quirk
    # mean-path gains and a lik floor — the small cavity variance re-ignites
    # the strong-site feedback loop that the reference's conservative
    # damping holds down (and a 0.5 log-blend merely moved the blowup to a
    # different file).  Offered as the log-space blend
    # exp((1-w) log v_quirk + w log v_correct) with mean-path gain tables
    # (Ph, Gn) always on the quirk, but NOT enabled by any shipped driver:
    # the robust fix for multi-sweep quality is per-step transient
    # variances, i.e. the full-EP pass — which the fused-Pallas EP engine
    # runs FASTER than IHGP at audio scale anyway.  0 = reference parity.
    keep_best: bool = False  # return the posterior of the sweep with the
    # LOWEST EP energy (each sweep's smoothed moments are scored by the
    # re-site moments evaluation it already performs; the final sweep gets
    # one extra evaluation).  Rationale: at 20 sweeps under the tuned
    # damping the iteration is marginally stable on strongly-harmonic
    # files — f32 run-to-run noise (serial vs vmapped linalg) flips sax /
    # guitar between ~8 dB and divergence (nlZ rising monotonically).
    # Energy-based sweep selection makes deep iteration no worse than the
    # best intermediate sweep regardless.  Off = reference trajectory.
    parallel: bool = False  # parallel-in-time passes for sweeps >= 2.
    # With chunk == 0 this is the one-level associative scan, which gathers
    # per-step (T, C, bs, bs) gain tensors whose TPU tile padding is 32x
    # (OOM at T ~ 100k on one chip) — small-T only.  With chunk > 0 the
    # BLOCKED two-level scan (see _steady_filter_blocked) never
    # materializes them and is the long-signal fast path.
    chunk: int = 1024  # blocked-scan chunk length for parallel=True

    def damp(self, itt: int) -> float:
        if len(self.damping) == 0:
            return 0.5
        return self.damping[min(itt, len(self.damping) - 1)]


class IHGPTables(NamedTuple):
    """Per-(channel, grid) steady-state quantities.  G = grid_fine points."""

    log_r: jax.Array  # (G,) log10 effective noise grid
    Ph: jax.Array  # (C, G, bs) predictive-covariance column P_pred h —
    # the filter gain is formed IN-SCAN as K = Ph(idx_{k-1}) tt_k / z
    # because the reference mixes the PP looked up at the PREVIOUS step's
    # site with the CURRENT step's noise (ihgp_ep_modulator_nmf.m:235-241
    # lookup by R(n,k-1) vs :296 `K = W(ii,n)/(HPH(n)+R(n,k))`)
    Gn: jax.Array  # (C, G, bs, bs) steady smoother gain Pf A' Pp^{-1}
    hPph: jax.Array  # (C, G) steady predictive marginal variance h' Ppred h
    hPSh: jax.Array  # (C, G) steady smoothed marginal variance


class IHGPResult(NamedTuple):
    Eft: jax.Array  # (T, C) smoothed observable means
    Varft: jax.Array  # (T, C) smoothed marginal variances (steady lookup)
    lZ: jax.Array  # (T,)
    sites: Sites
    nlZ: jax.Array  # (ep_itts,)
    maxdiff: jax.Array  # (ep_itts,) max |change| in posterior mean/variance
    # vs the previous sweep (convergence monitor; entry 0 is inf)


def build_tables(ssm: BlockSSM, cfg: IHGPConfig) -> IHGPTables:
    """Solve the DARE bank and derive all steady-state tables.

    Ref ihgp_ep_modulator_nmf.m:104-191, vectorized over (C, grid).  The
    coarse 32-point bank is cubically upsampled to 200 points (apxGrid
    equivalent) in the DARE solution P, then K/M/G/PS are derived per fine
    point.
    """
    A, Q, H, Pinf = ssm.A, ssm.Q, ssm.H, ssm.Pinf
    C, bs = A.shape[0], A.shape[-1]
    dt_ = A.dtype

    log_r_coarse = np.linspace(cfg.grid_lo, cfg.grid_hi, cfg.grid_coarse)
    log_r_fine = np.linspace(cfg.grid_lo, cfg.grid_hi, cfg.grid_fine)
    r_coarse = jnp.asarray(10.0**log_r_coarse, dt_)  # (Gc,)
    r_fine = jnp.asarray(10.0**log_r_fine, dt_)  # (G,)
    Wint = jnp.asarray(
        dare_mod.cubic_interp_matrix(log_r_coarse, log_r_fine), dt_
    )  # (G, Gc)

    # vmap over grid then channels: (C, Gc, bs, bs)
    P_coarse = jax.vmap(
        lambda Ac, Hc, Qc: jax.vmap(lambda r: dare_mod.dare_filter(Ac, Hc, Qc, r))(
            r_coarse
        )
    )(A, H, Q)

    # DARE failure tolerance (ref ihgp_ep_modulator_nmf.m:114-128 drops
    # failing grid points): replace any non-converged grid point with the
    # nearest converged one on the same channel; a fully-failed channel
    # falls back to Pinf (pure-prediction steady state).
    res = jax.vmap(
        lambda Pg, Ac, Hc, Qc: jax.vmap(
            lambda P, r: dare_mod.dare_residual(P, Ac, Hc, Qc, r)
        )(Pg, r_coarse)
    )(P_coarse, A, H, Q)  # (C, Gc)
    good = res < 1e-4
    gi = jnp.arange(cfg.grid_coarse)
    dist = jnp.abs(gi[:, None] - gi[None, :])[None]  # (1, Gc, Gc)
    dist = jnp.where(good[:, None, :], dist, jnp.iinfo(jnp.int32).max)
    src = jnp.argmin(dist, axis=-1)  # (C, Gc) nearest good grid index
    P_coarse = jnp.take_along_axis(P_coarse, src[..., None, None], axis=1)
    any_good = jnp.any(good, axis=1)[:, None, None, None]
    P_coarse = jnp.where(any_good, P_coarse, Pinf[:, None])

    # Forward tables: the reference interpolates the DARE solution PP
    # itself (ihgp_ep_modulator_nmf.m:130-133), then derives the gain at
    # runtime — so P_pred is interpolated to the fine grid and Ph / hPph
    # derived per fine point.
    P_pred = jnp.einsum("gk,ckij->cgij", Wint, P_coarse)
    P_pred = 0.5 * (P_pred + jnp.swapaxes(P_pred, -1, -2))
    Ph = jnp.einsum("cgij,cj->cgi", P_pred, H)  # (C, G, bs)
    hPph = jnp.einsum("cgi,ci->cg", Ph, H)  # (C, G)

    # Smoother tables: the reference derives [PS, G] at the 32 COARSE grid
    # points and cubically interpolates the derived tables (:157-190), NOT
    # the other way around — PS is a nonlinear function of P, so the order
    # matters (measured ~5% marginal-variance difference on modulator
    # channels when deriving at fine points instead).
    Phc = jnp.einsum("cgij,cj->cgi", P_coarse, H)
    hPhc = jnp.einsum("cgi,ci->cg", Phc, H)
    sc = hPhc + r_coarse[None, :]
    Kc = Phc / sc[..., None]
    def smoother_tables(kkw):
        """Gn, hPSh from the coarse filtered covariance Pf = PP - K kkw K'.

        kkw = ro reproduces the REFERENCE QUIRK: the reference weights K K'
        by the NOISE ro, not the innovation variance S
        (ihgp_ep_modulator_nmf.m:162 `P = PP-K*ro(j)*K'`), i.e. Pf is
        inflated by (h'PPh) K K' relative to the standard PP - K S K' — at
        strong sites h'Pf h stays ~= h'PP h instead of ~= ro.  Exact
        reference agreement depends on it (tests/ref_oracle.py).  kkw = S
        gives the standard Joseph-consistent covariance.
        """
        Pfc = P_coarse - kkw[..., None, None] * Kc[..., :, None] * Kc[..., None, :]
        # smoother gain G = Pf A' (A Pf A' + Q)^{-1}  (ref :165-175; with
        # the inflated Pf this is NOT the DARE identity, so the pseudo-
        # prediction is formed explicitly)
        APAQ = jnp.einsum("cij,cgjk,clk->cgil", A, Pfc, A) + Q[:, None]
        APAQ = 0.5 * (APAQ + jnp.swapaxes(APAQ, -1, -2))
        PfA = jnp.einsum("cgij,ckj->cgik", Pfc, A)  # Pf A'
        Gc = jnp.swapaxes(
            jnp.linalg.solve(
                jnp.swapaxes(APAQ + ssm.pad_eye[:, None], -1, -2),
                jnp.swapaxes(PfA, -1, -2),
            ),
            -1,
            -2,
        )
        # steady smoothed covariance: PS = G PS G' + QQ, QQ = Pf - G PP G',
        # eigen-clipped to PSD exactly as the reference (:176-177)
        QQ = Pfc - jnp.einsum("cgij,cgjk,cglk->cgil", Gc, P_coarse, Gc)
        QQ = 0.5 * (QQ + jnp.swapaxes(QQ, -1, -2))
        lamQ, VQ = jnp.linalg.eigh(QQ)
        QQ = jnp.einsum("cgij,cgj,cgkj->cgik", VQ, jnp.maximum(lamQ, 0.0), VQ)
        PSc = jax.vmap(jax.vmap(dare_mod.dlyap_doubling))(Gc, QQ)
        # Smoother-stage failure tolerance (ref :180-185 drops ro points
        # whose smoother DARE fails and re-interpolates without them): the
        # Lyapunov doubling diverges when rho(G) >= 1 (near-zero effective
        # noise), and a single bad coarse point would contaminate the
        # interpolated fine table.  Patch bad points (non-finite or large
        # residual G PS G' - PS + QQ) with the nearest good one first.
        res_s = jnp.max(
            jnp.abs(
                jnp.einsum("cgij,cgjk,cglk->cgil", Gc, PSc, Gc) - PSc + QQ
            ),
            axis=(-1, -2),
        ) / (1.0 + jnp.max(jnp.abs(PSc), axis=(-1, -2)))
        good_s = jnp.isfinite(res_s) & (res_s < 1e-6)
        dist_s = jnp.abs(gi[:, None] - gi[None, :])[None]
        dist_s = jnp.where(good_s[:, None, :], dist_s,
                           jnp.iinfo(jnp.int32).max)
        src_s = jnp.argmin(dist_s, axis=-1)  # (C, Gc)
        PSc = jnp.take_along_axis(PSc, src_s[..., None, None], axis=1)
        Gc = jnp.take_along_axis(Gc, src_s[..., None, None], axis=1)
        any_good_s = jnp.any(good_s, axis=1)[:, None, None, None]
        PSc = jnp.where(any_good_s, PSc, Pinf[:, None])
        Gc = jnp.where(any_good_s, Gc, 0.0)
        # interpolate the DERIVED smoother tables to the fine grid (:188-190)
        Gn = jnp.einsum("gk,ckij->cgij", Wint, Gc)
        PS = jnp.einsum("gk,ckij->cgij", Wint, PSc)
        PS = 0.5 * (PS + jnp.swapaxes(PS, -1, -2))
        hPSh = jnp.einsum("ci,cgij,cj->cg", H, PS, H)
        return Gn, hPSh

    # Mean path ALWAYS uses the reference-quirk gain tables (the tuned
    # damping schedules are calibrated to them and the corrected gains
    # destabilized 2/10 music files — see IHGPConfig.pf_correct); the
    # corrected run swaps in only the Joseph-consistent smoothed VARIANCE,
    # which feeds the re-site cavity and the Varft output.
    Gn, hPSh = smoother_tables(jnp.broadcast_to(r_coarse[None, :], sc.shape))
    if cfg.pf_correct:
        # log-space blend toward the Joseph-consistent variance (see
        # IHGPConfig.pf_correct: the fully-corrected variance re-ignites
        # the strong-site feedback loop on some files)
        w = float(cfg.pf_correct)
        _, hPSh_c = smoother_tables(sc)
        hPSh = jnp.exp((1.0 - w) * jnp.log(jnp.maximum(hPSh, 1e-30))
                       + w * jnp.log(jnp.maximum(hPSh_c, 1e-30)))

    # Fully-failed channels (no converged grid point at all): fall back to
    # pure prediction at the prior: Gn = 0, variances = h' Pinf h.
    ok1 = any_good[..., 0]  # (C, 1, 1)
    ok0 = any_good[..., 0, 0]  # (C, 1)
    hPinfh = jnp.einsum("ci,cij,cj->c", H, Pinf, H)[:, None]
    Gn = jnp.where(any_good, Gn, 0.0)
    hPph = jnp.where(ok0, hPph, hPinfh)
    hPSh = jnp.where(ok0, hPSh, hPinfh)
    # Variance sanitizer: cubic interpolation / Lyapunov doubling can yield
    # slightly negative marginal variances near grid edges; the reference
    # takes abs() with a warning (ihgp_ep_modulator_nmf.m:493-496).
    floor = 1e-10
    hPph = jnp.maximum(hPph, floor)
    hPSh = jnp.maximum(hPSh, floor)

    return IHGPTables(
        log_r=jnp.asarray(log_r_fine, dt_),
        Ph=jnp.where(any_good[..., 0], Ph, 0.0),
        Gn=Gn,
        hPph=hPph,
        hPSh=hPSh,
    )


def _lookup_idx(tables: IHGPTables, ttau: jax.Array) -> jax.Array:
    """Grid index for effective noise R = 1/ttau (direct log-space indexing).

    ttau <= 0 maps to the top of the grid (R -> inf: pure prediction), the
    reference's R=inf branch (ihgp_ep_modulator_nmf.m:285-289).
    """
    G = tables.log_r.shape[0]
    lo, hi = tables.log_r[0], tables.log_r[-1]
    logR = -jnp.log10(jnp.maximum(ttau, 1e-300))
    logR = jnp.where(ttau > 0.0, logR, hi)
    x = (logR - lo) / (hi - lo) * (G - 1)
    # Nearest neighbor in LINEAR r exactly as the reference's
    # min(abs(r - R)) (ihgp_ep_modulator_nmf.m:237): on the log-uniform grid
    # the linear midpoint between r_i and r_{i+1} = rho*r_i sits at constant
    # fractional index log10((1+rho)/2)/log10(rho) above i.
    step = (hi - lo) / (G - 1)
    rho = 10.0**step
    shift = jnp.log10((1.0 + rho) / 2.0) / step
    idx = jnp.floor(x - shift).astype(jnp.int32) + 1
    return jnp.clip(idx, 0, G - 1)


def _steady_filter_seq(
    ssm: BlockSSM,
    tables: IHGPTables,
    y: jax.Array,
    mask: jax.Array,
    sites: Sites,
    mom_fn,
    damp: float,
    match_mask: jax.Array,  # (T,) bool: re-match sites at these steps
    unroll: int = 1,
):
    """Sequential steady filter with interleaved ADF matching.

    Ref ihgp_ep_modulator_nmf.m:233-310.  The moment match uses the steady
    *predictive* marginal h'Ph from the lookup at the previous step's site
    (the reference's R(n, k-1) convention).  ``match_mask`` is all-True on
    the first (ADF) sweep and last-step-only on later sweeps, mirroring the
    reference's ``itt == 1 || k == numel(yall)`` branch (:251).
    """
    C, bs = ssm.A.shape[0], ssm.A.shape[-1]
    dt_ = ssm.A.dtype
    car = jnp.arange(C)
    hPinfh = jnp.einsum("ci,cij,cj->c", ssm.H, ssm.Pinf, ssm.H)
    Pinfh = jnp.einsum("cij,cj->ci", ssm.Pinf, ssm.H)  # (C, bs)

    def step(carry, inp):
        m, ttau_prev, first = carry
        y_k, obs_k, mm_k, ttau_k, tnu_k = inp
        # Predictive marginal via lookup at the previous step's sites; the
        # FIRST step uses Pinf directly, not a table entry
        # (ihgp_ep_modulator_nmf.m:243-244 `else PP = Pinf`).
        idx_prev = _lookup_idx(tables, ttau_prev)
        varp = jnp.where(first, hPinfh, tables.hPph[car, idx_prev])
        fmu = jnp.einsum("ci,cij,cj->c", ssm.H, ssm.A, m)

        def do_match():
            lZk, dlZ, d2lZ = mom_fn(y_k, fmu, varp, 1.0)
            denom = 1.0 + d2lZ * varp
            tt = (1.0 - damp) * ttau_k + damp * (-d2lZ / denom)
            tn = (1.0 - damp) * tnu_k + damp * ((dlZ - fmu * d2lZ) / denom)
            return lZk, jnp.maximum(tt, 0.0), tn

        lZk, tt, tn = jax.lax.cond(
            jnp.logical_and(obs_k, mm_k),
            do_match,
            lambda: (jnp.zeros((), dt_), ttau_k, tnu_k),
        )

        tt_eff = jnp.where(obs_k, tt, 0.0)
        idx = _lookup_idx(tables, tt_eff)
        # REFERENCE GAIN CONVENTION: K = PP(R_{k-1}) h / (h'PP(R_{k-1})h +
        # R_k) — predictive covariance from the PREVIOUS step's lookup,
        # noise from the CURRENT site (ihgp_ep_modulator_nmf.m:296).  In
        # z-form the mean update m <- A m + K (ys - fmu) becomes
        #   m <- A m + Ph_prev (tnu - ttau fmu) / (ttau hPh_prev + 1),
        # exact at ttau -> 0 except the reference's hard pure-prediction
        # branch (ttau == 0 ignores tnu), handled by the where().
        Ph_prev = jnp.where(first, Pinfh, tables.Ph[car, idx_prev])
        z = tt_eff * varp + 1.0
        gain = jnp.where(tt_eff > 0.0, (tn - tt_eff * fmu) / z, 0.0)
        m = jnp.einsum("cij,cj->ci", ssm.A, m) + Ph_prev * gain[:, None]
        # Flattened emission: stacking (T, C, bs) directly costs a 40x TPU
        # tile-padding blowup (see kalman.PackedTrajectory).
        return (m, tt, jnp.zeros_like(first)), (m.reshape(-1), idx, lZk, tt, tn)

    m0 = jnp.zeros((C, bs), dt_)
    tt0 = jnp.zeros((C,), dt_)
    (_, _, _), (ms, idxs, lZ, ttau, tnu) = jax.lax.scan(
        step, (m0, tt0, jnp.asarray(True)),
        (y, mask, match_mask, sites.ttau, sites.tnu),
        unroll=unroll,
    )
    return ms, idxs, lZ, Sites(ttau, tnu)


def _steady_filter_parallel(ssm, tables, y, mask, sites: Sites):
    """Parallel-in-time steady filter with FIXED sites (affine scan).

    Memory note: gathers per-step (T, C, bs, bs) transition tensors, whose
    TPU tile padding is ~32x — use only for T <~ 16k (IHGPConfig.parallel).
    Returns FLATTENED means (T, C*bs) plus the (T, C) grid indices.
    """
    C, bs = ssm.A.shape[0], ssm.A.shape[-1]
    T = mask.shape[0]
    car = jnp.arange(C)
    tt_eff = jnp.where(mask[:, None], sites.ttau, 0.0)
    idx = _lookup_idx(tables, tt_eff)  # (T, C)
    # Reference gain convention (see _steady_filter_seq): gain column from
    # the PREVIOUS step's lookup, noise from the CURRENT site.  With fixed
    # sites idx_{k-1} is known for every k up front, so the recursion stays
    # an affine scan: m_k = (A - K_k h'A) m_{k-1} + K_k ys_k.
    hPinfh = jnp.einsum("ci,cij,cj->c", ssm.H, ssm.Pinf, ssm.H)
    Pinfh = jnp.einsum("cij,cj->ci", ssm.Pinf, ssm.H)
    Ph_prev = jnp.concatenate(
        [Pinfh[None], tables.Ph[car, idx[:-1]]], axis=0
    )  # (T, C, bs)
    hPh_prev = jnp.concatenate(
        [hPinfh[None], tables.hPph[car, idx[:-1]]], axis=0
    )  # (T, C)
    z = tt_eff * hPh_prev + 1.0
    K = Ph_prev * (tt_eff / z)[..., None]  # (T, C, bs)
    on = tt_eff[..., None] > 0.0
    inv_tt = jnp.where(tt_eff > 0.0, 1.0 / jnp.maximum(tt_eff, 1e-30), 0.0)
    c = jnp.where(on, K * (sites.tnu * inv_tt)[..., None], 0.0)
    # M_k = (I - K_k h') A, pure prediction (M = A) when the site is off
    KH = K[..., :, None] * ssm.H[None, :, None, :]  # (T, C, bs, bs)
    M = jnp.einsum("tcij,cjk->tcik", jnp.eye(bs, dtype=ssm.A.dtype) - KH, ssm.A)
    M = jnp.where(on[..., None], M, ssm.A[None])

    def combine(a, b):
        Ma, ca = a
        Mb, cb = b
        return Mb @ Ma, jnp.einsum("...ij,...j->...i", Mb, ca) + cb

    _, ms = jax.lax.associative_scan(combine, (M, c), axis=0)
    return ms.reshape(T, -1), idx


def _steady_elems(ssm, tables, sites: Sites, mask):
    """Per-step affine filter elements (idx, and gather inputs) for the
    fixed-site steady recursion  m_k = M_k m_{k-1} + c_k  with
    M_k = (I - K_k h') A,  c_k = K_k ys_k, under the reference gain
    convention (gain column from the previous step's lookup, noise from the
    current site — see _steady_filter_seq).  Returns per-step small arrays
    only ((T, C) scalars + (T, C) int indices); the (bs,)-sized gathers
    happen inside the scans so no (T, C, bs, bs) tensor is materialized.
    """
    C = ssm.A.shape[0]
    car = jnp.arange(C)
    tt_eff = jnp.where(mask[:, None], sites.ttau, 0.0)
    idx = _lookup_idx(tables, tt_eff)  # (T, C) current-site index
    hPinfh = jnp.einsum("ci,cij,cj->c", ssm.H, ssm.Pinf, ssm.H)
    hPh_prev = jnp.concatenate(
        [hPinfh[None], tables.hPph[car, idx[:-1]]], axis=0
    )  # (T, C)
    z = tt_eff * hPh_prev + 1.0
    gain_c = jnp.where(tt_eff > 0.0, sites.tnu / z, 0.0)  # c = Ph_prev * .
    gain_K = tt_eff / z  # K = Ph_prev * .
    return idx, gain_K, gain_c


def _steady_filter_blocked(ssm, tables, y, mask, sites: Sites, chunk: int):
    """Blocked two-level parallel steady filter with FIXED sites.

    Same three-pass structure as ops.bscan (pass 1 composes each chunk's
    total affine map, pass 2 prefixes chunk totals, pass 3 re-walks and
    emits), but with the much simpler IHGP affine elements (M, c) — the
    covariance never propagates.  Sequential depth 2L + T/L instead of T;
    peak per-step tensor is (nc, C, bs, bs), transient inside the scan.
    """
    C, bs = ssm.H.shape
    dt_ = ssm.A.dtype
    T = mask.shape[0]
    L = int(chunk)
    idx, gain_K, gain_c = _steady_elems(ssm, tables, sites, mask)
    Pinfh = jnp.einsum("cij,cj->ci", ssm.Pinf, ssm.H)
    HA = jnp.einsum("ci,cij->cj", ssm.H, ssm.A)

    pad = (-T) % L
    if pad:
        pz = lambda x: jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0
        )
        idx, gain_K, gain_c = pz(idx), pz(gain_K), pz(gain_c)
    Tp = idx.shape[0]
    nc = Tp // L
    shp = lambda x: jnp.swapaxes(x.reshape(nc, L, C), 0, 1)  # (L, nc, C)
    idx_s, K_s, c_s = shp(idx), shp(gain_K), shp(gain_c)
    # previous-step index rows, shifted across the whole sequence
    idx_prev = jnp.concatenate([idx[:1], idx[:-1]], axis=0)
    idxp_s = shp(idx_prev)
    first_chunk = (jnp.arange(nc) == 0)[:, None, None]
    car = jnp.arange(C)

    def elem(i, idxp_r, K_r, c_r):
        # Ph from the previous step's lookup; global step 0 uses Pinf.
        is_first = first_chunk & (i == 0)
        Ph = jnp.where(is_first, Pinfh[None], tables.Ph[car, idxp_r])
        K = Ph * K_r[..., None]  # (nc, C, bs)
        M = ssm.A[None] - K[..., :, None] * HA[None, :, None, :]
        c = Ph * c_r[..., None]
        return M, c

    def combine(a, b):  # b after a
        Ma, ca = a
        Mb, cb = b
        return Mb @ Ma, jnp.einsum("...ij,...j->...i", Mb, ca) + cb

    ident = (
        jnp.broadcast_to(jnp.eye(bs, dtype=dt_), (nc, C, bs, bs)),
        jnp.zeros((nc, C, bs), dt_),
    )

    def pass1(carry, inp):
        i, idxp_r, K_r, c_r = inp
        return combine(carry, elem(i, idxp_r, K_r, c_r)), None

    steps = (jnp.arange(L), idxp_s, K_s, c_s)
    totals, _ = jax.lax.scan(pass1, ident, steps)

    inc = jax.lax.associative_scan(combine, totals, axis=0)
    ident1 = (
        jnp.broadcast_to(jnp.eye(bs, dtype=dt_), (1, C, bs, bs)),
        jnp.zeros((1, C, bs), dt_),
    )
    prefix = jax.tree.map(
        lambda a, i: jnp.concatenate([i, a[:-1]], axis=0), inc, ident1
    )

    def pass3(carry, inp):
        i, idxp_r, K_r, c_r = inp
        new = combine(carry, elem(i, idxp_r, K_r, c_r))
        return new, new[1].reshape(nc, -1)

    _, ms = jax.lax.scan(pass3, prefix, steps)
    ms = jnp.swapaxes(ms, 0, 1).reshape(nc * L, -1)[:T]
    return ms, idx[:T]


def _steady_smoother_blocked(ssm, tables, ms, idx, chunk: int):
    """Blocked two-level steady smoother: ms_k = G_k ms_{k+1} + c_k.

    Reverse analogue of _steady_filter_blocked; gathers the (C, bs, bs)
    smoother gain per step INSIDE the scans.
    """
    C, bs = ssm.H.shape
    dt_ = ssm.A.dtype
    T = ms.shape[0]
    L = int(chunk)
    pad = (-T) % L
    if pad:  # pad at the FRONT so the global last step stays last
        ms_p = jnp.concatenate([jnp.zeros((pad, ms.shape[1]), dt_), ms], 0)
        idx_p = jnp.concatenate([idx[:1].repeat(pad, 0), idx], 0)
    else:
        ms_p, idx_p = ms, idx
    Tp = ms_p.shape[0]
    nc = Tp // L
    ms_s = jnp.swapaxes(ms_p.reshape(nc, L, -1), 0, 1)  # (L, nc, C*bs)
    idx_s = jnp.swapaxes(idx_p.reshape(nc, L, C), 0, 1)
    last_chunk = (jnp.arange(nc) == nc - 1)[:, None, None]
    car = jnp.arange(C)

    def elem(i, idx_r, ms_r):
        mf = ms_r.reshape(nc, C, bs)
        G = tables.Gn[car, idx_r]  # (nc, C, bs, bs)
        c = mf - jnp.einsum("ncij,cjk,nck->nci", G, ssm.A, mf)
        is_last = last_chunk & (i == L - 1)
        G = jnp.where(is_last[..., None], 0.0, G)
        c = jnp.where(is_last, mf, c)
        return G, c

    def combine(later, earlier):
        Ga, ca = later
        Gb, cb = earlier
        return Gb @ Ga, jnp.einsum("...ij,...j->...i", Gb, ca) + cb

    ident = (
        jnp.broadcast_to(jnp.eye(bs, dtype=dt_), (nc, C, bs, bs)),
        jnp.zeros((nc, C, bs), dt_),
    )
    steps = (jnp.arange(L), idx_s, ms_s)

    def pass1(carry, inp):
        i, idx_r, ms_r = inp
        return combine(carry, elem(i, idx_r, ms_r)), None

    totals, _ = jax.lax.scan(pass1, ident, steps, reverse=True)
    inc = jax.lax.associative_scan(combine, totals, axis=0, reverse=True)
    ident1 = (
        jnp.broadcast_to(jnp.eye(bs, dtype=dt_), (1, C, bs, bs)),
        jnp.zeros((1, C, bs), dt_),
    )
    suffix = jax.tree.map(
        lambda a, i: jnp.concatenate([a[1:], i], axis=0), inc, ident1
    )

    def pass3(carry, inp):
        i, idx_r, ms_r = inp
        new = combine(carry, elem(i, idx_r, ms_r))
        return new, new[1].reshape(nc, -1)

    _, sm = jax.lax.scan(pass3, suffix, steps, reverse=True)
    return jnp.swapaxes(sm, 0, 1).reshape(nc * L, -1)[pad:]


def _steady_smoother(ssm, tables, ms, idx, parallel: bool, unroll: int = 1):
    """Steady RTS smoother on filtered means: ms_k = G (ms_{k+1}) + c_k.

    Ref ihgp_ep_modulator_nmf.m:373-442 (mean recursion only; variances come
    from the PS table).  ``ms`` is FLATTENED (T, C*bs); the sequential path
    gathers the (C, bs, bs) gain per step inside the scan so no (T, C, bs,
    bs) tensor is ever materialized; the parallel path trades that memory
    for O(log T) depth (small-T only).
    """
    C, bs = ssm.H.shape
    T = ms.shape[0]
    car = jnp.arange(C)

    if parallel:
        msd = ms.reshape(T, C, bs)
        G = tables.Gn[car, idx]  # (T, C, bs, bs)
        Am = jnp.einsum("cij,tcj->tci", ssm.A, msd)
        cvec = msd - jnp.einsum("tcij,tcj->tci", G, Am)  # m_f - G A m_f
        Gp = jnp.concatenate([G[:-1], jnp.zeros_like(G[:1])], axis=0)
        cp = jnp.concatenate([cvec[:-1], msd[-1:]], axis=0)

        def combine(later, earlier):
            Ga, ca = later
            Gb, cb = earlier
            return Gb @ Ga, jnp.einsum("...ij,...j->...i", Gb, ca) + cb

        _, sm = jax.lax.associative_scan(combine, (Gp, cp), axis=0, reverse=True)
        return sm.reshape(T, -1)

    def step(m_next, inp):
        ms_k, idx_k = inp
        mf = ms_k.reshape(C, bs)
        G_k = tables.Gn[car, idx_k]  # (C, bs, bs) per-step gather (tiny)
        c_k = mf - jnp.einsum("cij,cjk,ck->ci", G_k, ssm.A, mf)
        m = jnp.einsum("cij,cj->ci", G_k, m_next) + c_k
        return m, m.reshape(-1)

    mT = ms[-1].reshape(C, bs)
    _, sm_rev = jax.lax.scan(step, mT, (ms[:-1], idx[:-1]), reverse=True,
                             unroll=unroll)
    return jnp.concatenate([sm_rev, ms[-1:]], axis=0)


def _resite(mp, params, cfg, y, mask, mu, var, sites: Sites, damp,
            exclude_last: bool = False):
    """Vectorized EP re-matching at the smoothed cavity (all T at once).

    Identical scheme to nsgp_tpu.inference.ep._ep_resite
    (ref ihgp_ep_modulator_nmf.m:397-437).  ``exclude_last`` mirrors the
    reference's backward loop bounds (k = T-1..1; site T is refreshed in the
    next forward pass instead)."""
    if exclude_last:
        mask = mask.at[-1].set(False)
    frac = cfg.ep_fraction
    v_raw = 1.0 / (1.0 / var - frac * sites.ttau)
    ok = (v_raw > 0.0) & mask[:, None]
    v_cav = jnp.where(ok, v_raw, 1.0)
    m_cav = jnp.where(ok, v_raw * (mu / var - frac * sites.tnu), 0.0)
    lZ, dlZ, d2lZ = moments_chunked(
        mp, params.lik, y, m_cav, v_cav, params.W, frac, chunk=cfg.moment_chunk
    )
    lZ = jnp.where(mask, lZ, 0.0)
    denom = 1.0 + d2lZ * v_cav
    tt_p = (1.0 - damp * frac) * sites.ttau + damp * (-d2lZ / denom)
    tn_p = (1.0 - damp * frac) * sites.tnu + damp * ((dlZ - m_cav * d2lZ) / denom)
    ttau = jnp.maximum(jnp.where(ok, tt_p, sites.ttau), 0.0)
    tnu = jnp.where(ok, tn_p, sites.tnu)
    return Sites(ttau, tnu), lZ


@partial(jax.jit, static_argnums=(0, 4))
@f32_matmuls
def ihgp_infer(
    model: GTNMFModel,
    params: GTNMFParams,
    y: jax.Array,
    mask: Optional[jax.Array] = None,
    config: IHGPConfig = IHGPConfig(),
) -> IHGPResult:
    """Infinite-horizon Power-EP posterior inference.

    Equivalent call: ihgp_ep_modulator_nmf(w, t, y, ss, mom, t, ...).
    O(T * C * bs^2) work, O(1) covariance memory (table lookups).
    """
    if mask is None:
        mask = ~jnp.isnan(y)
    y = jnp.nan_to_num(y)
    T = y.shape[0]
    ssm = model.build_ssm(params)
    C = ssm.num_channels
    dt_ = ssm.A.dtype
    tables = build_tables(ssm, config)
    if config.pf_correct:
        # Stability floor for the corrected tables: hPSh tracks the realized
        # R = lik/ttau downward without bound, so a strong-site runaway
        # (ttau up -> cavity variance down -> 1/s2 derivative up -> ttau up)
        # can drive the f32 re-site into blowup (observed on 2/10 music
        # files).  Full EP's true smoothed variances sit 30-60x above lik on
        # those files, so flooring at lik is far below truth yet bounds the
        # feedback.  (The reference quirk's inflated variance regularized
        # this loop by accident.)
        tables = tables._replace(
            hPSh=jnp.maximum(tables.hPSh, jnp.asarray(params.lik, dt_))
        )
    mp = model.moment_params()

    def mom_fn(y_k, fmu, fs2, frac):
        return moments(mp, params.lik, y_k, fmu, fs2, params.W, frac)

    sites = Sites(jnp.zeros((T, C), dt_), jnp.zeros((T, C), dt_))
    nlZ = jnp.zeros((config.ep_itts,), dt_)
    lZ_final = jnp.zeros((T,), dt_)
    car = jnp.arange(C)
    # Block-structured H-projection for FLATTENED means (T, C*bs) -> (T, C)
    # (avoids materializing (T, C, bs); see kalman.observable_marginals).
    bs = ssm.A.shape[-1]
    Hm = (ssm.H[:, :, None] * jnp.eye(C, dtype=dt_)[:, None, :]).reshape(C * bs, C)

    maxdiff = jnp.full((config.ep_itts,), jnp.inf, dt_)
    mu = var = None
    all_steps = jnp.ones((T,), bool)
    last_only = jnp.zeros((T,), bool).at[-1].set(True)
    seq = not config.parallel
    lZ_last = jnp.zeros((), dt_)
    for itt in range(config.ep_itts):
        damp = config.damp(itt)
        if itt == 0:
            ms, idx, lZ, sites = _steady_filter_seq(
                ssm, tables, y, mask, sites, mom_fn, damp, all_steps,
                unroll=config.unroll,
            )
            nlZ = nlZ.at[0].set(-jnp.sum(lZ))
            lZ_final = lZ
            lZ_last = lZ[-1]
        elif config.parallel:
            if config.chunk:
                ms, idx = _steady_filter_blocked(
                    ssm, tables, y, mask, sites, config.chunk
                )
            else:
                ms, idx = _steady_filter_parallel(ssm, tables, y, mask, sites)
        else:
            # Later forward passes still re-match the site at the very last
            # step (ref ihgp_ep_modulator_nmf.m:251).
            ms, idx, lZ_fwd, sites = _steady_filter_seq(
                ssm, tables, y, mask, sites, mom_fn, damp, last_only,
                unroll=config.unroll,
            )
            lZ_last = lZ_fwd[-1]
        if config.parallel and config.chunk:
            sm = _steady_smoother_blocked(ssm, tables, ms, idx, config.chunk)
        else:
            sm = _steady_smoother(ssm, tables, ms, idx,
                                  parallel=config.parallel,
                                  unroll=config.unroll)

        mu_new = sm @ Hm
        var_new = tables.hPSh[car, idx]  # (T, C) steady smoothed variances
        if itt > 0:
            md = jnp.maximum(
                jnp.max(jnp.abs(mu_new - mu)), jnp.max(jnp.abs(var_new - var))
            )
            maxdiff = maxdiff.at[itt].set(md)
        mu, var = mu_new, var_new

        if itt < config.ep_itts - 1:
            sites, lZ = _resite(mp, params, config, y, mask, mu, var, sites,
                                config.damp(itt + 1), exclude_last=seq)
            if seq:
                lZ = lZ.at[-1].set(lZ_last)
            nlZ = nlZ.at[itt + 1].set(-jnp.sum(lZ))
            lZ_final = lZ
            score = nlZ[itt + 1]
        elif config.keep_best:
            # score the final sweep's posterior the same way (a moments
            # evaluation at its smoothed cavities; sites discarded)
            _, lZ_eval = _resite(mp, params, config, y, mask, mu, var,
                                 sites, 0.0, exclude_last=seq)
            score = -jnp.sum(lZ_eval)
        if config.keep_best:
            if itt == 0:
                best = (score, mu, var)
            else:
                better = score < best[0]
                best = (jnp.where(better, score, best[0]),
                        jnp.where(better, mu, best[1]),
                        jnp.where(better, var, best[2]))

    if config.keep_best:
        mu, var = best[1], best[2]
    if seq and config.ep_itts > 1:
        lZ_final = lZ_final.at[-1].set(lZ_last)

    return IHGPResult(Eft=mu, Varft=var, lZ=lZ_final, sites=sites, nlZ=nlZ,
                      maxdiff=maxdiff)


@partial(jax.jit, static_argnums=(0, 4))
@f32_matmuls
def ihgp_energy(
    model: GTNMFModel,
    params: GTNMFParams,
    y: jax.Array,
    mask: Optional[jax.Array] = None,
    config: IHGPConfig = IHGPConfig(),
) -> jax.Array:
    """ADF single-sweep negative log marginal likelihood.

    Ref ihgp_ep_modulator_nmf.m:533-624 (energy mode is one ADF sweep).
    Differentiable w.r.t. params through the DARE doubling iterations.
    """
    if mask is None:
        mask = ~jnp.isnan(y)
    y = jnp.nan_to_num(y)
    T = y.shape[0]
    ssm = model.build_ssm(params)
    tables = build_tables(ssm, config)
    mp = model.moment_params()

    def mom_fn(y_k, fmu, fs2, frac):
        return moments(mp, params.lik, y_k, fmu, fs2, params.W, frac)

    sites = Sites(
        jnp.zeros((T, ssm.num_channels), ssm.A.dtype),
        jnp.zeros((T, ssm.num_channels), ssm.A.dtype),
    )
    _, _, lZ, _ = _steady_filter_seq(
        ssm, tables, y, mask, sites, mom_fn, config.damp(0),
        jnp.ones((T,), bool), unroll=config.unroll,
    )
    return -jnp.sum(lZ)
