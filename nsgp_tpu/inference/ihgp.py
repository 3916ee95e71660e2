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
    grid_lo: float = -2.0  # log10 of smallest effective noise (ref :112)
    grid_hi: float = 4.0
    grid_coarse: int = 32
    grid_fine: int = 200
    unroll: int = 8  # lax.scan unroll for the sequential steady passes
    parallel: bool = False  # affine associative scans for sweeps >= 2.
    # Default off: the parallel path gathers per-step (T, C, bs, bs) gain
    # tensors whose TPU tile padding is 32x (OOM at T ~ 100k on one chip),
    # and the sequential scan is faster on one chip for these block sizes
    # anyway.  Use True only for T <~ 16k or sharded-time experiments.

    def damp(self, itt: int) -> float:
        if len(self.damping) == 0:
            return 0.5
        return self.damping[min(itt, len(self.damping) - 1)]


class IHGPTables(NamedTuple):
    """Per-(channel, grid) steady-state quantities.  G = grid_fine points."""

    log_r: jax.Array  # (G,) log10 effective noise grid
    K: jax.Array  # (C, G, bs) steady Kalman gain
    M: jax.Array  # (C, G, bs, bs) filtered-mean transition (I - K h) A
    Gn: jax.Array  # (C, G, bs, bs) steady smoother gain Pf A' Pp^{-1}
    hPph: jax.Array  # (C, G) steady predictive marginal variance h' Ppred h
    hPfh: jax.Array  # (C, G) steady filtered marginal variance
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

    # Cubic upsample of vec(P) over the log-noise grid: (C, G, bs, bs)
    P_pred = jnp.einsum("gk,ckij->cgij", Wint, P_coarse)
    P_pred = 0.5 * (P_pred + jnp.swapaxes(P_pred, -1, -2))

    # Derived tables per fine grid point --------------------------------
    Ph = jnp.einsum("cgij,cj->cgi", P_pred, H)  # (C, G, bs) P h
    hPph = jnp.einsum("cgi,ci->cg", Ph, H)  # (C, G)
    s = hPph + r_fine[None, :]  # innovation variance
    K = Ph / s[..., None]  # (C, G, bs)
    # filtered covariance Pf = P - K s K'
    Pf = P_pred - s[..., None, None] * K[..., :, None] * K[..., None, :]
    hPfh = jnp.einsum("ci,cgij,cj->cg", H, Pf, H)
    # M = (I - K h) A
    KH = K[..., :, None] * H[:, None, None, :]  # (C, G, bs, bs)
    I = jnp.eye(bs, dtype=dt_)
    M = jnp.einsum("cgij,cjk->cgik", I - KH, A)
    # smoother gain G = Pf A' Pp^{-1}; Pp = A Pf A' + Q == P_pred (steady)
    PfA = jnp.einsum("cgij,ckj->cgik", Pf, A)  # Pf A'
    Gn = jnp.swapaxes(
        jnp.linalg.solve(
            jnp.swapaxes(P_pred + ssm.pad_eye[:, None], -1, -2),
            jnp.swapaxes(PfA, -1, -2),
        ),
        -1,
        -2,
    )
    # steady smoothed covariance: PS = G PS G' + QQ, QQ = Pf - G Pp G'
    QQ = Pf - jnp.einsum("cgij,cgjk,cglk->cgil", Gn, P_pred, Gn)
    QQ = 0.5 * (QQ + jnp.swapaxes(QQ, -1, -2))
    PS = jax.vmap(jax.vmap(dare_mod.dlyap_doubling))(Gn, QQ)
    hPSh = jnp.einsum("ci,cgij,cj->cg", H, PS, H)

    # Fully-failed channels (no converged grid point at all): the derived
    # quantities above are meaningless (e.g. rho(Gn) >= 1 makes the Lyapunov
    # solve diverge), so fall back to pure prediction at the prior: K = 0,
    # M = A, Gn = 0, all marginal variances = h' Pinf h.
    ok1 = any_good[..., 0]  # (C, 1, 1)
    ok0 = any_good[..., 0, 0]  # (C, 1)
    hPinfh = jnp.einsum("ci,cij,cj->c", H, Pinf, H)[:, None]
    K = jnp.where(ok1, K, 0.0)
    M = jnp.where(any_good, M, A[:, None])
    Gn = jnp.where(any_good, Gn, 0.0)
    hPph = jnp.where(ok0, hPph, hPinfh)
    hPfh = jnp.where(ok0, hPfh, hPinfh)
    hPSh = jnp.where(ok0, hPSh, hPinfh)
    # Variance sanitizer: the cubic interpolation / Lyapunov doubling can
    # produce slightly negative marginal variances near grid edges; the
    # reference takes abs() with a warning (ihgp_ep_modulator_nmf.m:493-496).
    floor = 1e-10
    hPph = jnp.maximum(hPph, floor)
    hPfh = jnp.maximum(hPfh, floor)
    hPSh = jnp.maximum(hPSh, floor)

    return IHGPTables(
        log_r=jnp.asarray(log_r_fine, dt_),
        K=K,
        M=M,
        Gn=Gn,
        hPph=hPph,
        hPfh=hPfh,
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
    return jnp.clip(jnp.round(x).astype(jnp.int32), 0, G - 1)


def _steady_filter_seq(
    ssm: BlockSSM,
    tables: IHGPTables,
    y: jax.Array,
    mask: jax.Array,
    sites: Sites,
    mom_fn,
    damp: float,
    adf: bool,
    unroll: int = 1,
):
    """Sequential steady filter with (optionally) interleaved ADF matching.

    Ref ihgp_ep_modulator_nmf.m:233-310.  The moment match uses the steady
    *predictive* marginal h'Ph from the lookup at the previous step's site
    (the reference's R(n, k-1) convention).
    """
    C, bs = ssm.A.shape[0], ssm.A.shape[-1]
    dt_ = ssm.A.dtype
    car = jnp.arange(C)
    hPinfh = jnp.einsum("ci,cij,cj->c", ssm.H, ssm.Pinf, ssm.H)

    def step(carry, inp):
        m, ttau_prev = carry
        y_k, obs_k, ttau_k, tnu_k = inp
        # Predictive marginal via lookup at the previous step's sites.
        idx_prev = _lookup_idx(tables, ttau_prev)
        varp = tables.hPph[car, idx_prev]
        fmu = jnp.einsum("ci,cij,cj->c", ssm.H, ssm.A, m)

        def do_match():
            lZk, dlZ, d2lZ = mom_fn(y_k, fmu, varp, 1.0)
            denom = 1.0 + d2lZ * varp
            tt = (1.0 - damp) * ttau_k + damp * (-d2lZ / denom)
            tn = (1.0 - damp) * tnu_k + damp * ((dlZ - fmu * d2lZ) / denom)
            return lZk, jnp.maximum(tt, 0.0), tn

        if adf:
            lZk, tt, tn = jax.lax.cond(
                obs_k, do_match, lambda: (jnp.zeros((), dt_), ttau_k, tnu_k)
            )
        else:
            lZk, tt, tn = jnp.zeros((), dt_), ttau_k, tnu_k

        tt_eff = jnp.where(obs_k, tt, 0.0)
        idx = _lookup_idx(tables, tt_eff)
        K = tables.K[car, idx]  # (C, bs)
        M = tables.M[car, idx]  # (C, bs, bs)
        # Safe site mean: grad of tn/max(tt, eps) w.r.t. tt underflows to NaN
        # at tt == 0; guard the reciprocal inside the where instead.
        inv_tt = jnp.where(tt_eff > 0.0, 1.0 / jnp.maximum(tt_eff, 1e-30), 0.0)
        Ky = K * (tn * inv_tt)[:, None]
        Mm = jnp.where(
            tt_eff[:, None, None] > 0.0, M, ssm.A
        )  # pure prediction when site off
        m = jnp.einsum("cij,cj->ci", Mm, m) + Ky
        # Flattened emission: stacking (T, C, bs) directly costs a 40x TPU
        # tile-padding blowup (see kalman.PackedTrajectory).
        return (m, tt), (m.reshape(-1), idx, lZk, tt, tn)

    m0 = jnp.zeros((C, bs), dt_)
    tt0 = jnp.zeros((C,), dt_)
    (_, _), (ms, idxs, lZ, ttau, tnu) = jax.lax.scan(
        step, (m0, tt0), (y, mask, sites.ttau, sites.tnu), unroll=unroll
    )
    return ms, idxs, lZ, Sites(ttau, tnu)


def _steady_filter_parallel(ssm, tables, y, mask, sites: Sites):
    """Parallel-in-time steady filter with FIXED sites (affine scan).

    Memory note: gathers per-step (T, C, bs, bs) transition tensors, whose
    TPU tile padding is ~32x — use only for T <~ 16k (IHGPConfig.parallel).
    Returns FLATTENED means (T, C*bs) plus the (T, C) grid indices.
    """
    C = ssm.A.shape[0]
    T = mask.shape[0]
    car = jnp.arange(C)
    tt_eff = jnp.where(mask[:, None], sites.ttau, 0.0)
    idx = _lookup_idx(tables, tt_eff)  # (T, C)
    K = tables.K[car, idx]  # (T, C, bs)
    M = tables.M[car, idx]  # (T, C, bs, bs)
    on = tt_eff[..., None] > 0.0
    inv_tt = jnp.where(tt_eff > 0.0, 1.0 / jnp.maximum(tt_eff, 1e-30), 0.0)
    c = K * (sites.tnu * inv_tt)[..., None]
    M = jnp.where(on[..., None], M, ssm.A[None])

    def combine(a, b):
        Ma, ca = a
        Mb, cb = b
        return Mb @ Ma, jnp.einsum("...ij,...j->...i", Mb, ca) + cb

    _, ms = jax.lax.associative_scan(combine, (M, c), axis=0)
    return ms.reshape(T, -1), idx


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


def _resite(mp, params, cfg, y, mask, mu, var, sites: Sites, damp):
    """Vectorized EP re-matching at the smoothed cavity (all T at once).

    Identical scheme to nsgp_tpu.inference.ep._ep_resite
    (ref ihgp_ep_modulator_nmf.m:397-437)."""
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
    for itt in range(config.ep_itts):
        damp = config.damp(itt)
        if itt == 0:
            ms, idx, lZ, sites = _steady_filter_seq(
                ssm, tables, y, mask, sites, mom_fn, damp, adf=True,
                unroll=config.unroll,
            )
            nlZ = nlZ.at[0].set(-jnp.sum(lZ))
            lZ_final = lZ
        elif config.parallel:
            ms, idx = _steady_filter_parallel(ssm, tables, y, mask, sites)
        else:
            ms, idx, _, sites = _steady_filter_seq(
                ssm, tables, y, mask, sites, mom_fn, damp, adf=False,
                unroll=config.unroll,
            )
        sm = _steady_smoother(ssm, tables, ms, idx, parallel=config.parallel,
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
                                config.damp(itt + 1))
            nlZ = nlZ.at[itt + 1].set(-jnp.sum(lZ))
            lZ_final = lZ

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
        ssm, tables, y, mask, sites, mom_fn, config.damp(0), adf=True,
        unroll=config.unroll,
    )
    return -jnp.sum(lZ)
