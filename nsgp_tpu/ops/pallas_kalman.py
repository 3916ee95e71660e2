"""Fused Pallas TPU kernels for the sequential Kalman filter / RTS smoother.

The XLA lax.scan path pays ~16 us of while-loop/dispatch overhead per step —
at T = 100k that floor (not arithmetic) dominates the EP sweeps.  These
kernels run the whole recursion inside ONE kernel: the (C, bs) state lives
in VMEM scratch across a sequential grid over time blocks, each block
streaming its (B, C) site rows in and its flattened moments out.  Per-step
algebra is fully unrolled over the (static, tiny) block size bs with
(1, C)-shaped VPU ops — a few hundred vector ops per step.

Layout: channel-on-lanes.  Model constants are reshaped to (bs*bs, C) /
(bs, C); trajectories are emitted row-major as (T*bs, C) / (T*bs*bs, C)
(flat rows — see kalman.PackedTrajectory for why (T, C, bs, bs) is fatal).
The ep engine converts to its C-major convention once at the end.

Assumes the stationary discretization Q = Pinf - A Pinf A' (the BlockSSM
default): then one prediction step from (0, Pinf) is exactly (0, Pinf), so
the reference's skip-first-predict quirk needs no special case.

The smoother-gain solve uses an unrolled Cholesky of Pp (+1 on zero-padded
diagonal dims, whose state/covariance are exactly zero throughout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nsgp_tpu.ops.kalman import PackedTrajectory, Sites
from nsgp_tpu.ops.ssm import BlockSSM


def _consts(ssm: BlockSSM):
    """(bs*bs, C) / (bs, C) channel-on-lanes constants from a BlockSSM."""
    C, bs = ssm.H.shape
    to2 = lambda M: jnp.transpose(M, (1, 2, 0)).reshape(bs * bs, C)
    A2 = to2(ssm.A)
    Q2 = to2(ssm.Q)
    Pi2 = to2(ssm.Pinf)
    H2 = jnp.transpose(ssm.H, (1, 0))  # (bs, C)
    pad2 = jnp.transpose(
        jnp.diagonal(ssm.pad_eye, axis1=-2, axis2=-1), (1, 0)
    )  # (bs, C), 1 on padded dims
    return A2, Q2, Pi2, H2, pad2


def _rows(ref, n):
    """Read an (n, C) ref as a list of (1, C) rows."""
    return [ref[i : i + 1, :] for i in range(n)]


def _mat(ref, bs):
    """Read a (bs*bs, C) ref as a bs x bs list-of-lists of (1, C) rows."""
    return [[ref[i * bs + j : i * bs + j + 1, :] for j in range(bs)]
            for i in range(bs)]


def _matmul(A, B, bs):  # (A @ B)[i][j] = sum_k A[i][k] B[k][j]
    return [[sum(A[i][k] * B[k][j] for k in range(bs)) for j in range(bs)]
            for i in range(bs)]


def _matmul_t(A, B, bs):  # (A @ B')[i][j] = sum_k A[i][k] B[j][k]
    return [[sum(A[i][k] * B[j][k] for k in range(bs)) for j in range(bs)]
            for i in range(bs)]


def _matvec(A, v, bs):
    return [sum(A[i][k] * v[k] for k in range(bs)) for i in range(bs)]


def _chol(M, bs, eps=1e-30):
    """Unrolled Cholesky of a list-of-lists SPD matrix of (1, C) entries."""
    L = [[None] * bs for _ in range(bs)]
    inv_d = [None] * bs
    for j in range(bs):
        s = M[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, eps))
        L[j][j] = d
        inv_d[j] = 1.0 / d
        for i in range(j + 1, bs):
            s = M[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d[j]
    return L, inv_d


def _chol_solve_vec(L, inv_d, b, bs):
    """Solve (L L') x = b for one column of (1, C) entries."""
    y = [None] * bs
    for i in range(bs):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s * inv_d[i]
    x = [None] * bs
    for i in reversed(range(bs)):
        s = y[i]
        for k in range(i + 1, bs):
            s = s - L[k][i] * x[k]
        x[i] = s * inv_d[i]
    return x


def _fwd_kernel(ttau_ref, tnu_ref, A_ref, Q_ref, Pi_ref, H_ref,
                ms_ref, Ps_ref, m_s, P_s, *, bs, B):
    C = ttau_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        m_s[:] = jnp.zeros((bs, C), ms_ref.dtype)
        P_s[:] = Pi_ref[:]

    A = _mat(A_ref, bs)
    Q = _mat(Q_ref, bs)
    H = _rows(H_ref, bs)

    def body(j, _):
        tt = ttau_ref[pl.ds(j, 1), :]
        tn = tnu_ref[pl.ds(j, 1), :]
        m = _rows(m_s, bs)
        P = _mat(P_s, bs)
        # predict (exact no-op at the global first step: m=0, P=Pinf,
        # stationary Q)
        mp = _matvec(A, m, bs)
        AP = _matmul(A, P, bs)
        Pp = _matmul_t(AP, A, bs)
        Pp = [[Pp[i][k] + Q[i][k] for k in range(bs)] for i in range(bs)]
        # measurement marginals
        fmu = sum(H[i] * mp[i] for i in range(bs))
        PH = [sum(Pp[i][k] * H[k] for k in range(bs)) for i in range(bs)]
        HPH = sum(H[i] * PH[i] for i in range(bs))
        # branch-free site update
        z = tt * HPH + 1.0
        v = (tt * fmu - tn) / z
        w = tt / z
        for i in range(bs):
            m_s[i : i + 1, :] = mp[i] - PH[i] * v
        for i in range(bs):
            for k in range(bs):
                P_s[i * bs + k : i * bs + k + 1, :] = Pp[i][k] - w * PH[i] * PH[k]
        for i in range(bs):
            ms_ref[pl.ds(j * bs + i, 1), :] = m_s[i : i + 1, :]
        for i in range(bs * bs):
            Ps_ref[pl.ds(j * bs * bs + i, 1), :] = P_s[i : i + 1, :]
        return 0

    jax.lax.fori_loop(0, B, body, 0)


def _bwd_kernel(ms_ref, Ps_ref, A_ref, Q_ref, H_ref, pad_ref,
                sm_ref, sP_ref, mn_s, Pn_s, *, bs, B):
    C = ms_ref.shape[1] // bs
    A = _mat(A_ref, bs)
    Q = _mat(Q_ref, bs)
    pad = _rows(pad_ref, bs)

    def load_step(j):
        m = [ms_ref[pl.ds(j * bs + i, 1), :] for i in range(bs)]
        P = [[Ps_ref[pl.ds(j * bs * bs + i * bs + k, 1), :]
              for k in range(bs)] for i in range(bs)]
        return m, P

    @pl.when(pl.program_id(0) == 0)
    def _():
        # Initialize the carry so that the (global) last step's smoothed
        # moments equal its filtered ones: m_next = A m_L, P_next = Pp_{L+1}.
        m, P = load_step(B - 1)
        mp = _matvec(A, m, bs)
        AP = _matmul(A, P, bs)
        Pp = _matmul_t(AP, A, bs)
        for i in range(bs):
            mn_s[i : i + 1, :] = mp[i]
            for k in range(bs):
                Pn_s[i * bs + k : i * bs + k + 1, :] = Pp[i][k] + Q[i][k]

    def body(jj, _):
        j = B - 1 - jj
        m, P = load_step(j)
        mp_next = _rows(mn_s, bs)  # smoothed m_{k+1}
        Pn = _mat(Pn_s, bs)  # smoothed P_{k+1}
        AP = _matmul(A, P, bs)  # A P_k (= (P_k A')')
        Pp = _matmul_t(AP, A, bs)
        Pp = [[Pp[i][k] + Q[i][k] for k in range(bs)] for i in range(bs)]
        # G = P_k A' Pp^{-1}: solve (Pp + pad) G' = A P_k column-wise
        M = [[Pp[i][k] + (pad[i] if i == k else 0.0) for k in range(bs)]
             for i in range(bs)]
        L, inv_d = _chol(M, bs)
        # G' = Pp^{-1} (A P) (P symmetric), so solving column l of A P gives
        # (G')[:, l] = G[l, :] — i.e. row l of G.
        G = [None] * bs
        for l in range(bs):
            col = [AP[i][l] for i in range(bs)]  # column l of A P_k
            G[l] = _chol_solve_vec(L, inv_d, col, bs)
        Am = _matvec(A, m, bs)
        dm = [mp_next[i] - Am[i] for i in range(bs)]
        m_sm = [m[i] + sum(G[i][k] * dm[k] for k in range(bs)) for i in range(bs)]
        dP = [[Pn[i][k] - Pp[i][k] for k in range(bs)] for i in range(bs)]
        GdP = _matmul(G, dP, bs)
        GdPG = _matmul_t(GdP, G, bs)
        P_sm = [[P[i][k] + GdPG[i][k] for k in range(bs)] for i in range(bs)]
        for i in range(bs):
            mn_s[i : i + 1, :] = m_sm[i]
            for k in range(bs):
                Pn_s[i * bs + k : i * bs + k + 1, :] = P_sm[i][k]
        for i in range(bs):
            sm_ref[pl.ds(j * bs + i, 1), :] = mn_s[i : i + 1, :]
        for i in range(bs * bs):
            sP_ref[pl.ds(j * bs * bs + i, 1), :] = Pn_s[i : i + 1, :]
        return 0

    jax.lax.fori_loop(0, B, body, 0)


_LOG2PI = 1.8378770664093453
_ZFLOOR = 1e-10  # ref likModulatorNMFPower.m:28,55 floor on Z


def _adf_kernel(y_ref, obs_ref, ttau_ref, tnu_ref, A_ref, Q_ref, Pi_ref,
                H_ref, W_ref, xi_ref, wn_ref, sn2_ref,
                ms_ref, Ps_ref, lZ_ref, tto_ref, tno_ref, m_s, P_s,
                *, bs, B, D, N, damp, link, variant, z_floor=_ZFLOOR):
    """Forward filter with interleaved ADF moment matching (EP sweep 1).

    Per step: predict -> cubature moment match at the predicted marginal
    (analytic z-integral + sigma points over the N modulators, max-shifted
    accumulation; see ops/moments.py) -> damped site update -> branch-free
    measurement update.  Everything stays in VMEM.
    """
    C = ttau_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        m_s[:] = jnp.zeros((bs, C), ms_ref.dtype)
        P_s[:] = Pi_ref[:]

    A = _mat(A_ref, bs)
    Q = _mat(Q_ref, bs)
    H = _rows(H_ref, bs)
    Wt = W_ref[:]  # (N, D)
    xi = xi_ref[:]  # (S, N)
    wn = wn_ref[:]  # (S, 1)
    sn2 = sn2_ref[0, 0]

    def body(j, _):
        tt = ttau_ref[pl.ds(j, 1), :]
        tn = tnu_ref[pl.ds(j, 1), :]
        y_k = y_ref[pl.ds(j, 1), :]  # (1, 1)
        obs = obs_ref[pl.ds(j, 1), :]  # (1, 1) 0/1
        m = _rows(m_s, bs)
        P = _mat(P_s, bs)
        mp = _matvec(A, m, bs)
        AP = _matmul(A, P, bs)
        Pp = _matmul_t(AP, A, bs)
        Pp = [[Pp[i][k] + Q[i][k] for k in range(bs)] for i in range(bs)]
        fmu = sum(H[i] * mp[i] for i in range(bs))  # (1, C)
        PH = [sum(Pp[i][k] * H[k] for k in range(bs)) for i in range(bs)]
        HPH = sum(H[i] * PH[i] for i in range(bs))  # (1, C)

        # ---- cubature moments at the predicted marginal ------------------
        mu_z, mu_g = fmu[:, :D], fmu[:, D:]
        s2_z, s2_g = HPH[:, :D], HPH[:, D:]
        xn = mu_g + jnp.sqrt(jnp.maximum(s2_g, 0.0)) * xi  # (S, N)
        lk = jax.nn.softplus(xn) if link == "softplus" else jnp.exp(xn)
        a = jnp.zeros((xi.shape[0], D), fmu.dtype)
        for n in range(N):
            a = a + lk[:, n : n + 1] * Wt[n : n + 1, :]
        if variant == "sq":
            a = jnp.sqrt(jnp.maximum(a, 1e-12))
        s2e = sn2 + jnp.sum(a * a * s2_z, axis=1, keepdims=True)  # (S, 1)
        mean = jnp.sum(a * mu_z, axis=1, keepdims=True)
        resid = y_k[0, 0] - mean
        log_norm = -0.5 * (resid * resid / s2e + jnp.log(s2e) + _LOG2PI)
        lmax = jnp.max(log_norm)
        lmax = jnp.where(jnp.isfinite(lmax), lmax, 0.0)
        norm = jnp.exp(log_norm - lmax)  # (S, 1)
        # RAW-scale floor on Z exactly as the reference and ops/moments.py
        # (likModulatorNMFPower.m:55 `Z = max(Z, 1e-10)`): when the
        # observation is very unlikely under the prediction (onsets), the
        # floored Z also divides the derivatives, shrinking them toward 0
        # so the site update is gently rejected.  Flooring the SHIFTED sum
        # instead (the round-3 version) divides by a tiny Z and produced
        # huge wrong-curvature modulator sites at onsets -> NaN by sweep 6
        # on speech6_female.
        Z0r = jnp.sum(wn * norm)
        Z0 = jnp.maximum(Z0r, jnp.finfo(norm.dtype).tiny)
        lZ_raw = lmax + jnp.log(Z0)
        lZk = jnp.maximum(lZ_raw, jnp.log(jnp.asarray(z_floor, norm.dtype)))
        Zi = jnp.exp(lZ_raw - lZk) / Z0
        rs = resid / s2e
        wns = wn * norm
        dlZ_z = Zi * jnp.sum(wns * rs * a, axis=0, keepdims=True)  # (1, D)
        dmu_g = (xn - mu_g) / s2_g
        dlZ_g = Zi * jnp.sum(wns * dmu_g, axis=0, keepdims=True)  # (1, N)
        d2_z = Zi * jnp.sum(wns * (a * a) * (rs * rs - 1.0 / s2e), axis=0,
                            keepdims=True) - dlZ_z * dlZ_z
        d2_g = Zi * jnp.sum(wns * (dmu_g * dmu_g - 1.0 / s2_g), axis=0,
                            keepdims=True) - dlZ_g * dlZ_g
        dlZ = jnp.concatenate([dlZ_z, dlZ_g], axis=1)  # (1, C)
        d2lZ = jnp.concatenate([d2_z, d2_g], axis=1)

        # ---- damped ADF site update (moment_match, frac = 1) --------------
        denom = 1.0 + d2lZ * HPH
        tt_new = (1.0 - damp) * tt + damp * (-d2lZ / denom)
        tn_new = (1.0 - damp) * tn + damp * ((dlZ - fmu * d2lZ) / denom)
        tt_new = jnp.maximum(tt_new, 0.0)
        # unobserved steps keep their (clamped) incoming sites and lZ = 0
        tt_new = jnp.where(obs > 0, tt_new, jnp.maximum(tt, 0.0))
        tn_new = jnp.where(obs > 0, tn_new, tn)
        lZk = jnp.where(obs[0, 0] > 0, lZk, 0.0)
        tt_eff = jnp.where(obs > 0, tt_new, 0.0)
        tn_eff = jnp.where(obs > 0, tn_new, 0.0)

        z = tt_eff * HPH + 1.0
        v = (tt_eff * fmu - tn_eff) / z
        w = tt_eff / z
        for i in range(bs):
            m_s[i : i + 1, :] = mp[i] - PH[i] * v
        for i in range(bs):
            for k in range(bs):
                P_s[i * bs + k : i * bs + k + 1, :] = Pp[i][k] - w * PH[i] * PH[k]
        for i in range(bs):
            ms_ref[pl.ds(j * bs + i, 1), :] = m_s[i : i + 1, :]
        for i in range(bs * bs):
            Ps_ref[pl.ds(j * bs * bs + i, 1), :] = P_s[i : i + 1, :]
        lZ_ref[pl.ds(j, 1), :] = jnp.full((1, 1), lZk, tt.dtype)
        tto_ref[pl.ds(j, 1), :] = tt_new
        tno_ref[pl.ds(j, 1), :] = tn_new
        return 0

    jax.lax.fori_loop(0, B, body, 0)


def _adf_kernel_mb(y_ref, obs_ref, ttau_ref, tnu_ref, A_ref, Q_ref, Pi_ref,
                   H_ref, Wbd_ref, xi_ref, wn_ref, sn2_ref,
                   selD_ref, exD_ref, exN_ref, exC_ref,
                   ms_ref, Ps_ref, lZ_ref, tto_ref, tno_ref, m_s, P_s,
                   *, bs, B, BF, D, N, S, s_chunk, damp, link, variant,
                   z_floor=_ZFLOOR):
    """Multi-file / chunked-cubature ADF forward sweep (EP sweep 1).

    Generalizes _adf_kernel two ways (one kernel serves both):

    1. **File batching on lanes**: BF signals share the sequential recursion,
       with BF*C channels on the lane axis in z-major layout
       ``[z(file 0, d=0..D-1), ..., z(BF-1) | g(0), ..., g(BF-1)]``.  The
       filter algebra is elementwise over lanes (unchanged); the per-file
       moment reductions over D/N become tiny matmuls with 0/1
       selector (selD: (BF*D, BF)) / expander (exD/exN/exC: (BF, ...))
       matrices.  This fills the VPU lanes the single-file path leaves idle
       (C = 19 of 128) — the structural fix for serial corpus grids.
    2. **Sigma-point chunking**: the S-axis is processed in ``s_chunk`` rows
       at a time with online max-rescaled accumulators (flash-attention
       style), so mixture models with N = 9 cubature (thousands of sigma
       points, ref gf_ep_mods_nmf_mixture.m) never materialize (S, D)
       tensors beyond one chunk in VMEM.  Negative ut7/ut9 weights are fine:
       the running shift tracks max log-density, and every output is a
       shift-invariant ratio (see ops/moments.py).

    Semantics per (file, step) are identical to _adf_kernel / ops.moments
    (raw-scale Z floor, damped clamped sites, branch-free update).
    """
    BC = ttau_ref.shape[1]  # BF * (D + N)
    BD, BN = BF * D, BF * N
    nSc = -(-S // s_chunk)
    dt_ = ttau_ref.dtype
    f32 = jnp.float32 if dt_ == jnp.float32 else dt_

    @pl.when(pl.program_id(0) == 0)
    def _():
        m_s[:] = jnp.zeros((bs, BC), ms_ref.dtype)
        P_s[:] = Pi_ref[:]

    A = _mat(A_ref, bs)
    Q = _mat(Q_ref, bs)
    H = _rows(H_ref, bs)
    Wbd = Wbd_ref[:]  # (BN, BD) block-diagonal stacked W'
    selD = selD_ref[:]  # (BD, BF)
    exD = exD_ref[:]  # (BF, BD)
    exN = exN_ref[:]  # (BF, BN)
    exC = exC_ref[:]  # (BF, BC)
    sn2 = sn2_ref[:]  # (1, BF)
    # In-kernel MXU dots round f32 inputs to bf16 and IGNORE the precision
    # flag (measured: ~4e-3 rel error, enough to corrupt the residual
    # y - mean by catastrophic cancellation as sites converge — batched
    # identical files diverged by sweep 3).  Emulate exact f32 with bf16
    # split passes: 3 one-sided passes are EXACT when the right operand is
    # 0/1 (selectors), 6 two-sided passes give ~f32 (5e-7 vs f64, measured)
    # for the general W matmul.
    _dot = functools.partial(jax.lax.dot, preferred_element_type=f32)

    def _split3(x):
        h = jnp.bfloat16(x).astype(f32)
        m = jnp.bfloat16(x - h).astype(f32)
        return h, m, x - h - m

    def dot_sel(x, sel):  # sel entries exactly bf16-representable (0/1)
        h, m, l = _split3(x)
        return _dot(h, sel) + _dot(m, sel) + _dot(l, sel)

    def dot_f32(x, y):
        xh, xm, xl = _split3(x)
        yh, ym, yl = _split3(y)
        return (_dot(xh, yh) + (_dot(xm, yh) + _dot(xh, ym))
                + (_dot(xl, yh) + _dot(xm, ym) + _dot(xh, yl)))

    if dt_ != jnp.float32:  # f64 interpret path: native dot is exact
        dot_sel = dot_f32 = _dot

    def body(j, _):
        tt = ttau_ref[pl.ds(j, 1), :]
        tn = tnu_ref[pl.ds(j, 1), :]
        y_k = y_ref[pl.ds(j, 1), :]  # (1, BF)
        obs = obs_ref[pl.ds(j, 1), :]  # (1, BF) 0/1
        m = _rows(m_s, bs)
        P = _mat(P_s, bs)
        mp = _matvec(A, m, bs)
        AP = _matmul(A, P, bs)
        Pp = _matmul_t(AP, A, bs)
        Pp = [[Pp[i][k] + Q[i][k] for k in range(bs)] for i in range(bs)]
        fmu = sum(H[i] * mp[i] for i in range(bs))  # (1, BC)
        PH = [sum(Pp[i][k] * H[k] for k in range(bs)) for i in range(bs)]
        HPH = sum(H[i] * PH[i] for i in range(bs))  # (1, BC)

        # ---- cubature moments, chunked over sigma points -----------------
        mu_z, mu_g = fmu[:, :BD], fmu[:, BD:]
        s2_z, s2_g = HPH[:, :BD], HPH[:, BD:]
        sd_g = jnp.sqrt(jnp.maximum(s2_g, 0.0))
        inv_s2g = 1.0 / s2_g

        def chunk_contrib(c, m_shift):
            """Moment sums for sigma rows [c*s_chunk, (c+1)*s_chunk) at
            log-shift m_shift (1, BF).  Returns (Z, A1, A2, G1, G2, mc)."""
            xi_c = xi_ref[pl.ds(c * s_chunk, s_chunk), :]  # (sc, BN)
            wn_c = wn_ref[pl.ds(c * s_chunk, s_chunk), :]  # (sc, 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (s_chunk, 1), 0)
            valid = (c * s_chunk + row) < S
            xn = mu_g + sd_g * xi_c  # (sc, BN)
            lk = jax.nn.softplus(xn) if link == "softplus" else jnp.exp(xn)
            a = dot_f32(lk, Wbd)  # (sc, BD)
            if variant == "sq":
                a = jnp.sqrt(jnp.maximum(a, 1e-12))
            s2e = dot_sel(a * a * s2_z, selD) + sn2  # (sc, BF)
            mean = dot_sel(a * mu_z, selD)
            resid = y_k - mean  # (sc, BF)
            log_norm = -0.5 * (resid * resid / s2e + jnp.log(s2e) + _LOG2PI)
            log_norm = jnp.where(valid, log_norm, -jnp.inf)
            mc = jnp.max(log_norm, axis=0, keepdims=True)  # (1, BF)
            mc = jnp.where(jnp.isfinite(mc), mc, 0.0)
            m_new = jnp.maximum(m_shift, mc)
            norm = jnp.where(valid, jnp.exp(log_norm - m_new), 0.0)
            wns = wn_c * norm  # (sc, BF)
            rs = resid / s2e
            wns_d = dot_sel(wns, exD)  # (sc, BD)
            rs_d = dot_sel(rs, exD)
            inv_s2e_d = dot_sel(1.0 / s2e, exD)
            dmu_g = (xn - mu_g) * inv_s2g  # (sc, BN)
            wns_n = dot_sel(wns, exN)
            Z = jnp.sum(wns, axis=0, keepdims=True)  # (1, BF)
            A1 = jnp.sum(wns_d * rs_d * a, axis=0, keepdims=True)  # (1, BD)
            A2 = jnp.sum(wns_d * (a * a) * (rs_d * rs_d - inv_s2e_d),
                         axis=0, keepdims=True)
            G1 = jnp.sum(wns_n * dmu_g, axis=0, keepdims=True)  # (1, BN)
            G2 = jnp.sum(wns_n * (dmu_g * dmu_g - inv_s2g), axis=0,
                         keepdims=True)
            return Z, A1, A2, G1, G2, m_new

        Z, A1, A2, G1, G2, m_run = chunk_contrib(0, jnp.full((1, BF), -jnp.inf, dt_))
        if nSc > 1:
            def schunk_body(c, acc):
                Z, A1, A2, G1, G2, m_run = acc
                Zc, A1c, A2c, G1c, G2c, m_new = chunk_contrib(c, m_run)
                al = jnp.exp(m_run - m_new)  # (1, BF) rescale of old sums
                al_d = dot_sel(al, exD)
                al_n = dot_sel(al, exN)
                return (Z * al + Zc, A1 * al_d + A1c, A2 * al_d + A2c,
                        G1 * al_n + G1c, G2 * al_n + G2c, m_new)

            Z, A1, A2, G1, G2, m_run = jax.lax.fori_loop(
                1, nSc, schunk_body, (Z, A1, A2, G1, G2, m_run)
            )

        Z0 = jnp.maximum(Z, jnp.finfo(dt_).tiny)
        lZ_raw = m_run + jnp.log(Z0)  # (1, BF)
        lZk = jnp.maximum(lZ_raw, jnp.log(jnp.asarray(z_floor, dt_)))
        Zi = jnp.exp(lZ_raw - lZk) / Z0  # (1, BF)
        Zi_d = dot_sel(Zi, exD)
        Zi_n = dot_sel(Zi, exN)
        dlZ_z = Zi_d * A1  # (1, BD)
        dlZ_g = Zi_n * G1
        d2_z = Zi_d * A2 - dlZ_z * dlZ_z
        d2_g = Zi_n * G2 - dlZ_g * dlZ_g
        dlZ = jnp.concatenate([dlZ_z, dlZ_g], axis=1)  # (1, BC)
        d2lZ = jnp.concatenate([d2_z, d2_g], axis=1)

        # ---- damped ADF site update (per lane; obs broadcast per file) ----
        obs_c = _dot(obs, exC)  # (1, BC): both operands 0/1 -> exact
        denom = 1.0 + d2lZ * HPH
        tt_new = (1.0 - damp) * tt + damp * (-d2lZ / denom)
        tn_new = (1.0 - damp) * tn + damp * ((dlZ - fmu * d2lZ) / denom)
        tt_new = jnp.maximum(tt_new, 0.0)
        tt_new = jnp.where(obs_c > 0, tt_new, jnp.maximum(tt, 0.0))
        tn_new = jnp.where(obs_c > 0, tn_new, tn)
        lZ_out = jnp.where(obs > 0, lZk, 0.0)  # (1, BF)
        tt_eff = jnp.where(obs_c > 0, tt_new, 0.0)
        tn_eff = jnp.where(obs_c > 0, tn_new, 0.0)

        z = tt_eff * HPH + 1.0
        v = (tt_eff * fmu - tn_eff) / z
        w = tt_eff / z
        for i in range(bs):
            m_s[i : i + 1, :] = mp[i] - PH[i] * v
        for i in range(bs):
            for k in range(bs):
                P_s[i * bs + k : i * bs + k + 1, :] = Pp[i][k] - w * PH[i] * PH[k]
        for i in range(bs):
            ms_ref[pl.ds(j * bs + i, 1), :] = m_s[i : i + 1, :]
        for i in range(bs * bs):
            Ps_ref[pl.ds(j * bs * bs + i, 1), :] = P_s[i : i + 1, :]
        lZ_ref[pl.ds(j, 1), :] = lZ_out
        tto_ref[pl.ds(j, 1), :] = tt_new
        tno_ref[pl.ds(j, 1), :] = tn_new
        return 0

    jax.lax.fori_loop(0, B, body, 0)


def file_selectors(BF: int, D: int, N: int, dtype=jnp.float32):
    """0/1 selector/expander matrices for per-file segment reductions in the
    z-major lane layout (see _adf_kernel_mb).  selD (BF*D, BF) sums a file's
    D columns; exD/exN/exC broadcast a per-file value back to its lanes."""
    import numpy as np

    selD = np.kron(np.eye(BF), np.ones((D, 1)))
    exN = np.kron(np.eye(BF), np.ones((1, N)))
    exC = np.concatenate([np.kron(np.eye(BF), np.ones((1, D))), exN], axis=1)
    return (jnp.asarray(selD, dtype), jnp.asarray(selD.T, dtype),
            jnp.asarray(exN, dtype), jnp.asarray(exC, dtype))


@functools.partial(jax.jit, static_argnums=(0, 6, 7, 8, 9, 10))
def adf_filter_pallas_mb(
    mp,  # ops.moments.MomentParams (hashable static)
    ssm_flat: BlockSSM,  # BF*C channels, z-major file layout
    Wbd_T: jax.Array,  # (BF*N, BF*D) transposed block-diag NMF weights
    sn2_vec,  # (BF,) per-file observation noise
    yB: jax.Array,  # (T, BF)
    maskB: jax.Array,  # (T, BF) bool
    n_files: int,
    damp: float,
    block: int = 256,
    s_chunk: int = 0,  # 0 = all sigma points in one chunk
    interpret: bool = False,
):
    """Batched fused ADF sweep over BF files (see _adf_kernel_mb).

    The model constants must already be in the flat z-major channel layout
    (nsgp_tpu.inference.batched.flatten_ssm_zmajor).  Returns b-major padded
    trajectories + per-file lZ (T, BF) + Sites (T, BF*C)."""
    from nsgp_tpu.ops.moments import sigma_points

    BC, bs = ssm_flat.H.shape
    BF = n_files
    D, N = mp.D, mp.N
    if BC > 128:
        # The kernel slices the z/g lane blocks at offset BF*D; Mosaic
        # cannot relayout slices that cross the 128-lane tile boundary
        # ("Invalid input layout" on the (1, BN) broadcast).  Callers chunk
        # the file batch so BF*(D+N) <= 128 (see experiments BATCH_CAP).
        raise ValueError(
            f"batched ADF kernel needs BF*(D+N) <= 128 lanes, got {BC}; "
            "split the file batch"
        )
    dt_ = ssm_flat.A.dtype
    T = yB.shape[0]
    wn, xi = sigma_points(mp)  # (S,), (S, N)
    S = wn.shape[0]
    sc = s_chunk if s_chunk else S
    nSc = -(-S // sc)
    Sp = nSc * sc
    xiB = jnp.tile(xi, (1, BF))  # (S, BF*N)
    xiB = jnp.pad(xiB, ((0, Sp - S), (0, 0)))
    wnp = jnp.pad(wn, (0, Sp - S)).reshape(-1, 1)
    selD, exD, exN, exC = file_selectors(BF, D, N, dt_)

    A2, Q2, Pi2, H2, _ = _consts(ssm_flat)
    sites = Sites(jnp.zeros((T, BC), dt_), jnp.zeros((T, BC), dt_))
    sites_p, _ = _pad_sites(sites, block)
    Tp = sites_p.ttau.shape[0]
    pad = Tp - T
    yp = jnp.pad(jnp.nan_to_num(yB), ((0, pad), (0, 0))).astype(dt_)
    maskp = jnp.pad(maskB, ((0, pad), (0, 0))).astype(dt_)
    nblk = Tp // block

    const_spec = lambda n: pl.BlockSpec((n, BC), lambda i: (0, 0))
    ms_b, Ps_b, lZ, tto, tno = pl.pallas_call(
        functools.partial(
            _adf_kernel_mb, bs=bs, B=block, BF=BF, D=D, N=N, S=S, s_chunk=sc,
            damp=damp, link=mp.link, variant=mp.variant, z_floor=mp.z_floor,
        ),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((block, BF), lambda i: (i, 0)),
            pl.BlockSpec((block, BF), lambda i: (i, 0)),
            pl.BlockSpec((block, BC), lambda i: (i, 0)),
            pl.BlockSpec((block, BC), lambda i: (i, 0)),
            const_spec(bs * bs), const_spec(bs * bs), const_spec(bs * bs),
            const_spec(bs),
            pl.BlockSpec((BF * N, BF * D), lambda i: (0, 0)),
            pl.BlockSpec((Sp, BF * N), lambda i: (0, 0)),
            pl.BlockSpec((Sp, 1), lambda i: (0, 0)),
            pl.BlockSpec((1, BF), lambda i: (0, 0)),
            pl.BlockSpec((BF * D, BF), lambda i: (0, 0)),
            pl.BlockSpec((BF, BF * D), lambda i: (0, 0)),
            pl.BlockSpec((BF, BF * N), lambda i: (0, 0)),
            pl.BlockSpec((BF, BC), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block * bs, BC), lambda i: (i, 0)),
            pl.BlockSpec((block * bs * bs, BC), lambda i: (i, 0)),
            pl.BlockSpec((block, BF), lambda i: (i, 0)),
            pl.BlockSpec((block, BC), lambda i: (i, 0)),
            pl.BlockSpec((block, BC), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp * bs, BC), dt_),
            jax.ShapeDtypeStruct((Tp * bs * bs, BC), dt_),
            jax.ShapeDtypeStruct((Tp, BF), dt_),
            jax.ShapeDtypeStruct((Tp, BC), dt_),
            jax.ShapeDtypeStruct((Tp, BC), dt_),
        ],
        scratch_shapes=[
            pltpu.VMEM((bs, BC), dt_),
            pltpu.VMEM((bs * bs, BC), dt_),
        ],
        interpret=interpret,
    )(
        yp, maskp, sites_p.ttau, sites_p.tnu, A2, Q2, Pi2, H2,
        Wbd_T.astype(dt_), xiB.astype(dt_), wnp.astype(dt_),
        jnp.asarray(sn2_vec, dt_).reshape(1, BF),
        selD, exD, exN, exC,
    )
    return ms_b, Ps_b, lZ[:T], Sites(tto[:T], tno[:T])


def _pad_sites(sites: Sites, B: int):
    T = sites.ttau.shape[0]
    pad = (-T) % B
    if pad:
        z = lambda x: jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0
        )
        return Sites(z(sites.ttau), z(sites.tnu)), T
    return sites, T


@functools.partial(jax.jit, static_argnums=(0, 6, 7, 8))
def adf_filter_pallas(
    mp,  # ops.moments.MomentParams (hashable static)
    ssm: BlockSSM,
    W: jax.Array,  # (D, N) NMF weights
    sn2,  # () observation noise variance
    y: jax.Array,  # (T,)
    mask: jax.Array,  # (T,) bool
    damp: float,
    block: int = 256,
    interpret: bool = False,
):
    """Fused ADF forward sweep (EP sweep 1) with in-kernel cubature moments.

    Returns (ms_b (Tp, bs*C), Ps_b (Tp, bs*bs*C), lZ (T,), Sites (T, C))
    with ms/Ps in the kernels' b-major flat layout over the PADDED length
    (feed directly to the backward kernel via smoother_pallas_bmajor).
    """
    from nsgp_tpu.ops.moments import sigma_points

    C, bs = ssm.H.shape
    D, N = mp.D, mp.N
    dt_ = ssm.A.dtype
    T = y.shape[0]
    sites = Sites(jnp.zeros((T, C), dt_), jnp.zeros((T, C), dt_))
    wn, xi = sigma_points(mp)  # (S,), (S, N)
    S = wn.shape[0]
    A2, Q2, Pi2, H2, _ = _consts(ssm)
    sites_p, _ = _pad_sites(sites, block)
    Tp = sites_p.ttau.shape[0]
    pad = Tp - T
    yp = jnp.pad(jnp.nan_to_num(y), (0, pad)).reshape(Tp, 1).astype(dt_)
    maskp = jnp.pad(mask, (0, pad)).reshape(Tp, 1).astype(dt_)
    nblk = Tp // block

    const_spec = lambda n: pl.BlockSpec((n, C), lambda i: (0, 0))
    ms_b, Ps_b, lZ, tto, tno = pl.pallas_call(
        functools.partial(
            _adf_kernel, bs=bs, B=block, D=D, N=N, damp=damp,
            link=mp.link, variant=mp.variant, z_floor=mp.z_floor,
        ),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((block, 1), lambda i: (i, 0)),
            pl.BlockSpec((block, 1), lambda i: (i, 0)),
            pl.BlockSpec((block, C), lambda i: (i, 0)),
            pl.BlockSpec((block, C), lambda i: (i, 0)),
            const_spec(bs * bs), const_spec(bs * bs), const_spec(bs * bs),
            const_spec(bs),
            pl.BlockSpec((N, D), lambda i: (0, 0)),
            pl.BlockSpec((S, N), lambda i: (0, 0)),
            pl.BlockSpec((S, 1), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block * bs, C), lambda i: (i, 0)),
            pl.BlockSpec((block * bs * bs, C), lambda i: (i, 0)),
            pl.BlockSpec((block, 1), lambda i: (i, 0)),
            pl.BlockSpec((block, C), lambda i: (i, 0)),
            pl.BlockSpec((block, C), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp * bs, C), dt_),
            jax.ShapeDtypeStruct((Tp * bs * bs, C), dt_),
            jax.ShapeDtypeStruct((Tp, 1), dt_),
            jax.ShapeDtypeStruct((Tp, C), dt_),
            jax.ShapeDtypeStruct((Tp, C), dt_),
        ],
        scratch_shapes=[
            pltpu.VMEM((bs, C), dt_),
            pltpu.VMEM((bs * bs, C), dt_),
        ],
        interpret=interpret,
    )(
        yp, maskp, sites_p.ttau, sites_p.tnu, A2, Q2, Pi2, H2,
        jnp.transpose(W, (1, 0)).astype(dt_),
        xi.astype(dt_),
        wn.reshape(-1, 1).astype(dt_),
        jnp.asarray(sn2, dt_).reshape(1, 1),
    )
    return ms_b, Ps_b, lZ[:T, 0], Sites(tto[:T], tno[:T])


def smoother_pallas_bmajor(ssm: BlockSSM, ms_b, Ps_b, T: int,
                           block: int = 256, interpret: bool = False):
    """Backward smoother over row-major padded trajectories
    (ms_b (Tp*bs, C), Ps_b (Tp*bs*bs, C)); returns C-major flattened
    smoothed (ms (T, C*bs), Ps (T, C*bs*bs))."""
    C, bs = ssm.H.shape
    dt_ = ssm.A.dtype
    A2, Q2, _, H2, pad2 = _consts(ssm)
    Tp = ms_b.shape[0] // bs
    nblk = Tp // block
    const_spec = lambda n: pl.BlockSpec((n, C), lambda i: (0, 0))
    bwd = pl.pallas_call(
        functools.partial(_bwd_kernel, bs=bs, B=block),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((block * bs, C), lambda i: (nblk - 1 - i, 0)),
            pl.BlockSpec((block * bs * bs, C), lambda i: (nblk - 1 - i, 0)),
            const_spec(bs * bs), const_spec(bs * bs), const_spec(bs),
            const_spec(bs),
        ],
        out_specs=[
            pl.BlockSpec((block * bs, C), lambda i: (nblk - 1 - i, 0)),
            pl.BlockSpec((block * bs * bs, C), lambda i: (nblk - 1 - i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp * bs, C), dt_),
            jax.ShapeDtypeStruct((Tp * bs * bs, C), dt_),
        ],
        scratch_shapes=[
            pltpu.VMEM((bs, C), dt_),
            pltpu.VMEM((bs * bs, C), dt_),
        ],
        interpret=interpret,
    )
    sm_b, sP_b = bwd(ms_b, Ps_b, A2, Q2, H2, pad2)
    sm = jnp.transpose(sm_b[: T * bs].reshape(T, bs, C), (0, 2, 1)).reshape(T, -1)
    sP = jnp.transpose(
        sP_b[: T * bs * bs].reshape(T, bs, bs, C), (0, 3, 1, 2)
    ).reshape(T, -1)
    return sm, sP


@functools.partial(jax.jit, static_argnums=(2, 3))
def filter_smoother_pallas(
    ssm: BlockSSM, sites: Sites, block: int = 256, interpret: bool = False
):
    """Fused forward filter + RTS smoother with fixed EP sites.

    Returns C-major flattened smoothed trajectories (ms (T, C*bs),
    Ps (T, C*bs*bs)) — same convention as kalman.rts_smoother.
    Zero-site padding steps beyond T are pure predictions, which are exactly
    inert for the smoothing recursion at the T-1 junction.
    """
    C, bs = ssm.H.shape
    dt_ = ssm.A.dtype
    A2, Q2, Pi2, H2, pad2 = _consts(ssm)
    sites_p, T = _pad_sites(sites, block)
    Tp = sites_p.ttau.shape[0]
    nblk = Tp // block

    const_spec = lambda n: pl.BlockSpec((n, C), lambda i: (0, 0))
    fwd = pl.pallas_call(
        functools.partial(_fwd_kernel, bs=bs, B=block),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((block, C), lambda i: (i, 0)),
            pl.BlockSpec((block, C), lambda i: (i, 0)),
            const_spec(bs * bs), const_spec(bs * bs), const_spec(bs * bs),
            const_spec(bs),
        ],
        out_specs=[
            pl.BlockSpec((block * bs, C), lambda i: (i, 0)),
            pl.BlockSpec((block * bs * bs, C), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp * bs, C), dt_),
            jax.ShapeDtypeStruct((Tp * bs * bs, C), dt_),
        ],
        scratch_shapes=[
            pltpu.VMEM((bs, C), dt_),
            pltpu.VMEM((bs * bs, C), dt_),
        ],
        interpret=interpret,
    )
    ms_b, Ps_b = fwd(sites_p.ttau, sites_p.tnu, A2, Q2, Pi2, H2)
    return smoother_pallas_bmajor(ssm, ms_b, Ps_b, T, block, interpret)
