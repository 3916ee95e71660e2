"""Parallel-in-time Kalman filtering / RTS smoothing via associative scans.

This is the TPU-native replacement for the reference's sequential per-sample
recursions (gf_ep_modulator_nmf.m:126-274, the ``for k=1:T`` hot loops).
Once EP sites are fixed, a sweep is a *linear-Gaussian* filter + smoother and
can be computed in O(log T) depth with ``jax.lax.associative_scan`` using the
prefix-sum Kalman elements of Särkkä & García-Fernández (2020, "Temporal
parallelization of Bayesian smoothers"; see PAPERS.md).

Everything is batched over the channel axis C (block-diagonal dynamics, see
nsgp_tpu.ops.ssm): element tensors have shape (T, C, bs, bs) / (T, C, bs),
so each scan combine is a big batched (bs x bs) matmul ladder — MXU food.

EP pseudo-observations enter in *natural* form (ttau, tnu) per (step,
channel): precision ttau on the scalar H x with tnu = ttau * pseudo-mean.
All element constructions are branch-free in ttau (ttau == 0 reduces exactly
to pure prediction), matching the reference's NaN/ttau==0 handling
(gf_ep_modulator_nmf.m:167-184) without data-dependent control flow.

Filtering element for step k >= 1 (transition A, noise Q, site ttau/tnu):

    z   = ttau * (H Q H') + 1
    K   = (Q H') * ttau / z
    A_k = (I - K H) A          b_k = (Q H') tnu / z
    C_k = (I - K H) Q          eta_k = A' H' tnu / z     J_k = A' H' ttau H A / z

step 0 uses P0 = Pinf with no prediction (the reference skips the predict on
the first sample): A_0 = 0, b_0 = Pinf H' tnu0 / z0, C_0 = (I - K0 H) Pinf.

Combine (i earlier, j later):
    D   = (I + C_i J_j)^{-1}
    A   = A_j D A_i
    b   = A_j D (b_i + C_i eta_j) + b_j
    C   = A_j D C_i A_j' + C_j
    eta = A_i' D' (eta_j - J_j b_i) + eta_i
    J   = A_i' D' J_j A_i + J_i

After an inclusive scan the k-th element is (b, C) = filtered (m_k, P_k).

Smoothing element for k < T-1 (from filtered m_k, P_k):
    Pp  = A P_k A' + Q
    E_k = P_k A' Pp^{-1}       g_k = m_k - E_k A m_k       L_k = P_k - E_k Pp E_k'
and (E, g, L)_{T-1} = (0, m_{T-1}, P_{T-1}); a reverse scan with
    (E_i, g_i, L_i) x (E_j, g_j, L_j) = (E_i E_j, E_i g_j + g_i,
                                         E_i L_j E_i' + L_i)
yields the smoothed (m^s_k, P^s_k) = (g, L).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nsgp_tpu.ops.kalman import FilterResult, Sites
from nsgp_tpu.ops.ssm import BlockSSM


def _sym(M):
    return 0.5 * (M + jnp.swapaxes(M, -1, -2))


def _filter_elements(ssm: BlockSSM, sites: Sites):
    """Build the (T, C, ...) filtering elements.  Branch-free in ttau."""
    A, Q, H, Pinf = ssm.A, ssm.Q, ssm.H, ssm.Pinf
    ttau, tnu = sites.ttau, sites.tnu  # (T, C)
    T = ttau.shape[0]

    QH = jnp.einsum("cij,cj->ci", Q, H)  # (C, bs)
    HQH = jnp.einsum("ci,ci->c", H, QH)  # (C,)
    HA = jnp.einsum("ci,cij->cj", H, A)  # (C, bs) row H A
    AH = jnp.einsum("cji,cj->ci", A, H)  # (C, bs) col A' H'

    # Steps 1..T-1 --------------------------------------------------------
    tt, tn = ttau[1:], tnu[1:]  # (T-1, C)
    z = tt * HQH + 1.0  # (T-1, C)
    Kg = QH[None] * (tt / z)[..., None]  # (T-1, C, bs) gain K
    A_el = A[None] - Kg[..., :, None] * HA[None, :, None, :]
    b_el = QH[None] * (tn / z)[..., None]
    C_el = Q[None] - Kg[..., :, None] * QH[None, :, None, :]
    eta_el = AH[None] * (tn / z)[..., None]
    J_el = (tt / z)[..., None, None] * AH[None, :, :, None] * AH[None, :, None, :]

    # Step 0 (P0 = Pinf, no predict) ---------------------------------------
    PH0 = jnp.einsum("cij,cj->ci", Pinf, H)
    HPH0 = jnp.einsum("ci,ci->c", H, PH0)
    z0 = ttau[0] * HPH0 + 1.0
    K0 = PH0 * (ttau[0] / z0)[..., None]
    A0 = jnp.zeros_like(A)
    b0 = PH0 * (tnu[0] / z0)[..., None]
    C0 = Pinf - K0[..., :, None] * PH0[:, None, :]
    eta0 = jnp.zeros_like(b0)
    J0 = jnp.zeros_like(A)

    cat = lambda x0, xs: jnp.concatenate([x0[None], xs], axis=0)
    return (
        cat(A0, A_el),
        cat(b0, b_el),
        _sym(cat(C0, C_el)),
        cat(eta0, eta_el),
        _sym(cat(J0, J_el)),
    )


def _filter_combine(ei, ej):
    """Associative combine of filtering elements (i earlier, j later)."""
    Ai, bi, Ci, etai, Ji = ei
    Aj, bj, Cj, etaj, Jj = ej
    bs = Ai.shape[-1]
    I = jnp.eye(bs, dtype=Ai.dtype)
    M = I + Ci @ Jj  # (..., bs, bs)
    # X = Aj M^{-1}  via  M' X' = Aj'
    AjD = jnp.swapaxes(
        jnp.linalg.solve(jnp.swapaxes(M, -1, -2), jnp.swapaxes(Aj, -1, -2)), -1, -2
    )
    # Y' = D' y  via  M' y' = y  => D' applied from the left is solve(M', .)
    Mt = jnp.swapaxes(M, -1, -2)
    A = AjD @ Ai
    b = jnp.einsum("...ij,...j->...i", AjD, bi + jnp.einsum("...ij,...j->...i", Ci, etaj)) + bj
    C = _sym(AjD @ Ci @ jnp.swapaxes(Aj, -1, -2) + Cj)
    At_i = jnp.swapaxes(Ai, -1, -2)
    resid = etaj - jnp.einsum("...ij,...j->...i", Jj, bi)
    Dt_resid = jnp.linalg.solve(Mt, resid[..., None])[..., 0]
    eta = jnp.einsum("...ij,...j->...i", At_i, Dt_resid) + etai
    J = _sym(At_i @ jnp.linalg.solve(Mt, Jj @ Ai) + Ji)
    return A, b, C, eta, J


def parallel_filter_with_sites(ssm: BlockSSM, sites: Sites) -> FilterResult:
    """O(log T)-depth forward filter with fixed EP sites.

    Exact (to float tolerance) match of nsgp_tpu.ops.kalman.filter_with_sites
    — tested against it in tests/test_pscan.py.
    """
    elems = _filter_elements(ssm, sites)
    _, b, C, _, _ = jax.lax.associative_scan(_filter_combine, elems, axis=0)
    return FilterResult(ms=b, Ps=C)


def _smoother_combine(later, earlier):
    """Combine for the reverse scan.  With ``reverse=True`` JAX flips the
    sequence, so the FIRST argument is the suffix combined over later times
    and the second is the (earlier-time) element being applied on top."""
    Ea, ga, La = later
    Eb, gb, Lb = earlier
    E = Eb @ Ea
    g = jnp.einsum("...ij,...j->...i", Eb, ga) + gb
    L = _sym(Eb @ La @ jnp.swapaxes(Eb, -1, -2) + Lb)
    return E, g, L


def parallel_rts_smoother(ssm: BlockSSM, fr: FilterResult, jitter: float = 0.0):
    """O(log T)-depth RTS smoother over stored filtered moments.

    Matches nsgp_tpu.ops.kalman.rts_smoother.  ``jitter`` adds a diagonal
    ridge to the pseudo-prediction before the gain solve (the reference
    retries failed Choleskys with random jitter; we use a fixed ridge).
    """
    A, Q = ssm.A, ssm.Q
    ms, Ps = fr.ms, fr.Ps  # (T, C, bs), (T, C, bs, bs)
    bs = ssm.block_size
    eyeb = jnp.eye(bs, dtype=A.dtype)

    Pk = Ps[:-1]
    Pp = jnp.einsum("cij,tcjk,clk->tcil", A, Pk, A) + Q[None]
    Pp = _sym(Pp) + jitter * eyeb
    PA = jnp.einsum("tcij,ckj->tcik", Pk, A)  # P A'
    # E = P A' Pp^{-1}; pad_eye keeps padded dims nonsingular (PA rows are 0).
    Et = jnp.linalg.solve(
        jnp.swapaxes(Pp + ssm.pad_eye[None], -1, -2), jnp.swapaxes(PA, -1, -2)
    )
    E = jnp.swapaxes(Et, -1, -2)
    g = ms[:-1] - jnp.einsum("tcij,cjk,tck->tci", E, A, ms[:-1])
    L = _sym(Pk - E @ Pp @ jnp.swapaxes(E, -1, -2))

    E = jnp.concatenate([E, jnp.zeros_like(E[:1])], axis=0)
    g = jnp.concatenate([g, ms[-1:]], axis=0)
    L = jnp.concatenate([L, Ps[-1:]], axis=0)

    _, g_s, L_s = jax.lax.associative_scan(
        _smoother_combine, (E, g, L), axis=0, reverse=True
    )
    return g_s, _sym(L_s)


def filter_smoother_with_sites(ssm: BlockSSM, sites: Sites, jitter: float = 0.0):
    """One full linear-Gaussian forward/backward pass, parallel in time."""
    fr = parallel_filter_with_sites(ssm, sites)
    return parallel_rts_smoother(ssm, fr, jitter=jitter)
