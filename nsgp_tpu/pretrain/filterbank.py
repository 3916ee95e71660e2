"""Steady-state Kalman filterbank transform (complex subband coefficients).

TPU-native re-design of kernel_ss_probFB.m / kernel_ss_kalmanFastFB.m /
kernel_ss_kalmanSlowFB_rewrite.m / getFBLDSOutput_tau.m.

The stationary filterbank is a linear-Gaussian SSM: D (kernel x cosine)
subband blocks observed through their SUM, y_t = sum_d H_d x_d + eps.  The
shared scalar observation couples the channels, so (unlike the EP engines)
the steady-state covariance is dense over the joint state m = 2*tau*D.

Fast path (= the reference's IHGP filterbank):
  one joint DARE (doubling iteration, nsgp_tpu.ops.dare) ->
  steady gain K, steady transition M = (I - K H) A ->
  filtered means by a parallel-in-time AFFINE SCAN  m_k = M m_{k-1} + K y_k
  (the reference's sequential :59-94 recursion, O(log T) depth here) ->
  steady smoother gain G and a reverse affine scan.

Complex coefficients: each subband block carries its quadrature pair in
state dims (0, 1); Z_d = x_d[0] + i x_d[1] (ref getFBLDSOutput_tau.m:50-63).

Slow path (exact, used for gap masks / time-varying noise): a sequential
dense Kalman/RTS with per-step noise, NaN -> pure prediction
(ref kernel_ss_kalmanSlowFB_rewrite.m:55-137).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from nsgp_tpu.ops import dare as dare_mod
from nsgp_tpu.ops import kernels as K
from nsgp_tpu.ops import ssm as ssm_mod
from nsgp_tpu.utils.precision import f32_matmuls


class Filterbank(NamedTuple):
    """Dense joint stationary filterbank model."""

    A: jax.Array  # (m, m)
    Q: jax.Array  # (m, m)
    Pinf: jax.Array  # (m, m)
    H: jax.Array  # (m,) joint observation row (sum over subbands)
    noise: jax.Array  # () observation noise variance
    D: int
    block: int  # per-subband block size (2 * tau)


def build_filterbank(
    sigma2, ell, omega, kernel: str = "exp", noise=1e-4, dt: float = 1.0
) -> Filterbank:
    """Assemble the dense joint subband model (ref get_disc_model.m)."""
    sigma2 = jnp.atleast_1d(jnp.asarray(sigma2))
    dtype = sigma2.dtype
    ell = jnp.atleast_1d(jnp.asarray(ell, dtype))
    omega = jnp.atleast_1d(jnp.asarray(omega, dtype))
    D = sigma2.shape[0]
    tau = K.kernel_state_dim(kernel)
    blk = 2 * tau

    def one(s2, l, om):
        F, LQcLT, H, Pinf = ssm_mod.subband_block(s2, l, om, kernel, dtype=dtype)
        A, Q = ssm_mod.lti_disc_stationary(F, Pinf, dt)
        return A, Q, Pinf, H

    As, Qs, Ps, Hs = jax.vmap(one)(sigma2, ell, omega)
    m = D * blk

    def bd(blocks):
        out = jnp.zeros((m, m), dtype)
        return jax.lax.fori_loop(
            0,
            D,
            lambda c, o: jax.lax.dynamic_update_slice(o, blocks[c], (c * blk, c * blk)),
            out,
        )

    H = Hs.reshape(-1)
    return Filterbank(
        A=bd(As), Q=bd(Qs), Pinf=bd(Ps), H=H, noise=jnp.asarray(noise, dtype),
        D=D, block=blk,
    )


class FBResult(NamedTuple):
    Z: jax.Array  # (T, D) complex subband coefficients
    ms: jax.Array  # (T, m) smoothed state means
    Pvar: jax.Array  # (D,) steady smoothed per-subband marginal variance
    lml: jax.Array  # () log marginal likelihood of the signal


def _to_complex(ms: jax.Array, D: int, blk: int) -> jax.Array:
    x = ms.reshape(ms.shape[0], D, blk)
    return x[..., 0] + 1j * x[..., 1]


def steady_filterbank(fb: Filterbank, y: jax.Array) -> FBResult:
    """IHGP filterbank transform (fast path, fully parallel in time).

    ``fb.D``/``fb.block`` are Python ints and must stay static under jit, so
    the compiled implementation closes over them via static_argnums.
    """
    return _steady_filterbank(fb.A, fb.Q, fb.H, fb.noise, y,
                              int(fb.D), int(fb.block))


@partial(jax.jit, static_argnums=(5, 6))
@f32_matmuls
def _steady_filterbank(A, Q, H, r, y, D: int, blk: int) -> FBResult:
    m = A.shape[0]
    T = y.shape[0]

    P = dare_mod.dare_filter(A, H, Q, r)  # steady predictive covariance
    PH = P @ H
    S = H @ PH + r
    Kg = PH / S  # steady gain
    M = (jnp.eye(m, dtype=A.dtype) - jnp.outer(Kg, H)) @ A
    lml_const = -0.5 * jnp.log(2.0 * jnp.pi * S)

    # Parallel affine scan over filtered means: m_k = M m_{k-1} + K y_k
    Ms = jnp.broadcast_to(M, (T, m, m))
    cs = Kg[None, :] * y[:, None]

    def combine(a, b):
        Ma, ca = a
        Mb, cb = b
        return Mb @ Ma, jnp.einsum("...ij,...j->...i", Mb, ca) + cb

    _, mf = jax.lax.associative_scan(combine, (Ms, cs), axis=0)

    # innovations for the likelihood: v_k = y_k - H A m_{k-1}
    mprev = jnp.concatenate([jnp.zeros((1, m), A.dtype), mf[:-1]], axis=0)
    v = y - mprev @ (A.T @ H)
    lml = jnp.sum(lml_const - 0.5 * v * v / S)

    # Steady smoother: Pf = P - K S K'; G = Pf A' P^{-1}
    Pf = P - S * jnp.outer(Kg, Kg)
    G = jnp.linalg.solve(P.T, (Pf @ A.T).T).T
    cvec = mf - mf @ (A.T @ G.T)  # m_f - G A m_f per row
    Gs = jnp.broadcast_to(G, (T - 1, m, m))
    Gp = jnp.concatenate([Gs, jnp.zeros((1, m, m), A.dtype)], axis=0)
    cp = jnp.concatenate([cvec[:-1], mf[-1:]], axis=0)

    def combine_r(later, earlier):
        Ga, ca = later
        Gb, cb = earlier
        return Gb @ Ga, jnp.einsum("...ij,...j->...i", Gb, ca) + cb

    _, sm = jax.lax.associative_scan(combine_r, (Gp, cp), axis=0, reverse=True)

    # Steady smoothed covariance PS = G PS G' + (Pf - G P G')
    QQ = Pf - G @ P @ G.T
    PS = dare_mod.dlyap_doubling(G, 0.5 * (QQ + QQ.T))
    Pvar = jnp.diag(PS)[0::blk]
    return FBResult(Z=_to_complex(sm, D, blk), ms=sm, Pvar=Pvar, lml=lml)


def exact_filterbank(
    fb: Filterbank,
    y: jax.Array,
    mask: Optional[jax.Array] = None,
    noise_t: Optional[jax.Array] = None,
) -> FBResult:
    """Exact dense Kalman/RTS filterbank (slow path; supports missing data
    and per-step observation noise).

    Ref kernel_ss_kalmanSlowFB_rewrite.m:55-137 — per-step covariances, NaN
    (mask False) -> pure prediction, and time-varying noise R_t (the
    reference threads ``vary`` per step for denoise/gap masks).

    ``noise_t``: optional (T,) per-step observation-noise variance;
    defaults to the constant ``fb.noise``.
    """
    if mask is None:
        mask = ~jnp.isnan(y)
    y = jnp.nan_to_num(y)
    A, Q, H = fb.A, fb.Q, fb.H
    m = A.shape[0]
    if noise_t is None:
        noise_t = jnp.full(y.shape, fb.noise, A.dtype)
    else:
        noise_t = jnp.broadcast_to(jnp.asarray(noise_t, A.dtype), y.shape)

    def step(carry, inp):
        mx, P, first = carry
        y_k, obs_k, r_k = inp
        mx, P = jax.lax.cond(
            first, lambda: (mx, P), lambda: (A @ mx, A @ P @ A.T + Q)
        )
        P = 0.5 * (P + P.T)
        PH = P @ H
        S = H @ PH + r_k
        Kg = PH / S
        v = y_k - H @ mx
        lml_k = jnp.where(
            obs_k, -0.5 * (jnp.log(2 * jnp.pi * S) + v * v / S), 0.0
        )
        mx = jnp.where(obs_k, mx + Kg * v, mx)
        P = jnp.where(obs_k, P - jnp.outer(Kg, PH), P)
        return (mx, P, jnp.zeros_like(first)), (mx, P, lml_k)

    m0 = jnp.zeros((m,), A.dtype)
    (_, _, _), (ms, Ps, lml) = jax.lax.scan(
        step, (m0, fb.Pinf, jnp.asarray(True)), (y, mask, noise_t)
    )

    eye = jnp.eye(m, dtype=A.dtype)

    def sstep(carry, inp):
        m_next, P_next = carry
        ms_k, Ps_k = inp
        Pp = A @ Ps_k @ A.T + Q + 1e-12 * eye
        G = jnp.linalg.solve(Pp.T, (Ps_k @ A.T).T).T
        mk = ms_k + G @ (m_next - A @ ms_k)
        Pk = Ps_k + G @ (P_next - Pp) @ G.T
        return (mk, 0.5 * (Pk + Pk.T)), (mk, Pk)

    (_, _), (sm_r, sP_r) = jax.lax.scan(
        sstep, (ms[-1], Ps[-1]), (ms[:-1], Ps[:-1]), reverse=True
    )
    sm = jnp.concatenate([sm_r, ms[-1:]], axis=0)
    sP = jnp.concatenate([sP_r, Ps[-1:]], axis=0)
    Pvar = jnp.stack(
        [sP[:, c * fb.block, c * fb.block] for c in range(fb.D)], axis=-1
    ).mean(0)
    return FBResult(Z=_to_complex(sm, fb.D, fb.block), ms=sm, Pvar=Pvar,
                    lml=jnp.sum(lml))


def fft_filterbank(
    sigma2, ell, omega, y, kernel: str = "exp", noise=1e-4,
    pad: Optional[int] = None,
):
    """FFT-domain Wiener-filter filterbank (ref probFB_FFT.m).

    For a stationary model the posterior subband means are exactly circulant
    Wiener filters: Z_d = F^{-1}[ S_d(w) / (sum_e S_e(w) + noise) F y ],
    with S_d the two-sided spectral-mixture component spectrum.  The complex
    (analytic) coefficients keep only positive frequencies doubled — the
    FFT analogue of the Kalman filterbank's quadrature pair
    (getFBLDSOutput_tau.m).  Zero-padding by ~3 lengthscales suppresses the
    circular wrap (ref probFB_FFT.m:28-33 pads by the decay time).

    Returns Z (T, D) complex.  O(T log T) — the fastest stationary path.
    """
    from nsgp_tpu.pretrain import spectral

    y = jnp.asarray(y)
    dtype = y.dtype
    sigma2 = jnp.atleast_1d(jnp.asarray(sigma2, dtype))
    ell = jnp.atleast_1d(jnp.asarray(ell, dtype))
    omega = jnp.atleast_1d(jnp.asarray(omega, dtype))
    lam = spectral.LAM_SCALE[kernel] / ell
    T = y.shape[0]
    if pad is None:
        pad = int(3.0 * float(jnp.max(ell)))
    Tp = T + pad

    w_full = 2.0 * jnp.pi * jnp.fft.fftfreq(Tp).astype(dtype)  # (-pi, pi]
    Sm = lambda dw: spectral._matern_spec(kernel, sigma2[None, :],
                                          lam[None, :], dw)
    S = 0.5 * (Sm(w_full[:, None] - omega[None, :])
               + Sm(w_full[:, None] + omega[None, :]))  # (Tp, D)
    S_tot = jnp.sum(S, axis=-1, keepdims=True) + noise

    Yf = jnp.fft.fft(y, n=Tp)  # (Tp,)
    analytic = jnp.where(w_full > 0, 2.0, jnp.where(w_full == 0, 1.0, 0.0))
    Zf = (S / S_tot) * (Yf * analytic)[:, None]
    Z = jnp.fft.ifft(Zf, axis=0)[:T]
    return Z
