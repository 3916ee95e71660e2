"""Denoising application: set the observation noise to the (known or
estimated) corruption level and read off the posterior signal.

TPU-native equivalent of experiments/noise_reduction_speech.m: white noise
of variance v is added (yTest = y + sqrt(v) xi, :63), the model's likelihood
noise w_lik is set to v, EP runs unchanged, and the denoised signal is the
posterior reconstruction.  Metrics: SNR vs the clean signal.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nsgp_tpu.apps.missing_data import reconstruct_signal
from nsgp_tpu.models.gtnmf import GTNMFModel, GTNMFParams
from nsgp_tpu.utils import metrics


class DenoiseResult(NamedTuple):
    y_hat: jax.Array
    snr_in: jax.Array  # () input SNR (noisy vs clean), dB
    snr_out: jax.Array  # () output SNR (denoised vs clean), dB
    result: object


def tv_wiener(
    model: GTNMFModel,
    params: GTNMFParams,
    Eft: jax.Array,  # (T, C) posterior observable means
    y_noisy: jax.Array,  # (T,)
    noise_var: float,
    nwin: int = 512,
    hop: int = 128,
    stat_spec: jax.Array | None = None,  # (F,) stationary signal spectrum
    # at the rfft bins (same PSD units as noise_var), e.g. from the stage-1
    # filterbank fit
    stat_floor: float = 0.0,  # kappa: final gain G = max(G_tv, kappa *
    # G_stat) — caps how much harder than the stationary Wiener the
    # time-varying filter may suppress.  Envelope-estimation error in
    # low-SNR frames over-suppresses real speech (the round-4 waveform-SNR
    # / STOI deficit vs the stationary baseline); the floor bounds that
    # failure mode while keeping the TV suppression of genuinely quiet
    # frames (kappa < 1).  0 = pure TV gain (round-4 behavior).
):
    """Time-varying Wiener filter from the posterior modulator envelopes.

    The GT-NMF posterior resynthesis sum_d z_d a_d contains ONLY the D
    narrow subbands — between spectral peaks it has ~zero energy, so
    log-spectral/intelligibility metrics favor even a STATIONARY Wiener
    filter, whose output is the filtered noisy signal (broadband floor
    retained).  This is the nonstationary analogue: conditional on the
    modulator posterior, the model's local signal spectrum at frame tau is

        S_tau(w) = sum_d [W E link(g_tau)]_d * sub_var_d * P_d(w),

    with P_d the unit-variance spectral-mixture component ('sq' variant:
    [W link g]_d multiplies z_d's VARIANCE directly), and the MMSE gain is
    G_tau(w) = S_tau(w) / (S_tau(w) + v) applied to the noisy STFT —
    exactly the stationary baseline's filter with the model's time-varying
    spectrum.  sqrt-Hann analysis/synthesis windows (COLA at hop = nwin/4).
    """
    from nsgp_tpu.ops.moments import LINKS
    from nsgp_tpu.pretrain.spectral import component_spectra

    D = model.D
    link = LINKS[model.link]
    T = y_noisy.shape[0]

    # local per-channel variance multipliers (T, D)
    a2 = link(Eft[:, D:]) @ params.W.T
    if model.variant != "sq":  # 'amp': s = z * (W link g) -> variance x a^2
        a2 = a2 * a2

    # per-channel spectra at the rfft bins, each normalized to mean 1 over
    # the TWO-SIDED grid (discrete PSD convention in which white noise of
    # variance v has flat PSD v), then scaled by the channel variance
    # sub_var_d — so S = (a2 * sub_var) @ P_hat matches the units of v.
    from nsgp_tpu.pretrain.spectral import LAM_SCALE

    wbins = jnp.arange(nwin // 2 + 1) * (2.0 * jnp.pi / nwin)
    lam = LAM_SCALE[model.kernel1] / params.sub_len
    P = component_spectra(model.kernel1, jnp.ones((D,), y_noisy.dtype),
                          lam, params.omega, wbins)  # (F, D)
    two_sided = jnp.concatenate([P, P[1:-1][::-1]], axis=0)
    P = P / jnp.mean(two_sided, axis=0, keepdims=True)
    P = P * params.sub_var[None, :]

    win = jnp.sqrt(jnp.hanning(nwin + 1)[:-1].astype(y_noisy.dtype))
    Tp = T + nwin  # zero-pad so the tail is fully covered by frames
    ypad = jnp.concatenate([y_noisy, jnp.zeros((nwin,), y_noisy.dtype)])
    a2p = jnp.concatenate([a2, jnp.repeat(a2[-1:], nwin, axis=0)], axis=0)
    n_frames = (Tp - nwin) // hop + 1
    idx = jnp.arange(nwin)[None, :] + hop * jnp.arange(n_frames)[:, None]
    frames = ypad[idx] * win[None, :]
    Y = jnp.fft.rfft(frames, axis=1)  # (n_frames, F)

    # frame-mean envelopes -> local spectra -> gains
    a2f = jnp.mean(a2p[idx], axis=1)  # (n_frames, D)
    S = a2f @ P.T  # (n_frames, F)
    G = S / (S + noise_var)
    if stat_spec is not None and stat_floor > 0.0:
        G_stat = stat_spec / (stat_spec + noise_var)  # (F,)
        G = jnp.maximum(G, stat_floor * G_stat[None, :])
    out_frames = jnp.fft.irfft(Y * G, nwin, axis=1) * win[None, :]

    # overlap-add (sqrt-Hann^2 at hop = nwin/4 sums to a constant)
    y_out = jnp.zeros((Tp,), y_noisy.dtype).at[idx].add(out_frames)
    wsum = jnp.zeros((Tp,), y_noisy.dtype).at[idx].add(win[None, :] ** 2)
    return (y_out / jnp.maximum(wsum, 1e-6))[:T]


def stationary_spectrum(
    kernel: str,
    sigma2: jax.Array,  # (D,) channel variances
    lengthscales: jax.Array,  # (D,)
    omega: jax.Array,  # (D,)
    nwin: int = 512,
    dtype=jnp.float32,
) -> jax.Array:
    """(F,) stationary model PSD at the rfft bins, in the same discrete-PSD
    units as a white-noise variance (see tv_wiener's normalization) — the
    spectrum of the stage-1 filterbank fit, for use as tv_wiener's
    ``stat_spec``."""
    from nsgp_tpu.pretrain.spectral import LAM_SCALE, component_spectra

    D = sigma2.shape[0]
    wbins = jnp.arange(nwin // 2 + 1).astype(dtype) * (2.0 * jnp.pi / nwin)
    lam = LAM_SCALE[kernel] / lengthscales
    P = component_spectra(kernel, jnp.ones((D,), dtype), lam, omega, wbins)
    two_sided = jnp.concatenate([P, P[1:-1][::-1]], axis=0)
    P = P / jnp.mean(two_sided, axis=0, keepdims=True)
    return P @ sigma2.astype(dtype)


def denoise(
    model: GTNMFModel,
    params: GTNMFParams,
    y_noisy: jax.Array,
    noise_var: float,
    y_clean: jax.Array | None = None,
    engine: str = "ep",
    key: jax.Array | None = None,
    n_samples: int = 20,
    **engine_kwargs,
) -> DenoiseResult:
    """Run inference with lik = noise_var (ref noise_reduction_speech.m:34-80:
    w_lik is set to the true added-noise level, 30 EP iters)."""
    from nsgp_tpu.inference import registry

    p = params._replace(lik=jnp.asarray(noise_var, jnp.asarray(params.lik).dtype))
    res = registry.infer(engine, model, p, y_noisy, None, **engine_kwargs)

    if key is None:
        key = jax.random.PRNGKey(0)
    y_hat = reconstruct_signal(model, p, res.Eft, res.Varft, key, n_samples)
    if y_clean is None:
        zero = jnp.asarray(jnp.nan, y_hat.dtype)
        return DenoiseResult(y_hat=y_hat, snr_in=zero, snr_out=zero, result=res)
    return DenoiseResult(
        y_hat=y_hat,
        snr_in=metrics.snr_db(y_clean, y_noisy),
        snr_out=metrics.snr_db(y_clean, y_hat),
        result=res,
    )
