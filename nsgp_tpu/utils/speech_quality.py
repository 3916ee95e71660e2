"""Frequency-weighted segmental SNR — the repo's PESQ stand-in.

The reference evaluates denoising with PESQ shipped as obfuscated MATLAB
p-code (prob_filterbank/pesq.p, called from noise_reduction_speech.m), which
cannot be ported by reading.  This module implements **fwSegSNR** (Hu &
Loizou, "Evaluation of objective quality measures for speech enhancement",
IEEE TASLP 2008, eq. 4): critical-band-weighted per-frame spectral SNR with
the standard [-10, 35] dB clip.  Among the non-intrusive-free measures in
that study it is one of the strongest PESQ/MOS correlates for enhancement
(r ~ 0.81 with overall quality, vs ~0.89 for PESQ itself), and it needs no
external dependencies — a justified proxy, reported alongside STOI.

Implementation notes (matching the composite-measure reference code):
- 25 mel-spaced Gaussian-shaped bands over [50 Hz, fs/2];
- 30 ms Hann frames, 75% overlap;
- band weights W = |X_clean|^gamma with gamma = 0.2;
- per-frame band SNR clipped to [-10, 35] dB before averaging.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_GAMMA = 0.2
_SNR_LO, _SNR_HI = -10.0, 35.0
_N_BANDS = 25


def _hz_to_mel(f):
    return 2595.0 * jnp.log10(1.0 + f / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def _band_filters(n_fft: int, fs: float, n_bands: int, dtype):
    """(n_bands, n_fft//2+1) Gaussian critical-band filters, mel-spaced."""
    freqs = jnp.linspace(0.0, fs / 2.0, n_fft // 2 + 1).astype(dtype)
    mel_lo, mel_hi = _hz_to_mel(50.0), _hz_to_mel(fs / 2.0)
    centers_mel = jnp.linspace(mel_lo, mel_hi, n_bands + 2)[1:-1]
    centers = _mel_to_hz(centers_mel).astype(dtype)
    # bandwidth ~ spacing between neighboring centers (Gaussian sigma = bw/2)
    bw = jnp.gradient(centers) + 1e-6
    return jnp.exp(
        -0.5 * ((freqs[None, :] - centers[:, None]) / (0.5 * bw[:, None])) ** 2
    )


def fw_seg_snr(
    clean: jax.Array,
    estimate: jax.Array,
    fs: int,
    frame_ms: float = 30.0,
    overlap: float = 0.75,
) -> jax.Array:
    """Frequency-weighted segmental SNR (dB), Hu & Loizou 2008 eq. 4.

    Higher is better; roughly monotone in PESQ MOS for speech enhancement.
    Silent frames contribute through the magnitude weighting (no explicit
    VAD, as in the composite-measure reference implementation).
    """
    clean = jnp.asarray(clean)
    estimate = jnp.asarray(estimate)
    dtype = clean.dtype
    nwin = int(fs * frame_ms / 1000.0)
    hop = max(1, int(nwin * (1.0 - overlap)))
    T = clean.shape[0]
    nfrm = max(1, (T - nwin) // hop + 1)
    idx = jnp.arange(nwin)[None, :] + hop * jnp.arange(nfrm)[:, None]
    win = jnp.hanning(nwin).astype(dtype)

    X = jnp.abs(jnp.fft.rfft(clean[idx] * win[None], axis=-1))
    Xh = jnp.abs(jnp.fft.rfft(estimate[idx] * win[None], axis=-1))

    filt = _band_filters(nwin, float(fs), _N_BANDS, dtype)  # (B, F)
    Xb = X @ filt.T  # (nfrm, B) clean band magnitudes
    Xhb = Xh @ filt.T

    W = Xb**_GAMMA
    num = Xb**2
    den = (Xb - Xhb) ** 2 + 1e-20
    snr = 10.0 * jnp.log10(num / den + 1e-20)
    snr = jnp.clip(snr, _SNR_LO, _SNR_HI)
    per_frame = jnp.sum(W * snr, axis=-1) / (jnp.sum(W, axis=-1) + 1e-20)
    return jnp.mean(per_frame)
