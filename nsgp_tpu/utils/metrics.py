"""Evaluation metrics: RMSE, SNR, log-spectrogram SNR with loudness floor.

Re-designs the reference's inline metric code (demo_stationary_filterbank.m:
204-226, missing_data_music_results.m:26-37, prob_filterbank/loud_floor.m).
PESQ (reference ships an obfuscated p-code binary) is intentionally not
reimplemented; SNR/log-SNR cover the repo's committed results.
"""

from __future__ import annotations

import jax.numpy as jnp


def rmse(a, b, mask=None):
    d = (a - b) ** 2
    if mask is not None:
        return jnp.sqrt(jnp.sum(jnp.where(mask, d, 0.0)) / jnp.sum(mask))
    return jnp.sqrt(jnp.mean(d))


def snr_db(clean, estimate, mask=None):
    """Signal-to-noise ratio of the estimate vs the clean signal (dB)."""
    err = (clean - estimate) ** 2
    sig = clean**2
    if mask is not None:
        err = jnp.where(mask, err, 0.0)
        sig = jnp.where(mask, sig, 0.0)
    return 10.0 * jnp.log10(jnp.sum(sig) / jnp.maximum(jnp.sum(err), 1e-300))


def loud_floor(S, floor_db: float = -80.0):
    """Floor a power spectrogram before taking logs
    (ref prob_filterbank/loud_floor.m)."""
    floor = jnp.max(S) * 10.0 ** (floor_db / 10.0)
    return jnp.maximum(S, floor)


def _spectrogram(y, nwin: int = 256, hop: int = 128):
    T = y.shape[0]
    nfrm = max(1, (T - nwin) // hop + 1)
    idx = jnp.arange(nwin)[None, :] + hop * jnp.arange(nfrm)[:, None]
    win = jnp.hanning(nwin).astype(y.dtype)
    return jnp.abs(jnp.fft.rfft(y[idx] * win[None], axis=-1)) ** 2


def log_spec_snr_db(clean, estimate, nwin: int = 256, hop: int = 128,
                    floor_db: float = -80.0):
    """Log-spectrogram SNR with loudness floor
    (ref demo_stationary_filterbank.m:204-226)."""
    Sc = jnp.log(loud_floor(_spectrogram(clean, nwin, hop), floor_db))
    Se = jnp.log(loud_floor(_spectrogram(estimate, nwin, hop), floor_db))
    num = jnp.sum((Sc - jnp.mean(Sc)) ** 2)
    den = jnp.maximum(jnp.sum((Sc - Se) ** 2), 1e-300)
    return 10.0 * jnp.log10(num / den)
