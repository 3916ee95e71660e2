"""STOI metric sanity: identity ~ max score, monotone degradation with
noise, robust to sample-rate conversion."""

import numpy as np

from nsgp_tpu.utils.stoi import stoi


def _speechlike(T, fs, seed=0):
    """Amplitude-modulated BROADBAND noise: every third-octave band carries
    signal (pure tones would leave most bands empty and floor the scores)."""
    rng = np.random.default_rng(seed)
    t = np.arange(T) / fs
    env = 0.1 + np.clip(np.sin(2 * np.pi * 3.0 * t), 0.0, None)
    return env * rng.normal(size=T)


def test_stoi_identity_is_high():
    fs = 16000
    x = _speechlike(2 * fs, fs)
    s = stoi(x, x, fs)
    assert s > 0.99, s


def test_stoi_monotone_in_noise():
    fs = 16000
    x = _speechlike(2 * fs, fs)
    rng = np.random.default_rng(1)
    noise = rng.normal(size=x.shape)
    scores = [stoi(x, x + sig * noise, fs) for sig in (0.05, 0.3, 1.5)]
    assert scores[0] > scores[1] > scores[2], scores
    assert scores[0] > 0.85, scores


def test_stoi_native_rate():
    fs = 10000
    x = _speechlike(2 * fs, fs)
    assert stoi(x, x, fs) > 0.99
