"""Pre-training pipeline: recovery-style tests (the reference's xUnit style:
sample from the generative model -> fit -> assert recovery, test_nmf.m)."""

import jax
import jax.numpy as jnp
import numpy as np

from nsgp_tpu.pretrain import filterbank as fb_mod
from nsgp_tpu.pretrain import gppad, nmf, segp, spectral


def test_welch_parseval():
    key = jax.random.PRNGKey(0)
    y = jax.random.normal(key, (8192,))
    w, S = spectral.welch(y, 512)
    # mean of the one-sided spectrum ~ signal variance (white noise)
    np.testing.assert_allclose(float(jnp.mean(S)), float(jnp.var(y)), rtol=0.15)


def test_fit_probstft_recovers_two_tones():
    """Two well-separated spectral peaks -> fitted centers close to truth."""
    T = 16384
    t = jnp.arange(T, dtype=jnp.float64)
    rng = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(rng)
    # narrowband noise around two frequencies (AR-ish via filtered cosines)
    y = (
        jnp.cos(0.5 * t + 2 * jnp.pi * jax.random.uniform(k1))
        + jnp.cos(1.7 * t + 2 * jnp.pi * jax.random.uniform(k2))
        + 0.1 * jax.random.normal(rng, (T,), jnp.float64)
    )
    fit = spectral.fit_probstft(y, D=2, kernel="exp", num_levels=2,
                                steps_per_level=500)
    om = np.sort(np.asarray(fit.omega))
    assert abs(om[0] - 0.5) < 0.05, om
    assert abs(om[1] - 1.7) < 0.05, om


def test_steady_filterbank_reconstructs_signal():
    """Sum of subband posterior means ~ the observed signal (denoising id)."""
    T = 2048
    key = jax.random.PRNGKey(2)
    y = jax.random.normal(key, (T,), jnp.float64)
    fb = fb_mod.build_filterbank(
        sigma2=jnp.asarray([0.5, 0.5]), ell=jnp.asarray([50.0, 50.0]),
        omega=jnp.asarray([0.5, 1.5]), kernel="exp", noise=0.3,
    )
    res = fb_mod.steady_filterbank(fb, y)
    recon = jnp.sum(jnp.real(res.Z), axis=-1)
    # With a noise floor the reconstruction is a shrunk version of y.
    assert float(jnp.corrcoef(jnp.stack([recon, y]))[0, 1]) > 0.7
    assert np.isfinite(float(res.lml))


def test_steady_vs_exact_filterbank():
    """Fast (steady/affine-scan) path matches the exact Kalman path after
    the transient (ref kernel_ss_kalmanFastFB vs kalmanSlowFB)."""
    T = 1024
    y = jnp.asarray(np.random.default_rng(3).normal(size=T))
    fb = fb_mod.build_filterbank(
        sigma2=jnp.asarray([1.0]), ell=jnp.asarray([30.0]),
        omega=jnp.asarray([0.8]), kernel="exp", noise=0.1,
    )
    fast = fb_mod.steady_filterbank(fb, y)
    exact = fb_mod.exact_filterbank(fb, y)
    sl = slice(200, -200)
    np.testing.assert_allclose(
        np.asarray(fast.Z[sl]), np.asarray(exact.Z[sl]), atol=5e-3
    )


def test_exact_filterbank_time_varying_noise():
    """Per-step R_t (ref kernel_ss_kalmanSlowFB_rewrite.m:55-137): constant
    noise_t reproduces the default path; inflating R_t over a noisy burst
    suppresses it relative to the constant-noise fit."""
    T = 768
    rng = np.random.default_rng(5)
    y_clean = np.sin(0.8 * np.arange(T)) * np.exp(
        -0.5 * ((np.arange(T) - T / 2) / 200.0) ** 2
    )
    burst = slice(300, 360)
    y = y_clean.copy()
    y[burst] += 3.0 * rng.normal(size=60)
    y = jnp.asarray(y)
    fb = fb_mod.build_filterbank(
        sigma2=jnp.asarray([1.0]), ell=jnp.asarray([30.0]),
        omega=jnp.asarray([0.8]), kernel="exp", noise=0.1,
    )
    base = fb_mod.exact_filterbank(fb, y)
    same = fb_mod.exact_filterbank(fb, y, noise_t=jnp.full((T,), 0.1))
    np.testing.assert_allclose(np.asarray(base.Z), np.asarray(same.Z))
    noise_t = jnp.full((T,), 0.1).at[burst].set(50.0)
    tv = fb_mod.exact_filterbank(fb, y, noise_t=noise_t)
    rec_base = np.sum(np.real(np.asarray(base.Z)), axis=-1)
    rec_tv = np.sum(np.real(np.asarray(tv.Z)), axis=-1)
    err_base = np.sqrt(np.mean((rec_base[burst] - y_clean[burst]) ** 2))
    err_tv = np.sqrt(np.mean((rec_tv[burst] - y_clean[burst]) ** 2))
    assert err_tv < 0.5 * err_base, (err_tv, err_base)


def test_gppad_recovers_slow_envelope():
    T = 4096
    t = np.arange(T)
    env_true = 1.0 + 0.8 * np.sin(2 * np.pi * t / 1500.0)
    rng = np.random.default_rng(4)
    carrier = rng.normal(size=T)
    y = jnp.asarray(env_true * carrier)
    res = gppad.demodulate(y, ell=300.0, steps=500)
    a = np.asarray(res.envelope)
    r = np.corrcoef(a, env_true)[0, 1]
    assert r > 0.8, r


def test_nmf_recovers_factorization():
    rng = np.random.default_rng(5)
    T, D, N = 2000, 6, 2
    W_true = np.abs(rng.normal(size=(D, N))) + 0.1
    H_true = np.abs(rng.normal(size=(T, N))) + 0.1
    A = jnp.asarray(H_true @ W_true.T)
    res = nmf.nmf_fp(A, N, iters=400, restarts=6)
    Ahat = np.asarray(res.H @ res.W.T)
    rel = np.abs(Ahat - np.asarray(A)) / np.asarray(A)
    assert np.median(rel) < 0.05, np.median(rel)


def test_segp_recovers_lengthscale():
    """Whittle fit recovers the SE lengthscale within a factor
    (ref test_trainSEGP_RS.m sweep style)."""
    T, ell_true = 8192, 80.0
    S = gppad.se_spectrum(T, ell_true, 1.0)
    key = jax.random.PRNGKey(6)
    u = jax.random.normal(key, (T // 2 + 1,), jnp.float64) + 1j * jax.random.normal(
        jax.random.PRNGKey(7), (T // 2 + 1,), jnp.float64
    )
    x = jnp.fft.irfft(jnp.sqrt(S * T / 2.0) * u, n=T)
    fit = segp.fit_segp(x)
    assert 0.5 * ell_true < float(fit.ell) < 2.0 * ell_true, float(fit.ell)


def test_fit_probstft_staged_no_dead_components_on_speech():
    """D=16 staged (exp -> matern32) fit on real speech: dead-component
    reassignment (ref fit_probSTFT_SD.m:359-415) must leave no component
    with negligible variance, and exit rescaling (:484-490) must make the
    component variances sum to the signal variance."""
    import os

    import pytest

    from nsgp_tpu.pretrain import spectral
    from nsgp_tpu.utils.audio import read_wav

    path = "/root/reference/audio/speech/speech0_female.wav"
    if not os.path.exists(path):
        pytest.skip("reference audio not available")
    y, fs = read_wav(path)
    y = jnp.asarray(y[: fs // 2])
    y = y / jnp.std(y)
    D = 16
    fit = spectral.fit_probstft_staged(
        y, D, kernel="matern32", num_levels=2, steps_per_level=150
    )
    s2 = np.asarray(fit.sigma2)
    var_y = float(jnp.var(y))
    assert np.all(s2 >= 0.01 * var_y / D), s2 / var_y  # no dead components
    np.testing.assert_allclose(s2.sum(), var_y, rtol=1e-10)  # exit rescale
    om = np.asarray(fit.omega)
    assert np.all(om > 0)
    assert np.all(om < np.pi)
    # no duplicate components: every pair of centers separated by at least
    # the narrower bandwidth of the pair (the round-2 artifact had 6 of 12
    # byte-identical components; duplicate detection in _reassign_dead plus
    # the annealed shrinkage schedule prevent the collapse)
    lam = np.asarray(fit.lam)
    for i in range(D):
        for j in range(i + 1, D):
            assert abs(om[i] - om[j]) >= min(lam[i], lam[j]), (
                i, j, om[i], om[j], lam[i], lam[j],
            )


def test_gppad_learn_lengthscale_recovers_timescale():
    """Laplace-evidence grid search (LearnLengthsGPPAD equivalent) picks a
    demodulation timescale within an octave of the generative truth."""
    T, ell_true = 4000, 200.0
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    S = gppad.se_spectrum(T, ell_true, 1.0)
    u = jax.random.normal(k1, (T // 2 + 1,)) + 1j * jax.random.normal(
        jax.random.PRNGKey(3), (T // 2 + 1,)
    )
    x = jnp.fft.irfft(jnp.sqrt(S * T / 2.0) * u, n=T)
    y = jax.nn.softplus(x) * jax.random.normal(k2, (T,))
    ells = [25.0, 50.0, 100.0, 200.0, 400.0, 800.0, 1600.0]
    best, evs = gppad.learn_lengthscale(y, ells, steps=300)
    assert np.all(np.isfinite(np.asarray(evs)))
    assert 0.5 * ell_true <= best <= 2.0 * ell_true, best


def test_tnmf_recovers_smooth_components():
    """tNMF (log-GP temporal priors, ref tnmf.m) recovers a smooth
    factorization and yields smoother components than plain nmf_fp on
    noisy data."""
    T, D, N = 1200, 6, 2
    key = jax.random.PRNGKey(4)
    k1, k2, k3 = jax.random.split(key, 3)
    t = jnp.arange(T)
    H_true = jnp.stack(
        [2.0 + jnp.sin(2 * jnp.pi * t / 400.0),
         1.5 + jnp.cos(2 * jnp.pi * t / 700.0)], axis=-1
    )
    W_true = jax.random.uniform(k1, (D, N), minval=0.3, maxval=1.0)
    A = H_true @ W_true.T
    A = A * jax.random.gamma(k2, 3.0, A.shape) / 3.0  # multiplicative noise

    res = nmf.tnmf(A, N, ell=150.0, iters=600, key=k3)
    Ahat = res.H @ res.W.T
    # gamma(3)/3 multiplicative noise has ~58% relative std; the IS fit
    # tracks the NOISY data, so ~0.2-0.3 residual vs the clean product is
    # the achievable regime (the smoothness prior is what's under test).
    rel = float(jnp.linalg.norm(Ahat - H_true @ W_true.T)
                / jnp.linalg.norm(H_true @ W_true.T))
    assert rel < 0.35, rel

    res_fp = nmf.nmf_fp(A, N, iters=300, restarts=4, key=k3)
    smooth = lambda H: float(jnp.mean(jnp.diff(H, axis=0) ** 2))
    assert smooth(res.H / res.H.mean(0)) < smooth(res_fp.H / res_fp.H.mean(0))

    # H-only inference at the recovered W
    H2 = nmf.tnmf_inf(A, res.W, ell=150.0, iters=200)
    assert np.all(np.isfinite(np.asarray(H2))) and np.all(np.asarray(H2) > 0)


def test_fft_filterbank_matches_steady_kalman():
    """The FFT Wiener filterbank (probFB_FFT equivalent) and the steady
    Kalman filterbank compute the same stationary posterior means, up to
    boundary transients — compare real parts in the interior."""
    D = 3
    sigma2 = jnp.ones((D,))
    ell = jnp.asarray([40.0, 60.0, 80.0])
    omega = jnp.asarray([0.3, 1.0, 2.0])
    noise = 1e-2
    key = jax.random.PRNGKey(9)
    y = jax.random.normal(key, (2000,))

    fb = fb_mod.build_filterbank(sigma2, ell, omega, kernel="exp", noise=noise)
    Zk = fb_mod.steady_filterbank(fb, y).Z
    Zf = fb_mod.fft_filterbank(sigma2, ell, omega, y, kernel="exp",
                               noise=noise)
    sl = slice(300, -300)
    a = np.real(np.asarray(Zk[sl]))
    b = np.real(np.asarray(Zf[sl]))
    # The FFT path uses the continuous-time spectrum; the Kalman path the
    # exact discretized model (folded spectrum) — a few-percent aliasing
    # difference on wide bands is inherent (measured corr 0.998-0.9994).
    for d in range(D):
        r = np.corrcoef(a[:, d], b[:, d])[0, 1]
        assert r > 0.995, (d, r)
        ratio = np.std(b[:, d]) / np.std(a[:, d])
        assert 0.95 < ratio < 1.05, (d, ratio)
        assert np.max(np.abs(a[:, d] - b[:, d])) < 0.3 * np.std(a[:, d])
