"""End-to-end GT-NMF initialization pipeline (training without fminunc).

TPU-native equivalent of experiments/train_GTFNMF_fixed_params.m (the
pipeline the paper's experiment drivers actually call — initialization-only,
fully reproducible):

    fit_probSTFT_SD  ->  kernel_ss_probFB  ->  GPPAD  ->  nmf_fp
                     ->  trainSEGP_RS      ->  trained params artifact

Stage mapping (ref train_model.m:85-149):
  1. fit_probstft      : D spectral-mixture components from the Welch
                         spectrum (Whittle ML, coarse-to-fine).
  2. steady_filterbank : complex subband coefficients Z (steady Kalman).
  3. demodulate        : positive envelopes of real(Z) at timescale fs/10.
  4. nmf_fp            : N nonnegative temporal components + weights W,
                         ordered fastest-first.
  5. fit_segp          : modulator (variance, lengthscale) from the
                         inverse-softplus NMF components.

Artifacts are plain ``.npz`` files (the reference uses ``.mat``); the keys
mirror GTNMFParams fields.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nsgp_tpu.models.gtnmf import GTNMFModel, GTNMFParams
from nsgp_tpu.pretrain import filterbank as fb_mod
from nsgp_tpu.pretrain import gppad, nmf, segp, spectral


class TrainedModel(NamedTuple):
    model: GTNMFModel
    params: GTNMFParams
    envelopes: jax.Array  # (T, D) GPPAD envelopes (diagnostic)
    H: jax.Array  # (T, N) NMF components (diagnostic)
    # Stationary spectral fit from stage 1 (needed by the denoising Wiener
    # baseline — reuse instead of refitting; ADVICE r3).  None on artifacts
    # saved before this field existed.
    fit: object = None
    normaliser: float = 1.0  # ref train_GTFNMF_fixed_params.m:14
    fs: float = 16000.0


def _inv_softplus(x):
    # stable inverse of log(1 + exp(.))
    return jnp.where(x > 20.0, x, jnp.log(jnp.expm1(jnp.maximum(x, 1e-8))))


def train_gtnmf_fixed_params(
    y,
    D: int = 16,
    N: int = 3,
    kernel1: str = "matern32",
    kernel2: str = "matern52",
    variant: str = "sq",
    fs: float = 16000.0,
    p_cubature: int = 9,
    seed: int = 0,
    filterbank_kwargs: Optional[dict] = None,
) -> TrainedModel:
    """Initialize a GT-NMF model from a raw signal, no likelihood opt.

    Equivalent call: train_GTFNMF_fixed_params(y, D, N, kernel, ...).
    """
    y = jnp.asarray(y)
    y = y / jnp.std(y)
    T = y.shape[0]

    # 1. spectral-mixture filterbank fit (coarse-to-fine Whittle), staged
    #    exp -> kernel1 per the reference recipe, with dead-component
    #    reassignment and exit variance rescaling (fit_probSTFT_SD.m)
    fbkw = dict(num_levels=3, steps_per_level=400)
    fbkw.update(filterbank_kwargs or {})
    fit = spectral.fit_probstft_staged(y, D, kernel=kernel1, **fbkw)
    sub_len = fit.lengthscales(kernel1)

    # 2. steady-state Kalman filterbank transform.  The reference passes
    #    vary = 0 here (train_GTFNMF_fixed_params.m:64); our steady path
    #    needs a positive noise for the DARE bank, and the annealed-beta
    #    Whittle fit can drive the fitted noise to ~0, so floor it.
    fb = fb_mod.build_filterbank(
        fit.sigma2, sub_len, fit.omega, kernel=kernel1,
        noise=jnp.maximum(fit.noise, 1e-6),
    )
    Z = fb_mod.steady_filterbank(fb, y).Z  # (T, D) complex

    # 3. GPPAD envelopes at timescale fs/10 samples (ref train_model.m:105,
    #    used directly as the SE lengthscale in GetFFTCovFast.m)
    env = gppad.demodulate_channels(
        jnp.real(Z).astype(y.dtype), ell=float(fs) / 10.0, steps=400
    ).envelope  # (T, D)

    # 4. NMF of the envelopes -> W (D, N), H (T, N).  The reference feeds
    #    the GPPAD modulators directly for BOTH variants
    #    (train_GTFNMF_fixed_params.m:82 `nmf_fp(mods, ...)`).
    res = nmf.nmf_fp(env, N, iters=200, restarts=8, key=jax.random.PRNGKey(seed))
    H, W = nmf.order_by_fastness(res.H, res.W)
    # normalize components to mean 1 (scale absorbed into W)
    scale = jnp.mean(H, axis=0)
    H = H / scale[None, :]
    W = W * scale[None, :]

    # 5. SE-GP Whittle fits to the thresholded, smoothed, mean-subtracted
    #    log-latents, exactly per the reference (:95-111): logHthresh =
    #    softplus^-1(H + 1e-2), smoothed with the softplus-bump filter
    #    filt = softplus(-x^2/2)/sum over x in [-100, 100], mean removed,
    #    and the fitted (var, len) scaled by 1.5 at save time (:127).
    g_lat = _inv_softplus(H + 1e-2)
    x = jnp.arange(-100, 101, dtype=y.dtype)
    filt = jax.nn.softplus(-0.5 * x**2)
    filt = filt / jnp.sum(filt)
    g_sm = jnp.stack(
        [jnp.convolve(g_lat[:, n], filt, mode="same") for n in range(N)],
        axis=-1,
    )
    mux = jnp.mean(g_sm, axis=0)
    fits = [segp.fit_segp(g_sm[:, n] - mux[n]) for n in range(N)]
    mod_var = 1.5 * jnp.stack([f.var for f in fits])
    mod_len = jnp.clip(1.5 * jnp.stack([f.ell for f in fits]), 10.0, T / 2.0)

    model = GTNMFModel(
        D=D, N=N, kernel1=kernel1, kernel2=kernel2,
        variant=variant, p_cubature=p_cubature,
    )
    params = GTNMFParams(
        # Experiments set their own w_lik (denoising: the noise level,
        # missing data: small); the floored fit noise is only a default.
        lik=jnp.maximum(fit.noise, 1e-4),
        # The reference saves FIXED subband variances 0.06, not the fitted
        # ones — modulation absorbs the scale (:126 `param1 = 0.06*ones`).
        sub_var=jnp.full((D,), 0.06, y.dtype),
        sub_len=sub_len,
        omega=fit.omega,
        mod_var=mod_var,
        mod_len=mod_len,
        W=W,
    )
    return TrainedModel(model=model, params=params, envelopes=env, H=H,
                        fit=fit, fs=float(fs))


# ---------------------------------------------------------------------------
# Artifact IO (.npz; reference uses .mat stage files)
# ---------------------------------------------------------------------------


def save_trained(path: str, tm: TrainedModel) -> None:
    extra = {}
    if tm.fit is not None:
        # stage-1 stationary fit, reused by the Wiener denoising baseline
        extra = dict(
            fb_sigma2=np.asarray(tm.fit.sigma2),
            fb_lam=np.asarray(tm.fit.lam),
            fb_omega=np.asarray(tm.fit.omega),
            fb_noise=np.asarray(tm.fit.noise),
        )
    np.savez(
        path,
        D=tm.model.D, N=tm.model.N,
        kernel1=tm.model.kernel1, kernel2=tm.model.kernel2,
        variant=tm.model.variant, p_cubature=tm.model.p_cubature,
        lik=np.asarray(tm.params.lik),
        sub_var=np.asarray(tm.params.sub_var),
        sub_len=np.asarray(tm.params.sub_len),
        omega=np.asarray(tm.params.omega),
        mod_var=np.asarray(tm.params.mod_var),
        mod_len=np.asarray(tm.params.mod_len),
        W=np.asarray(tm.params.W),
        normaliser=float(tm.normaliser),
        fs=float(tm.fs),
        **extra,
    )


def load_trained(path: str, full: bool = False):
    """Load a trained artifact.  With ``full=True`` returns a TrainedModel
    (fit/normaliser/fs populated when present); default returns the legacy
    (model, params) pair."""
    z = np.load(path, allow_pickle=True)
    model = GTNMFModel(
        D=int(z["D"]), N=int(z["N"]),
        kernel1=str(z["kernel1"]), kernel2=str(z["kernel2"]),
        variant=str(z["variant"]), p_cubature=int(z["p_cubature"]),
    )
    params = GTNMFParams(
        lik=jnp.asarray(z["lik"]), sub_var=jnp.asarray(z["sub_var"]),
        sub_len=jnp.asarray(z["sub_len"]), omega=jnp.asarray(z["omega"]),
        mod_var=jnp.asarray(z["mod_var"]), mod_len=jnp.asarray(z["mod_len"]),
        W=jnp.asarray(z["W"]),
    )
    if not full:
        return model, params
    fit = None
    if "fb_sigma2" in z:
        fit = spectral.FilterbankFit(
            sigma2=jnp.asarray(z["fb_sigma2"]), lam=jnp.asarray(z["fb_lam"]),
            omega=jnp.asarray(z["fb_omega"]), noise=jnp.asarray(z["fb_noise"]),
            obj=jnp.zeros(()),
        )
    return TrainedModel(
        model=model, params=params, envelopes=None, H=None, fit=fit,
        normaliser=float(z["normaliser"]) if "normaliser" in z else 1.0,
        fs=float(z["fs"]) if "fs" in z else 16000.0,
    )
