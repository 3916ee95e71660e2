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

    # 2. steady-state Kalman filterbank transform
    fb = fb_mod.build_filterbank(
        fit.sigma2, sub_len, fit.omega, kernel=kernel1, noise=fit.noise
    )
    Z = fb_mod.steady_filterbank(fb, y).Z  # (T, D) complex

    # 3. GPPAD envelopes at timescale fs/10 samples (ref train_model.m:105,
    #    used directly as the SE lengthscale in GetFFTCovFast.m)
    env = gppad.demodulate_channels(
        jnp.real(Z).astype(y.dtype), ell=float(fs) / 10.0, steps=400
    ).envelope  # (T, D)

    # 4. NMF of the (squared, for 'sq') envelopes -> W (D, N), H (T, N)
    A = env**2 if variant == "sq" else env
    res = nmf.nmf_fp(A, N, iters=200, restarts=8, key=jax.random.PRNGKey(seed))
    H, W = nmf.order_by_fastness(res.H, res.W)
    # normalize components to mean 1 (scale absorbed into W)
    scale = jnp.mean(H, axis=0)
    H = H / scale[None, :]
    W = W * scale[None, :]

    # 5. SE-GP Whittle fits to inverse-softplus components
    g_lat = _inv_softplus(H)
    fits = [segp.fit_segp(g_lat[:, n]) for n in range(N)]
    mod_var = jnp.stack([f.var for f in fits])
    mod_len = jnp.clip(jnp.stack([f.ell for f in fits]), 10.0, T / 2.0)

    model = GTNMFModel(
        D=D, N=N, kernel1=kernel1, kernel2=kernel2,
        variant=variant, p_cubature=p_cubature,
    )
    params = GTNMFParams(
        lik=fit.noise,
        sub_var=fit.sigma2,
        sub_len=sub_len,
        omega=fit.omega,
        mod_var=mod_var,
        mod_len=mod_len,
        W=W,
    )
    return TrainedModel(model=model, params=params, envelopes=env, H=H)


# ---------------------------------------------------------------------------
# Artifact IO (.npz; reference uses .mat stage files)
# ---------------------------------------------------------------------------


def save_trained(path: str, tm: TrainedModel) -> None:
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
    )


def load_trained(path: str):
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
    return model, params
