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
