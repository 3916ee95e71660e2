"""Missing-data synthesis / inpainting application.

TPU-native equivalent of experiments/missing_data_music.m /
test_missing_data.m: NaN out gap regions of the signal, run any engine
(EP / IHGP / GIEKF — zero model changes), reconstruct the signal inside the
gaps from the posterior, report RMSE over gaps and SNR.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from nsgp_tpu.models.gtnmf import GTNMFModel, GTNMFParams
from nsgp_tpu.utils import metrics


def make_gap_mask(T: int, gaps: Sequence[tuple]) -> jax.Array:
    """mask True = observed; gaps are (start, length) pairs
    (ref missing_data_music.m: 6 gaps of 10-320 samples)."""
    mask = jnp.ones((T,), bool)
    for start, length in gaps:
        mask = mask.at[start : start + length].set(False)
    return mask


def reconstruct_signal(
    model: GTNMFModel,
    params: GTNMFParams,
    Eft: jax.Array,  # (T, C)
    Varft: jax.Array | None = None,
    key: jax.Array | None = None,
    n_samples: int = 0,
) -> jax.Array:
    """Posterior signal estimate E[sum_d a_d z_d].

    With samples (ref missing_data_music.m:170-175 uses MC through the
    link): channel-factorized MC over the smoothed marginals; otherwise the
    plug-in mean.
    """
    from nsgp_tpu.ops.moments import LINKS

    D = model.D
    link = LINKS[model.link]

    def amps(g):
        a = link(g) @ params.W.T
        if model.variant == "sq":
            a = jnp.sqrt(jnp.maximum(a, 1e-12))
        return a

    z_mu, g_mu = Eft[:, :D], Eft[:, D:]
    if n_samples and Varft is not None and key is not None:
        kz, kg = jax.random.split(key)
        z_sd = jnp.sqrt(jnp.maximum(Varft[:, :D], 0.0))
        g_sd = jnp.sqrt(jnp.maximum(Varft[:, D:], 0.0))
        z = z_mu[None] + z_sd[None] * jax.random.normal(kz, (n_samples,) + z_mu.shape, z_mu.dtype)
        g = g_mu[None] + g_sd[None] * jax.random.normal(kg, (n_samples,) + g_mu.shape, g_mu.dtype)
        return jnp.mean(jnp.sum(z * amps(g), axis=-1), axis=0)
    return jnp.sum(z_mu * amps(g_mu), axis=-1)


class GapFillResult(NamedTuple):
    y_hat: jax.Array  # (T,) reconstructed signal
    rmse_gaps: jax.Array  # () RMSE inside the gaps
    snr_gaps: jax.Array  # () SNR (dB) inside the gaps
    result: object  # underlying engine result


def fill_gaps_batch(
    model: GTNMFModel,
    paramsB: GTNMFParams,  # leaves with leading (BF,) file axis
    y_trueB: jax.Array,  # (BF, T) clean signals
    maskB: jax.Array,  # (BF, T) True = observed
    engine: str = "ep",
    key: jax.Array | None = None,
    n_samples: int = 20,
    metric_gapsB: jax.Array | None = None,
    **engine_kwargs,
) -> GapFillResult:
    """Batched fill_gaps: BF files through one compiled inference program
    (see nsgp_tpu.inference.batched).  Returns per-file metric arrays (BF,).

    Replaces the reference's serial corpus loop (missing_data_music.m:43-133)
    with one batched pass per (engine, config) — the chip-utilization fix
    for corpus grids (VERDICT r4 next-item 1)."""
    from nsgp_tpu.inference import batched as bt

    y_obsB = jnp.where(maskB, y_trueB, jnp.nan)
    res = bt.infer_batch(engine, model, paramsB, y_obsB, maskB,
                         **engine_kwargs)

    if key is None:
        key = jax.random.PRNGKey(0)
    BF = y_trueB.shape[0]
    keys = jax.random.split(key, BF)
    y_hatB = _reconstruct_batch(model, paramsB, res.Eft, res.Varft, keys,
                                n_samples)
    gapB = ~maskB if metric_gapsB is None else metric_gapsB
    rmseB = jax.vmap(metrics.rmse)(y_trueB, y_hatB, gapB)
    snrB = jax.vmap(metrics.snr_db)(y_trueB, y_hatB, gapB)
    if hasattr(res, "ms") and hasattr(res, "Ps"):
        # drop the dense state trajectories (GIEKF: ~1.2 GB per file) —
        # batch callers only consume moments and metrics
        res = res._replace(ms=None, Ps=None)
    return GapFillResult(y_hat=y_hatB, rmse_gaps=rmseB, snr_gaps=snrB,
                         result=res)


@partial(jax.jit, static_argnums=(0, 5))
def _reconstruct_batch(model, paramsB, EftB, VarftB, keys, n_samples):
    return jax.vmap(
        lambda p, e, v, k: reconstruct_signal(model, p, e, v, k, n_samples)
    )(paramsB, EftB, VarftB, keys)


def fill_gaps(
    model: GTNMFModel,
    params: GTNMFParams,
    y_true: jax.Array,  # clean signal (ground truth for metrics)
    mask: jax.Array,  # True = observed
    engine: str = "ep",
    key: jax.Array | None = None,
    n_samples: int = 20,
    metric_gaps: jax.Array | None = None,  # True = score here; default ~mask
    **engine_kwargs,
) -> GapFillResult:
    """Run inference with masked observations and score the reconstruction.

    Ref missing_data_music.m:119-175 (engines x ep_itts sweeps).
    ``metric_gaps`` separates the scored region from the observation mask —
    needed when the signal is zero-padded to a uniform compile shape (the
    padding is unobserved but must not count as a gap).
    """
    from nsgp_tpu.inference import registry

    y_obs = jnp.where(mask, y_true, jnp.nan)
    res = registry.infer(engine, model, params, y_obs, mask, **engine_kwargs)

    if key is None:
        key = jax.random.PRNGKey(0)
    y_hat = reconstruct_signal(model, params, res.Eft, res.Varft, key, n_samples)
    gap = ~mask if metric_gaps is None else metric_gaps
    return GapFillResult(
        y_hat=y_hat,
        rmse_gaps=metrics.rmse(y_true, y_hat, gap),
        snr_gaps=metrics.snr_db(y_true, y_hat, gap),
        result=res,
    )
