"""Source separation: joint inference over stacked pre-trained models.

TPU-native equivalent of experiments/source_sep_piano.m: load J pre-trained
GT-NMF models, stack them block-diagonally (models/mixture.py), run a
standard engine on the mixture signal, and read off per-source posterior
signals.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from nsgp_tpu.models import mixture
from nsgp_tpu.models.gtnmf import GTNMFModel, GTNMFParams
from nsgp_tpu.utils import metrics


class SeparationResult(NamedTuple):
    sources: jax.Array  # (T, J) per-source signal estimates
    snr: jax.Array | None  # (J,) SNR vs ground-truth parts, if given
    result: object


def separate(
    models: Sequence[GTNMFModel],
    params: Sequence[GTNMFParams],
    y_mix: jax.Array,
    engine: str = "ihgp",
    true_sources: jax.Array | None = None,  # (T, J)
    key: jax.Array | None = None,
    n_samples: int = 20,
    mixture_lik: float | None = None,
    **engine_kwargs,
) -> SeparationResult:
    """Joint EP over the stacked model (ref source_sep_piano.m:50-145:
    ihgp_ep_mods_nmf_mixture with 10 EP iters, damping 0.025).

    ``mixture_lik``: explicit observation-noise variance for the mixture
    (the reference passes one, source_sep_piano.m:84-88); defaults to the
    mean of the sources' trained noises."""
    from nsgp_tpu.inference import registry

    jm, jp, slices = mixture.join_models(models, params, lik=mixture_lik)
    if engine == "ep" and engine_kwargs.get("backend") == "pallas":
        # TPU path for the joint model (ref gf_ep_mods_nmf_mixture.m at
        # J=3: 48 subbands + 9 modulators): the host-loop batched engine
        # at BF=1 gives (i) per-sweep executions that stay under the
        # TPU-tunnel watchdog and avoid the fused-program miscompile seen
        # at C > 19 (inference.batched.ep_infer_batch docstring), and
        # (ii) sigma-point chunking (config.s_chunk) so the N=9 ut9
        # cubature (3973 points) never overflows the fused kernel's VMEM.
        from nsgp_tpu.inference import batched as bt
        from nsgp_tpu.inference.ep import EPConfig

        cfg = EPConfig(**engine_kwargs)
        rb = bt.ep_infer_batch(
            jm, jax.tree.map(lambda x: x[None], jp),
            jnp.asarray(y_mix)[None], None, cfg,
        )
        res = rb._replace(Eft=rb.Eft[0], Varft=rb.Varft[0],
                          nlZ=rb.nlZ[0], maxdiff=rb.maxdiff[0])
    else:
        res = registry.infer(engine, jm, jp, y_mix, None, **engine_kwargs)

    if key is None:
        key = jax.random.PRNGKey(0)
    sources = mixture.source_signals(
        jm, jp, slices, res.Eft, res.Varft, key, n_samples
    )
    snr = None
    if true_sources is not None:
        snr = jnp.stack(
            [
                metrics.snr_db(true_sources[:, j], sources[:, j])
                for j in range(sources.shape[1])
            ]
        )
    return SeparationResult(sources=sources, snr=snr, result=res)
