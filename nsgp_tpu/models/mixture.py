"""Mixture-of-models assembly for source separation.

TPU-native equivalent of experiments/gf_ep_mods_nmf_mixture.m:90-128 and
ihgp_ep_mods_nmf_mixture.m: J pre-trained GT-NMF models are stacked —
subbands first, then modulators — with block-diagonal NMF weights, and the
standard engines run unchanged on the joint model against the mixture
signal.  Assembly is a pure pytree concatenation; no new inference code.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from nsgp_tpu.models.gtnmf import GTNMFModel, GTNMFParams


class SourceSlices(NamedTuple):
    """Channel index ranges of each source inside the joint model."""

    sub: tuple  # tuple of (start, stop) into the subband block [0, D_tot)
    mod: tuple  # tuple of (start, stop) into the modulator block [0, N_tot)


def join_models(
    models: Sequence[GTNMFModel], params: Sequence[GTNMFParams],
    lik: float | None = None,
):
    """Stack J models into one joint GT-NMF model.

    Returns (joint_model, joint_params, slices).  All models must share
    kernels/link/variant (the reference stacks identically-structured
    per-note models).  ``lik`` is the explicit mixture observation-noise
    variance (the reference passes one, source_sep_piano.m:84-88); if None,
    defaults to the mean of the sources' trained noises.
    """
    m0 = models[0]
    for m in models[1:]:
        if (m.kernel1, m.kernel2, m.link, m.variant) != (
            m0.kernel1, m0.kernel2, m0.link, m0.variant,
        ):
            raise ValueError("mixture models must share kernels/link/variant")

    D_tot = sum(m.D for m in models)
    N_tot = sum(m.N for m in models)
    joint_model = m0._replace(D=D_tot, N=N_tot)

    W = jax.scipy.linalg.block_diag(*[p.W for p in params])
    if lik is None:
        lik_j = jnp.mean(jnp.stack([jnp.asarray(p.lik) for p in params]))
    else:
        lik_j = jnp.asarray(lik, jnp.asarray(params[0].lik).dtype)
    joint_params = GTNMFParams(
        lik=lik_j,
        sub_var=jnp.concatenate([p.sub_var for p in params]),
        sub_len=jnp.concatenate([p.sub_len for p in params]),
        omega=jnp.concatenate([p.omega for p in params]),
        mod_var=jnp.concatenate([p.mod_var for p in params]),
        mod_len=jnp.concatenate([p.mod_len for p in params]),
        W=W,
    )

    sub_sl, mod_sl = [], []
    d = n = 0
    for m in models:
        sub_sl.append((d, d + m.D))
        mod_sl.append((n, n + m.N))
        d += m.D
        n += m.N
    return joint_model, joint_params, SourceSlices(tuple(sub_sl), tuple(mod_sl))


def source_signals(
    joint_model: GTNMFModel,
    joint_params: GTNMFParams,
    slices: SourceSlices,
    Eft: jax.Array,  # (T, D_tot + N_tot) posterior observable means
    Varft: jax.Array | None = None,  # optional marginal variances for MC
    key: jax.Array | None = None,
    n_samples: int = 0,
):
    """Per-source posterior signal estimates.

    Ref source_sep_piano.m:210-227: s_j = sum_{d in source j} a_d z_d with
    a = link-amplitudes from the joint modulators.  With n_samples == 0 the
    plug-in posterior mean is used; otherwise Monte-Carlo over the marginal
    posteriors (channel-factorized, like the reference's sampling of the
    smoothed marginals).
    Returns (T, J) per-source signals.
    """
    from nsgp_tpu.ops.moments import LINKS

    D = joint_model.D
    link = LINKS[joint_model.link]

    def amps_from(g):  # g: (..., N_tot) -> (..., D_tot)
        a = link(g) @ joint_params.W.T
        if joint_model.variant == "sq":
            a = jnp.sqrt(jnp.maximum(a, 1e-12))
        return a

    z_mu, g_mu = Eft[:, :D], Eft[:, D:]
    if n_samples and Varft is not None and key is not None:
        kz, kg = jax.random.split(key)
        z_sd = jnp.sqrt(jnp.maximum(Varft[:, :D], 0.0))
        g_sd = jnp.sqrt(jnp.maximum(Varft[:, D:], 0.0))
        z = z_mu[None] + z_sd[None] * jax.random.normal(
            kz, (n_samples,) + z_mu.shape, z_mu.dtype
        )
        g = g_mu[None] + g_sd[None] * jax.random.normal(
            kg, (n_samples,) + g_mu.shape, g_mu.dtype
        )
        contrib = z * amps_from(g)  # (S, T, D_tot)
        contrib = jnp.mean(contrib, axis=0)
    else:
        contrib = z_mu * amps_from(g_mu)

    out = []
    for lo, hi in slices.sub:
        out.append(jnp.sum(contrib[:, lo:hi], axis=-1))
    return jnp.stack(out, axis=-1)
