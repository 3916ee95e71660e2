"""SE-GP spectral (Whittle) fits for modulator hyperparameters.

TPU-native re-design of matlab/experiments/toolsGP/trainSEGP_RS.m: fit the
(variance, lengthscale) of an SE GP to a regularly sampled signal by
maximizing the spectral-domain (Whittle) likelihood

    -0.5 sum_k [ log S(w_k) + I(w_k) / S(w_k) ]

where I is the periodogram and S the SE spectral density plus a small noise
floor.  Used to set modulator lengthscales/variances from smoothed
log-NMF components (train_model.m:136-149).  Adam + autodiff instead of
Rasmussen CG.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class SEGPFit(NamedTuple):
    var: jax.Array  # ()
    ell: jax.Array  # () lengthscale in samples
    noise: jax.Array
    obj: jax.Array


def _se_spec(var, ell, w):
    return var * jnp.sqrt(2.0 * jnp.pi) * ell * jnp.exp(-0.5 * (ell * w) ** 2)


@partial(jax.jit, static_argnums=(1, 2))
def fit_segp(y: jax.Array, steps: int = 500, lr: float = 5e-2) -> SEGPFit:
    """Whittle-ML fit of SE-GP (var, ell) to a 1-D signal."""
    import optax

    y = y - jnp.mean(y)
    T = y.shape[0]
    I = jnp.abs(jnp.fft.rfft(y)) ** 2 / T
    w = jnp.arange(T // 2 + 1, dtype=y.dtype) * (2.0 * jnp.pi / T)
    I, w = I[1:], w[1:]  # drop DC

    vy = jnp.var(y)
    p0 = jnp.log(jnp.asarray([vy, T / 20.0, vy * 1e-2], y.dtype))

    def nll(p):
        var, ell, noise = jnp.exp(p)
        S = _se_spec(var, ell, w) + noise
        return jnp.sum(jnp.log(S) + I / S)

    opt = optax.adam(lr)
    state = opt.init(p0)

    def body(carry, _):
        p, s = carry
        v, g = jax.value_and_grad(nll)(p)
        upd, s = opt.update(g, s)
        return (optax.apply_updates(p, upd), s), v

    (p, _), vals = jax.lax.scan(body, (p0, state), None, length=steps)
    var, ell, noise = jnp.exp(p)
    return SEGPFit(var=var, ell=ell, noise=noise, obj=vals[-1])
