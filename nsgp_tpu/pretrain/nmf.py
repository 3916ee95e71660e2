"""Nonnegative matrix factorization with the Itakura-Saito-like cost.

TPU-native re-design of matlab/experiments/nmf/nmf_fp.m (multiplicative
fixed-point updates with random restarts) and nmf_inf_fp.m (H-only
inference), used to initialize the NMF weights W and modulator envelopes
from GPPAD amplitudes (train_model.m:116-129).

Cost (ref nmf.m:10-11):  C(A, Ahat) = sum [ A / Ahat + log Ahat ],
Ahat = H W' (T x D) with H (T, N) temporal components, W (D, N) weights.

Multiplicative updates for this cost (gradient-split form):

    H <- H * [ (A / Ahat^2) W ] / [ (1 / Ahat) W ]
    W <- W * [ (A / Ahat^2)' H ] / [ (1 / Ahat)' H ]

All restarts run batched (vmap over the restart axis) — the reference loops
20 restarts serially (nmf_fp.m:34-58).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-12


class NMFResult(NamedTuple):
    W: jax.Array  # (D, N)
    H: jax.Array  # (T, N)
    cost: jax.Array  # ()


def _cost(A, H, W):
    Ahat = H @ W.T + _EPS
    return jnp.sum(A / Ahat + jnp.log(Ahat))


def _updates(A, H, W):
    Ahat = H @ W.T + _EPS
    R2 = A / (Ahat * Ahat)
    R1 = 1.0 / Ahat
    H = H * (R2 @ W) / (R1 @ W + _EPS)
    Ahat = H @ W.T + _EPS
    R2 = A / (Ahat * Ahat)
    R1 = 1.0 / Ahat
    W = W * (R2.T @ H) / (R1.T @ H + _EPS)
    return H, W


@partial(jax.jit, static_argnums=(1, 2, 3))
def nmf_fp(
    A: jax.Array,  # (T, D) nonnegative data (squared envelopes)
    N: int,
    iters: int = 300,
    restarts: int = 20,
    key: jax.Array | None = None,
) -> NMFResult:
    """Fixed-point NMF with batched random restarts (ref nmf_fp.m:34-58)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    T, D = A.shape
    scale = jnp.sqrt(jnp.mean(A) / N)
    kH, kW = jax.random.split(key)
    H0 = scale * jax.random.uniform(kH, (restarts, T, N), A.dtype, 0.5, 1.5)
    W0 = scale * jax.random.uniform(kW, (restarts, D, N), A.dtype, 0.5, 1.5)

    def run(H, W):
        def body(carry, _):
            H, W = carry
            H, W = _updates(A, H, W)
            return (H, W), None

        (H, W), _ = jax.lax.scan(body, (H, W), None, length=iters)
        return H, W, _cost(A, H, W)

    Hs, Ws, costs = jax.vmap(run)(H0, W0)
    best = jnp.argmin(costs)
    return NMFResult(W=Ws[best], H=Hs[best], cost=costs[best])


@partial(jax.jit, static_argnums=(2,))
def nmf_inf(A: jax.Array, W: jax.Array, iters: int = 300) -> jax.Array:
    """H-only inference at fixed W (ref nmf_inf_fp.m).  Returns H (T, N)."""
    T = A.shape[0]
    N = W.shape[1]
    H = jnp.full((T, N), jnp.sqrt(jnp.mean(A) / N), A.dtype)

    def body(carry, _):
        H = carry
        Ahat = H @ W.T + _EPS
        R2 = A / (Ahat * Ahat)
        R1 = 1.0 / Ahat
        return H * (R2 @ W) / (R1 @ W + _EPS), None

    H, _ = jax.lax.scan(body, H, None, length=iters)
    return H


def order_by_fastness(H: jax.Array, W: jax.Array):
    """Order components by mean squared derivative, fastest first
    (ref train_model.m:126-129)."""
    speed = jnp.mean(jnp.diff(H, axis=0) ** 2, axis=0) / (
        jnp.mean(H**2, axis=0) + _EPS
    )
    order = jnp.argsort(-speed)
    return H[:, order], W[:, order]
