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


# ---------------------------------------------------------------------------
# Temporal NMF (tNMF): log-GP smoothness priors on the components
# ---------------------------------------------------------------------------


class TNMFResult(NamedTuple):
    W: jax.Array  # (D, N)
    H: jax.Array  # (T, N) positive, temporally smooth components
    cost: jax.Array  # () final MAP objective


def _se_quad_penalty(T: int, ell, var, dtype):
    """rfft eigenvalues of the circulant SE prior on log H (per component).

    The penalty 0.5 * sum_k |rfft(logH)_k|^2 * mult_k / (T * S_k) is the
    exact log-GP negative log-prior for a circulant SE covariance — the
    reference's tnmf.m temporal prior, FFT-diagonalized.
    """
    freqs = jnp.arange(T // 2 + 1, dtype=dtype) * (2.0 * jnp.pi / T)
    S = var * jnp.sqrt(2.0 * jnp.pi) * ell * jnp.exp(-0.5 * (ell * freqs) ** 2)
    S = jnp.maximum(S, 1e-10)
    mult = jnp.full((T // 2 + 1,), 2.0, dtype).at[0].set(1.0)
    if T % 2 == 0:
        mult = mult.at[-1].set(1.0)
    return mult / (T * S)


@partial(jax.jit, static_argnums=(1, 3))
def tnmf(
    A: jax.Array,  # (T, D) nonnegative data
    N: int,
    ell=200.0,  # temporal lengthscale(s) of the log-GP prior, samples
    iters: int = 500,
    var: float = 4.0,
    lr: float = 5e-2,
    key: jax.Array | None = None,
) -> TNMFResult:
    """Temporal NMF: IS cost + SE log-GP smoothness priors on the components.

    Design equivalent of the reference's tnmf.m (log-Gaussian temporal
    priors on H, getObj_nmf_temp.m objective): optimized jointly in
    (log H, log W) by Adam with the prior FFT-diagonalized, instead of the
    reference's conjugate gradients.
    """
    import optax

    if key is None:
        key = jax.random.PRNGKey(0)
    T, D = A.shape
    dtype = A.dtype
    ell = jnp.broadcast_to(jnp.asarray(ell, dtype), (N,))
    pen = jax.vmap(lambda e: _se_quad_penalty(T, e, var, dtype))(ell)  # (N, F)

    scale = jnp.sqrt(jnp.mean(A) / N)
    kH, kW = jax.random.split(key)
    lH0 = jnp.log(scale) + 0.1 * jax.random.normal(kH, (T, N), dtype)
    lW0 = jnp.log(scale) + 0.1 * jax.random.normal(kW, (D, N), dtype)

    def objective(p):
        lH, lW = p
        H = jnp.exp(lH)
        Ahat = H @ jnp.exp(lW).T + _EPS
        is_cost = jnp.sum(A / Ahat + jnp.log(Ahat))
        # log-GP prior on each component's log-trajectory (zero-mean about
        # its own mean level, so the prior shapes smoothness, not scale)
        lHc = lH - jnp.mean(lH, axis=0, keepdims=True)
        F = jnp.fft.rfft(lHc, axis=0)  # (F, N)
        prior = 0.5 * jnp.sum((jnp.abs(F) ** 2) * pen.T)
        return is_cost + prior

    opt = optax.adam(lr)

    def body(carry, _):
        p, s = carry
        val, g = jax.value_and_grad(objective)(p)
        upd, s = opt.update(g, s)
        return (optax.apply_updates(p, upd), s), val

    (p, _), vals = jax.lax.scan(body, ((lH0, lW0), opt.init((lH0, lW0))),
                                None, length=iters)
    lH, lW = p
    return TNMFResult(W=jnp.exp(lW), H=jnp.exp(lH), cost=vals[-1])


@partial(jax.jit, static_argnums=(3,))
def tnmf_inf(
    A: jax.Array, W: jax.Array, ell=200.0, iters: int = 400,
    var: float = 4.0, lr: float = 5e-2,
) -> jax.Array:
    """H-only temporal-NMF inference at fixed W (ref tnmf_inf.m)."""
    import optax

    T = A.shape[0]
    N = W.shape[1]
    dtype = A.dtype
    ell = jnp.broadcast_to(jnp.asarray(ell, dtype), (N,))
    pen = jax.vmap(lambda e: _se_quad_penalty(T, e, var, dtype))(ell)
    lH0 = jnp.full((T, N), jnp.log(jnp.sqrt(jnp.mean(A) / N)), dtype)

    def objective(lH):
        H = jnp.exp(lH)
        Ahat = H @ W.T + _EPS
        is_cost = jnp.sum(A / Ahat + jnp.log(Ahat))
        lHc = lH - jnp.mean(lH, axis=0, keepdims=True)
        F = jnp.fft.rfft(lHc, axis=0)
        return is_cost + 0.5 * jnp.sum((jnp.abs(F) ** 2) * pen.T)

    opt = optax.adam(lr)

    def body(carry, _):
        lH, s = carry
        _, g = jax.value_and_grad(objective)(lH)
        upd, s = opt.update(g, s)
        return (optax.apply_updates(lH, upd), s), None

    (lH, _), _ = jax.lax.scan(body, (lH0, opt.init(lH0)), None, length=iters)
    return jnp.exp(lH)
