"""GP probabilistic amplitude demodulation (GPPAD) — MAP path.

Slim TPU-native re-implementation of the GPPAD subsystem used by the GT-NMF
training pipeline (ref matlab/experiments/gppad/: GPPAD.m dispatch,
GPModelFast/MAPGPFast.m, GetGPObjFast.m, GetFFTCovFast.m).  Only the MAP
demodulation path is needed (train_model.m:105-113 calls
``GPPAD(real(Z)', fs/10)``); the MCMC/Laplace/cascade machinery of the
reference is unused by the pipeline and is covered by the HMC layer instead.

Model per channel:  y_t = c_t * a(x_t),  c_t ~ N(0, vary),
                    a = softplus link,  x ~ GP(0, SE kernel, lengthscale ell)

MAP objective (x in whitened FFT coordinates u, K = F' S F circulant):

    J(u) = sum_t [ 0.5 y_t^2 / (vary a_t^2) + log a_t ] + 0.5 |u|^2

The circulant GP prior is diagonalized by the real FFT: x = irfft(sqrt(S) u)
— exactly the reference's FFT-structured covariance trick, but optimized by
Adam with autodiff instead of hand-rolled conjugate gradients.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


def se_spectrum(T: int, ell: float, var: float, dtype=jnp.float64):
    """rfft eigenvalues of the circulant SE covariance on a length-T grid."""
    freqs = jnp.arange(T // 2 + 1, dtype=dtype) * (2.0 * jnp.pi / T)
    # SE spectral density: var * sqrt(2 pi) ell exp(-ell^2 w^2 / 2)
    S = var * jnp.sqrt(2.0 * jnp.pi) * ell * jnp.exp(-0.5 * (ell * freqs) ** 2)
    return jnp.maximum(S, 1e-12)


class GPPADResult(NamedTuple):
    envelope: jax.Array  # (T,) or (T, D) positive amplitude a(x)
    carrier: jax.Array  # (T,) or (T, D) y / a(x)
    x: jax.Array  # latent GP path(s)
    obj: jax.Array  # final MAP objective


def _map_objective(u, y, S, vary):
    T = y.shape[-1]
    x = jnp.fft.irfft(jnp.sqrt(S * T) * u, n=T)
    a = jax.nn.softplus(x)
    lik = jnp.sum(0.5 * y * y / (vary * a * a) + jnp.log(a))
    return lik + 0.5 * jnp.sum(jnp.abs(u) ** 2), a


@partial(jax.jit, static_argnums=(2, 3))
def demodulate(
    y: jax.Array,  # (T,) real signal (one channel)
    ell: float,
    steps: int = 600,
    lr: float = 5e-2,
) -> GPPADResult:
    """MAP amplitude demodulation of one channel.

    Equivalent of GPPAD's MAPGPFast (CG on the FFT covariance); ``ell`` is
    the demodulation timescale in samples (the pipeline uses fs/10)."""
    import optax

    T = y.shape[0]
    dtype = y.dtype
    vary = jnp.var(y)
    S = se_spectrum(T, ell, 1.0, dtype)

    u0 = jnp.zeros((T // 2 + 1,), jnp.complex128 if dtype == jnp.float64
                   else jnp.complex64)
    # optimize real/imag stacked to keep optax happy
    ri0 = jnp.stack([u0.real, u0.imag])

    opt = optax.adam(lr)
    state = opt.init(ri0)

    def loss(ri):
        u = ri[0] + 1j * ri[1]
        val, _ = _map_objective(u, y, S, vary)
        return val

    def body(carry, _):
        ri, s = carry
        v, g = jax.value_and_grad(loss)(ri)
        upd, s = opt.update(g, s)
        return (optax.apply_updates(ri, upd), s), v

    (ri, _), vals = jax.lax.scan(body, (ri0, state), None, length=steps)
    u = ri[0] + 1j * ri[1]
    obj, a = _map_objective(u, y, S, vary)
    x = jnp.fft.irfft(jnp.sqrt(S * T) * u, n=T)
    carrier = y / a
    return GPPADResult(envelope=a, carrier=carrier, x=x, obj=obj)


def demodulate_channels(Y: jax.Array, ell: float, steps: int = 600,
                        lr: float = 5e-2) -> GPPADResult:
    """Demodulate D channels at once (vmapped).  Y: (T, D)."""
    out_axes = GPPADResult(envelope=1, carrier=1, x=1, obj=0)  # obj is scalar
    res = jax.vmap(lambda yc: demodulate(yc, ell, steps, lr),
                   in_axes=1, out_axes=out_axes)(Y)
    return res


def laplace_evidence(y: jax.Array, ell: float, steps: int = 400,
                     lr: float = 5e-2) -> jax.Array:
    """Approximate log evidence of the demodulation timescale ``ell``.

    Design equivalent of the reference's Laplace lengthscale objective
    (experiments/gppad/GPModelFast/Laplace/GetLaplaceObjGPPAD*.m): the MAP
    objective plus a circulant (average-curvature) Laplace volume term.  In
    whitened FFT coordinates the posterior Hessian is I + F diag(c_t) F'
    with c_t = d^2 neg-loglik / dx_t^2 scaled by the prior; approximating
    c_t by its mean makes the Hessian circulant, so

        log |H| ~= sum_k log(1 + T * S_k * mean_t(c_t))

    (the reference instead Lanczos-estimates the exact log-det — same
    stationary-envelope regime, much cheaper).
    """
    res = demodulate(y, ell, steps, lr)
    T = y.shape[0]
    dtype = y.dtype
    vary = jnp.var(y)
    S = se_spectrum(T, ell, 1.0, dtype)

    # curvature of the negative log-likelihood in x at the MAP
    def nll_t(x, yt):
        a = jax.nn.softplus(x)
        return 0.5 * yt * yt / (vary * a * a) + jnp.log(a)

    c = jax.vmap(jax.grad(jax.grad(nll_t)))(res.x, y)
    cbar = jnp.maximum(jnp.mean(c), 0.0)
    # rfft spectrum double-counts interior bins relative to the full T-point
    # eigenvalue multiset; count each non-DC/non-Nyquist bin twice.
    mult = jnp.full(S.shape, 2.0, dtype).at[0].set(1.0)
    if T % 2 == 0:
        mult = mult.at[-1].set(1.0)
    logdet = jnp.sum(mult * jnp.log1p(S * T * cbar))
    return -res.obj - 0.5 * logdet


def learn_lengthscale(y: jax.Array, ells, steps: int = 400,
                      lr: float = 5e-2):
    """Grid-search the demodulation timescale by approximate evidence.

    Equivalent of the reference's LearnLengthsGPPAD (bisection/grid over the
    Laplace objective); returns (best_ell, evidences (len(ells),)).
    """
    evs = jnp.stack([laplace_evidence(y, float(e), steps, lr) for e in ells])
    best = int(jnp.argmax(evs))
    return float(ells[best]), evs
