"""Covariance kernels -> LTI SDE (state-space) conversions.

TPU-native re-design of the reference's ``cf_*_to_ss.m`` family
(reference: matlab/unifying_prob_tf/cf_exp_to_ss.m, cf_matern32_to_ss.m,
cf_matern52_to_ss.m, cf_matern72_to_ss.m, cf_se_to_ss.m).

Each kernel maps hyperparameters (magnitude sigma2, lengthscale ell) to a
small continuous-time model ``(F, L, Qc, H, Pinf)`` with

    dx/dt = F x + L w(t),   w ~ white noise with spectral density Qc,
    f(t)  = H x(t),         x(inf) ~ N(0, Pinf).

Unlike the reference we return dense per-channel blocks as JAX arrays and
obtain parameter derivatives via autodiff (jax.jacfwd) instead of hand-coded
dF/dQc/dPinf stacks.  All functions are jit/vmap-safe and dtype-polymorphic.

The SE kernel requires polynomial root finding for its Taylor-approximated
spectrum; roots of the (fixed-order) polynomial are computed eagerly with
numpy when parameters are concrete, or via a closed-form-free companion
eigendecomposition under trace (see ``se_to_ss``).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class StateSpace(NamedTuple):
    """Single-channel continuous-time state-space model."""

    F: jax.Array  # (tau, tau)
    L: jax.Array  # (tau, q)
    Qc: jax.Array  # (q, q)
    H: jax.Array  # (1, tau)
    Pinf: jax.Array  # (tau, tau)


# ---------------------------------------------------------------------------
# Matern family (exact SDE forms)
# ---------------------------------------------------------------------------


def exp_to_ss(sigma2, ell, dtype=None) -> StateSpace:
    """Exponential (Matern-1/2, OU) kernel.  Ref: cf_exp_to_ss.m:92-146."""
    sigma2 = jnp.asarray(sigma2, dtype)
    ell = jnp.asarray(ell, dtype)
    dt_ = sigma2.dtype
    F = jnp.reshape(-1.0 / ell, (1, 1))
    L = jnp.ones((1, 1), dt_)
    Qc = jnp.reshape(2.0 * sigma2 / ell, (1, 1))
    H = jnp.ones((1, 1), dt_)
    Pinf = jnp.reshape(sigma2, (1, 1))
    return StateSpace(F, L, Qc, H, Pinf)


def matern32_to_ss(sigma2, ell, dtype=None) -> StateSpace:
    """Matern-3/2 kernel.  Ref: cf_matern32_to_ss.m:93-116."""
    sigma2 = jnp.asarray(sigma2, dtype)
    ell = jnp.asarray(ell, dtype)
    dt_ = sigma2.dtype
    lam = jnp.sqrt(jnp.asarray(3.0, dt_)) / ell
    z = jnp.zeros((), dt_)
    F = jnp.stack(
        [jnp.stack([z, jnp.ones((), dt_)]), jnp.stack([-(lam**2), -2.0 * lam])]
    )
    L = jnp.array([[0.0], [1.0]], dt_)
    Qc = jnp.reshape(12.0 * jnp.sqrt(jnp.asarray(3.0, dt_)) / ell**3 * sigma2, (1, 1))
    H = jnp.array([[1.0, 0.0]], dt_)
    Pinf = jnp.diag(jnp.stack([sigma2, 3.0 * sigma2 / ell**2]))
    return StateSpace(F, L, Qc, H, Pinf)


def matern52_to_ss(sigma2, ell, dtype=None) -> StateSpace:
    """Matern-5/2 kernel.  Ref: cf_matern52_to_ss.m (companion form)."""
    sigma2 = jnp.asarray(sigma2, dtype)
    ell = jnp.asarray(ell, dtype)
    dt_ = sigma2.dtype
    lam = jnp.sqrt(jnp.asarray(5.0, dt_)) / ell
    z = jnp.zeros((), dt_)
    one = jnp.ones((), dt_)
    F = jnp.stack(
        [
            jnp.stack([z, one, z]),
            jnp.stack([z, z, one]),
            jnp.stack([-(lam**3), -3.0 * lam**2, -3.0 * lam]),
        ]
    )
    L = jnp.array([[0.0], [0.0], [1.0]], dt_)
    # Qc = sigma2 * 400 * sqrt(5) / 3 / ell^5
    Qc = jnp.reshape(sigma2 * 400.0 * jnp.sqrt(jnp.asarray(5.0, dt_)) / 3.0 / ell**5, (1, 1))
    H = jnp.array([[1.0, 0.0, 0.0]], dt_)
    kappa = 5.0 / 3.0 * sigma2 / ell**2
    Pinf = jnp.stack(
        [
            jnp.stack([sigma2, z, -kappa]),
            jnp.stack([z, kappa, z]),
            jnp.stack([-kappa, z, 25.0 * sigma2 / ell**4]),
        ]
    )
    return StateSpace(F, L, Qc, H, Pinf)


def matern72_to_ss(sigma2, ell, dtype=None) -> StateSpace:
    """Matern-7/2 kernel.  Ref: cf_matern72_to_ss.m (companion form)."""
    sigma2 = jnp.asarray(sigma2, dtype)
    ell = jnp.asarray(ell, dtype)
    dt_ = sigma2.dtype
    lam = jnp.sqrt(jnp.asarray(7.0, dt_)) / ell
    z = jnp.zeros((), dt_)
    one = jnp.ones((), dt_)
    F = jnp.stack(
        [
            jnp.stack([z, one, z, z]),
            jnp.stack([z, z, one, z]),
            jnp.stack([z, z, z, one]),
            jnp.stack([-(lam**4), -4.0 * lam**3, -6.0 * lam**2, -4.0 * lam]),
        ]
    )
    L = jnp.array([[0.0], [0.0], [0.0], [1.0]], dt_)
    Qc = jnp.reshape(
        sigma2 * 10976.0 * jnp.sqrt(jnp.asarray(7.0, dt_)) / 5.0 / ell**7, (1, 1)
    )
    H = jnp.array([[1.0, 0.0, 0.0, 0.0]], dt_)
    kappa = 7.0 / 5.0 * sigma2 / ell**2
    kappa2 = 9.8 * sigma2 / ell**4
    Pinf = jnp.stack(
        [
            jnp.stack([sigma2, z, -kappa, z]),
            jnp.stack([z, kappa, z, -kappa2]),
            jnp.stack([-kappa, z, kappa2, z]),
            jnp.stack([z, -kappa2, z, 343.0 * sigma2 / ell**6]),
        ]
    )
    return StateSpace(F, L, Qc, H, Pinf)


# ---------------------------------------------------------------------------
# Squared-exponential (Taylor approximation, default order 6)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _se_canonical_coeffs(order: int) -> np.ndarray:
    """Stable-root companion-form coefficients for the unit-lengthscale SE.

    The SE spectrum is approximated by a 1/polynomial of degree 2*order in
    the frequency; we factor the polynomial's stable roots once for the unit
    lengthscale (kappa = 1/2).  Ref: cf_se_to_ss.m:104-134.

    Returns ``a`` of shape (order,), the (positive-power ordered) coefficients
    a_0..a_{order-1} of the monic stable polynomial for ell=1, such that for a
    general lengthscale the companion-form F has last row
    ``-a_k * ell**(k-order)`` in column k.
    """
    kappa = 0.5  # 1 / (2 ell^2) at ell = 1
    fn = math.factorial(order)
    # Descending-power coefficients: p[2N - 2n] is the coefficient of x^(2n).
    p = np.zeros(2 * order + 1)
    for n in range(order + 1):
        p[2 * order - 2 * n] = fn * (4.0 * kappa) ** (order - n) / math.factorial(n) / (-1.0) ** n
    r = np.roots(p)
    r_stable = r[np.real(r) < 0]
    a_monic = np.real(np.poly(r_stable))  # descending: [1, a_{N-1}, ..., a_0]
    # return ascending-from-x^0 coefficients excluding the leading 1
    return a_monic[1:][::-1].copy()  # a[k] multiplies x^k, k=0..order-1


def se_to_ss(sigma2, ell, order: int = 6, dtype=None) -> StateSpace:
    """Squared-exponential kernel, order-``order`` Taylor approximation.

    Ref: cf_se_to_ss.m:104-144.  The polynomial factorization is done once at
    unit lengthscale (cached, numpy); lengthscale scaling is exact:
    roots scale as 1/ell so the monic coefficient of x^k scales as
    ell**(k-order).  Pinf solves the Lyapunov equation F P + P F' + L Qc L'=0,
    computed in closed form for companion F via jnp.linalg.solve on the
    Kronecker system (tau<=8 so this is a tiny dense solve).
    """
    sigma2 = jnp.asarray(sigma2, dtype)
    ell = jnp.asarray(ell, dtype)
    dt_ = sigma2.dtype
    a_unit = jnp.asarray(_se_canonical_coeffs(order), dt_)  # (order,)
    N = order
    fn = math.factorial(N)
    kappa = 1.0 / (2.0 * ell**2)
    Qc = jnp.reshape(sigma2 * jnp.sqrt(jnp.pi / kappa) * fn * (4.0 * kappa) ** N, (1, 1))
    powers = jnp.arange(N, dtype=dt_) - N  # k - N for k = 0..N-1
    a = a_unit * ell**powers
    F = jnp.diag(jnp.ones((N - 1,), dt_), 1)
    F = F.at[-1, :].set(-a)
    L = jnp.zeros((N, 1), dt_).at[-1, 0].set(1.0)
    H = jnp.zeros((1, N), dt_).at[0, 0].set(1.0)
    Pinf = lyap(F, L @ Qc @ L.T)
    return StateSpace(F, L, Qc, H, Pinf)


def lyap(F: jax.Array, Q: jax.Array) -> jax.Array:
    """Solve F P + P F' + Q = 0 for P via the Kronecker-vectorized system.

    Fine for the tiny (tau <= 8) blocks used here; jit/vmap/grad-safe.
    """
    n = F.shape[0]
    eye = jnp.eye(n, dtype=F.dtype)
    M = jnp.kron(eye, F) + jnp.kron(F, eye)
    p = jnp.linalg.solve(M, -Q.reshape(-1))
    P = p.reshape(n, n)
    return 0.5 * (P + P.T)


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

KERNELS = {
    "exp": exp_to_ss,
    "matern12": exp_to_ss,
    "matern32": matern32_to_ss,
    "matern52": matern52_to_ss,
    "matern72": matern72_to_ss,
    "se": se_to_ss,
}

KERNEL_ORDER = {
    "exp": 1,
    "matern12": 1,
    "matern32": 2,
    "matern52": 3,
    "matern72": 4,
    "se": 6,
}


def get_kernel(name: str):
    try:
        return KERNELS[name]
    except KeyError:
        raise ValueError(f"unknown kernel {name!r}; available: {sorted(KERNELS)}")


def kernel_state_dim(name: str) -> int:
    return KERNEL_ORDER[name]
