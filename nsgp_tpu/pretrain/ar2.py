"""Legacy AR(2) probabilistic filterbank (Turner's thesis, ch. 5).

TPU-native rebuild of the reference's oldest pretrain path
(prob_filterbank/fitAR2FB.m, cosFreq2AR2.m, getSpecAR2cosFreq.m,
getmVarAR2.m, ar2LDSParams.m, samplePFB.m): D independent AR(2) processes

    x_{d,t} = lam1_d x_{d,t-1} + lam2_d x_{d,t-2} + sqrt(Var_d) eps,
    y_t     = sum_d x_{d,t} + noise,

fitted by Whittle spectrum matching in the stationarity-safe
(cosCF, cosDF, mVar) parameterization (fitAR2FB.m:49-66: the cosine
center frequency / cosine bandwidth / marginal variance of each process —
the raw lambda space contains non-stationary regions where the spectrum
is undefined).

The kernel-based path (pretrain/spectral.py + filterbank.py) supersedes
this layer in the paper pipeline (the continuous-time spectral-mixture fit
`fit_probSTFT_SD`); it is provided for completeness of the reference's
surface.  Differences by design: Adam on the unconstrained parameters with
exact autodiff gradients replaces the reference's conjugate-gradient
`minimize` with hand-coded derivatives, and all D processes are fit as one
batched objective.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nsgp_tpu.pretrain.spectral import welch


def cosfreq_to_ar2(cosCF, cosDF, mVar):
    """(cosCF, cosDF, mVar) -> (Lam (D, 2), Var (D,)).

    Ref cosFreq2AR2.m — the closed-form inverse of the cosine-frequency
    parameterization; valid for |cosCF| < 1, cosDF > 0 (stationary)."""
    a1 = cosDF**2 + 4.0 * cosCF**2
    a2 = -2.0 * cosDF**2 + 8.0 * cosCF**2 - 2.0
    z2 = -a1 / 2.0 - jnp.sqrt(jnp.maximum(a1**2 / 4.0 - a2 + 2.0, 0.0))
    lam2 = (z2 + jnp.sqrt(jnp.maximum(z2**2 - 4.0, 0.0))) / 2.0
    lam1 = 4.0 * cosCF * lam2 / (lam2 - 1.0)
    var = mVar * (
        1.0 - lam1**2 - lam2**2 - lam2 - lam1**2 * lam2 + lam2**3
    ) / (1.0 - lam2)
    return jnp.stack([lam1, lam2], axis=-1), var


def ar2_marginal_var(Lam, Var):
    """<x_t^2> of an AR(2) process (ref getmVarAR2.m)."""
    lam1, lam2 = Lam[..., 0], Lam[..., 1]
    return (1.0 - lam2) * Var / (
        1.0 - lam1**2 - lam2**2 - lam2 - lam1**2 * lam2 + lam2**3
    )


def ar2_component_spectra(Lam, Var, omega):
    """Per-process power spectral density at ``omega`` (rad/sample):
    S_d(w) = Var_d / |1 - lam1 e^{-iw} - lam2 e^{-2iw}|^2, the convention
    in which the process variance is (1/2pi) * integral of S over [-pi, pi].

    Algebraically equal to the reference's cosine-frequency closed form
    (getSpecAR2cosFreq.m).  Shapes: Lam (D, 2), Var (D,), omega (F,)
    -> (F, D)."""
    w = omega[:, None]
    lam1, lam2 = Lam[None, :, 0], Lam[None, :, 1]
    denom = (
        1.0 + lam1**2 + lam2**2
        - 2.0 * lam1 * (1.0 - lam2) * jnp.cos(w)
        - 2.0 * lam2 * jnp.cos(2.0 * w)
    )
    return Var[None, :] / jnp.maximum(denom, 1e-12)


class AR2Fit(NamedTuple):
    Lam: jax.Array  # (D, 2) dynamical weights
    Var: jax.Array  # (D,) innovation variances
    cosCF: jax.Array  # (D,)
    cosDF: jax.Array  # (D,)
    mVar: jax.Array  # (D,)
    obj: jax.Array  # final Whittle objective


def fit_ar2fb(
    y,
    D: int,
    vary: float = 1e-3,
    num_levels: int = 3,
    steps_per_level: int = 300,
    min_win: int = 128,
    max_win: int = 1024,
    learning_rate: float = 3e-2,
    cdf_min: float = 1e-3,
) -> AR2Fit:
    """Coarse-to-fine Whittle fit of an AR(2) filterbank (ref fitAR2FB.m).

    The reference anneals the Welch window from short (smooth, biased
    spectrum — no local optima) to long (sharp), re-optimizing at each
    level (fitAR2FB.m:22-37); same schedule here with Adam on
    unconstrained (atanh cosCF, log cosDF, log mVar)."""
    y = jnp.asarray(y)
    dt_ = y.dtype

    # init: uniformly spread center frequencies, moderate bandwidths,
    # equal share of the signal variance (ref fitAR2FB.m:91-98)
    cf0 = (np.arange(1, D + 1) / (2.0 * (D + 1))).astype(np.float64)
    cosCF0 = np.cos(2.0 * np.pi * cf0)
    cosDF0 = np.full(D, 0.05)
    mVar0 = np.full(D, float(jnp.var(y)) / D)
    theta = jnp.concatenate([
        jnp.arctanh(jnp.asarray(cosCF0 * 0.999, dt_)),
        jnp.log(jnp.asarray(cosDF0, dt_)),
        jnp.log(jnp.asarray(mVar0, dt_)),
    ])

    def unpack(th):
        cosCF = jnp.tanh(th[:D]) * (1.0 - 2.0 * cdf_min)
        cosDF = jnp.exp(th[D : 2 * D]) + cdf_min
        mVar = jnp.exp(th[2 * D :])
        return cosCF, cosDF, mVar

    def whittle(th, freq, target):
        cosCF, cosDF, mVar = unpack(th)
        Lam, Var = cosfreq_to_ar2(cosCF, cosDF, mVar)
        S = jnp.sum(ar2_component_spectra(Lam, Var, freq), axis=-1) + vary
        return jnp.sum(jnp.log(S) + target / S)

    wins = np.geomspace(min_win, max_win, num_levels).astype(int) // 2 * 2

    @jax.jit
    def level(theta, freq, target):
        opt = optax.adam(learning_rate)
        state = opt.init(theta)

        def body(carry, _):
            th, st = carry
            val, g = jax.value_and_grad(whittle)(th, freq, target)
            up, st = opt.update(g, st)
            return (th + up, st), val

        (theta, _), vals = jax.lax.scan(body, (theta, state), None,
                                        length=steps_per_level)
        return theta, vals[-1]

    obj = jnp.zeros((), dt_)
    for win in wins:
        freq, target = welch(y, int(win))
        # drop DC (the reference fits strictly positive frequencies)
        theta, obj = level(theta, freq[1:], target[1:])
    cosCF, cosDF, mVar = unpack(theta)
    Lam, Var = cosfreq_to_ar2(cosCF, cosDF, mVar)
    return AR2Fit(Lam=Lam, Var=Var, cosCF=cosCF, cosDF=cosDF, mVar=mVar,
                  obj=obj)


def ar2_lds_params(Lam, Var, vary):
    """Companion-form LDS of the AR(2) bank (ref ar2LDSParams.m): per
    process a 2-state block [lam1 lam2; 1 0] with innovation variance on
    the first state, emission picking state 1 of every block, and the
    stationary prior from the lag-0/1 autocovariances.

    Returns (A (2D, 2D), Q (2D, 2D), C (1, 2D), R, x0 (2D,), P0 (2D, 2D))
    — feed to nsgp_tpu.ops.kalman for exact filtering, mirroring the
    reference's kalman.m consumption."""
    D = Var.shape[0]
    lam1, lam2 = Lam[:, 0], Lam[:, 1]
    mVar = ar2_marginal_var(Lam, Var)
    rho1 = lam1 / (1.0 - lam2) * mVar  # Yule-Walker lag-1 autocovariance

    blocks_A = jnp.stack([
        jnp.stack([lam1, lam2], -1),
        jnp.stack([jnp.ones_like(lam1), jnp.zeros_like(lam1)], -1),
    ], -2)  # (D, 2, 2)
    A = jax.scipy.linalg.block_diag(*[blocks_A[d] for d in range(D)])
    Q = jnp.zeros((2 * D, 2 * D), Var.dtype)
    Q = Q.at[2 * jnp.arange(D), 2 * jnp.arange(D)].set(Var)
    C = jnp.tile(jnp.asarray([1.0, 0.0], Var.dtype), (D,))[None, :]
    blocks_P0 = jnp.stack([
        jnp.stack([mVar, rho1], -1),
        jnp.stack([rho1, mVar], -1),
    ], -2)
    P0 = jax.scipy.linalg.block_diag(*[blocks_P0[d] for d in range(D)])
    return A, Q, C, jnp.asarray(vary, Var.dtype), jnp.zeros((2 * D,), Var.dtype), P0


def sample_pfb(key, Lam, Var, T: int, vary: float = 0.0):
    """Sample the AR(2) filterbank (ref samplePFB.m): returns
    (y (T,), X (T, D)) — channels + their noisy sum."""
    D = Var.shape[0]
    kx, ky = jax.random.split(key)
    eps = jax.random.normal(kx, (T, D), Var.dtype) * jnp.sqrt(Var)[None, :]

    def step(carry, e):
        x1, x2 = carry
        x = Lam[:, 0] * x1 + Lam[:, 1] * x2 + e
        return (x, x1), x

    _, X = jax.lax.scan(step, (jnp.zeros((D,), Var.dtype),) * 2, eps)
    y = jnp.sum(X, axis=-1)
    if vary > 0.0:
        y = y + jnp.sqrt(vary) * jax.random.normal(ky, (T,), Var.dtype)
    return y, X
