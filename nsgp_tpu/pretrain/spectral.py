"""Probabilistic filterbank fitting: spectral-mixture components by Whittle ML.

TPU-native re-design of fit_probSTFT_SD.m + get_Obj_pSTFT_*.m +
welchMethod.m.  Fits D spectral-mixture components — each a (Matern-family
kernel x cosine) subband with magnitude sigma2_d, bandwidth lambda_d and
center frequency omega_d — to the signal's Welch periodogram by minimizing
the Itakura-Saito / Whittle objective

    Obj = sum_k [ log S_model(w_k) + S_target(w_k) / S_model(w_k) ]

(ref get_Obj_pSTFT_all.m:240-247), with a coarse-to-fine annealing of the
Welch window (fit_probSTFT_SD.m:257-299).

Departures from the reference: component spectra are evaluated *analytically*
(the Matern spectral density shifted to +-omega) instead of through the SDE
transfer function |H (F - iwI)^{-1} L|^2 Qc — identical values, no complex
solves; optimization is Adam/L-BFGS on log/logit-unconstrained parameters
with exact autodiff gradients instead of Rasmussen CG with hand-coded ones.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def welch(y: jax.Array, nwin: int, overlap: float = 0.5):
    """Chunked averaged periodogram on [0, pi) (ref welchMethod.m:44-60).

    Returns (omega (nwin//2,), spec (nwin//2,)) with omega in rad/sample.
    """
    T = y.shape[0]
    hop = max(1, int(nwin * (1.0 - overlap)))
    nchunk = max(1, (T - nwin) // hop + 1)
    idx = jnp.arange(nwin)[None, :] + hop * jnp.arange(nchunk)[:, None]
    frames = y[jnp.clip(idx, 0, T - 1)]
    win = jnp.hanning(nwin).astype(y.dtype)
    frames = frames * win[None, :]
    scale = jnp.sum(win**2)
    ps = jnp.abs(jnp.fft.rfft(frames, axis=-1)) ** 2 / scale
    spec = jnp.mean(ps, axis=0)[: nwin // 2]
    omega = jnp.arange(nwin // 2) * (2.0 * jnp.pi / nwin)
    return omega, spec


# Matern spectral densities S(w) for lengthscale-parameterized kernels,
# normalized so that integral S dw / (2 pi) = sigma2.
def _matern_spec(nu_name: str, sigma2, lam, w):
    """lam is the SDE rate (1/ell scaled): exp: 1/ell, m32: sqrt(3)/ell,
    m52: sqrt(5)/ell."""
    if nu_name in ("exp", "matern12"):
        return 2.0 * sigma2 * lam / (lam**2 + w**2)
    if nu_name == "matern32":
        return 4.0 * sigma2 * lam**3 / (lam**2 + w**2) ** 2
    if nu_name == "matern52":
        return (16.0 / 3.0) * sigma2 * lam**5 / (lam**2 + w**2) ** 3
    raise ValueError(f"no analytic spectrum for kernel {nu_name!r}")


LAM_SCALE = {"exp": 1.0, "matern12": 1.0, "matern32": np.sqrt(3.0),
             "matern52": np.sqrt(5.0)}


def component_spectra(kernel: str, sigma2, lam, omega0, w):
    """Per-channel spectral-mixture spectra 0.5 * [S(w - w0) + S(w + w0)].
    Shapes: params (D,), w (F,) -> (F, D)."""
    Sm = lambda wq: _matern_spec(kernel, sigma2[None, :], lam[None, :], wq)
    dw_minus = w[:, None] - omega0[None, :]
    dw_plus = w[:, None] + omega0[None, :]
    return 0.5 * (Sm(dw_minus) + Sm(dw_plus))  # (F, D)


def mixture_spectrum(kernel: str, sigma2, lam, omega0, w):
    """Spectral-mixture spectrum: 0.5 * [S(w - w0) + S(w + w0)] per channel,
    summed over channels.  Shapes: params (D,), w (F,) -> (F,)."""
    return jnp.sum(component_spectra(kernel, sigma2, lam, omega0, w), axis=-1)


class FilterbankFit(NamedTuple):
    sigma2: jax.Array  # (D,) component variances
    lam: jax.Array  # (D,) SDE bandwidth rates
    omega: jax.Array  # (D,) center frequencies (rad/sample)
    noise: jax.Array  # () broadband noise floor
    obj: jax.Array  # final objective value

    def lengthscales(self, kernel: str) -> jax.Array:
        """Convert rates back to kernel lengthscales (ref lambda_map.m)."""
        return LAM_SCALE[kernel] / self.lam


def _whittle_obj(kernel, log_params, w, target, beta):
    D = (log_params.shape[0] - 1) // 3
    sigma2 = jnp.exp(log_params[:D])
    lam = jnp.exp(log_params[D : 2 * D])
    # omega constrained to (0, pi) by a scaled sigmoid (ref sigmoid.m usage)
    omega0 = jnp.pi * jax.nn.sigmoid(log_params[2 * D : 3 * D])
    noise = jnp.exp(log_params[-1])
    S = mixture_spectrum(kernel, sigma2, lam, omega0, w) + noise
    obj = jnp.sum(jnp.log(S) + target / S)
    # shrinkage on component variances (ref get_Obj_pSTFT_all.m beta term)
    return obj + beta * jnp.sum(sigma2)


def _reassign_dead(
    kernel: str,
    log_params: np.ndarray,
    D: int,
    w: np.ndarray,
    target: np.ndarray,
    var_y: float,
    thresh_frac: float,
):
    """Move dead or duplicate components to the worst-fit frequency.

    Ref fit_probSTFT_SD.m:359-415: a component whose variance has shrunk
    below threshold is re-initialized at the argmax of
    log(target) - log(model-without-it), with fresh variance/bandwidth
    (mVar = 1/20 of signal variance, lam = 0.05 there).

    Beyond the reference: components that COLLAPSED ONTO EACH OTHER
    (centers within one bandwidth) are treated the same way — the
    lower-variance member of each duplicate pair is reassigned.  The
    reference relies on variance shrinkage to separate duplicates
    (fit_probSTFT_SD.m:418-420 notes its merge heuristic was abandoned),
    but collapsed pairs whose variance stays above the floor slip through
    and produce degenerate filterbanks (byte-identical components); this
    fixes that failure mode.
    """
    p = np.array(log_params)
    sigma2 = np.exp(p[:D])
    lam = np.exp(p[D : 2 * D])
    omega0 = np.pi / (1.0 + np.exp(-p[2 * D : 3 * D]))
    floor = thresh_frac * var_y / D
    fresh_lam = 0.05
    placed: list = []  # centers assigned THIS pass

    def reassign(d):
        keep = np.arange(D) != d
        S_others = np.asarray(
            mixture_spectrum(
                kernel,
                jnp.asarray(sigma2[keep]),
                jnp.asarray(lam[keep]),
                jnp.asarray(omega0[keep]),
                jnp.asarray(w),
            )
        )
        dspec = np.log(np.maximum(target, 1e-20)) - np.log(
            np.maximum(S_others, 1e-20)
        )
        # Spacing guard: a freshly placed component is broad (lam 0.05), so
        # a sharp under-fit peak can stay the argmax even after placement —
        # without this every reassigned component of the pass piles onto
        # the SAME frequency and the pass manufactures its own duplicates
        # (observed on speech0_female: 6 components at one harmonic).
        for pc in placed:
            dspec[np.abs(w - pc) < fresh_lam] = -np.inf
        if not np.isfinite(dspec).any():
            dspec = np.log(np.maximum(target, 1e-20))
        omega0[d] = float(w[int(np.argmax(dspec))])
        sigma2[d] = var_y / 20.0
        lam[d] = fresh_lam
        placed.append(omega0[d])

    moved = 0
    for d in range(D):
        if sigma2[d] >= floor:
            continue
        reassign(d)
        moved += 1
    # duplicate-pair detection: centers closer than the NARROWER of the
    # two bandwidths (min, not max: a freshly reassigned broad component
    # legitimately sits near narrow neighbors, only genuinely collapsed
    # pairs are this close)
    for i in range(D):
        for j in range(i + 1, D):
            bw = min(lam[i], lam[j])
            if abs(omega0[i] - omega0[j]) < bw:
                d = i if sigma2[i] <= sigma2[j] else j
                reassign(d)
                moved += 1
    if moved:
        p[:D] = np.log(sigma2)
        p[D : 2 * D] = np.log(lam)
        q = np.clip(omega0 / np.pi, 1e-5, 1 - 1e-5)
        p[2 * D : 3 * D] = np.log(q) - np.log1p(-q)
    return p, moved


def fit_probstft(
    y,
    D: int,
    kernel: str = "exp",
    num_levels: int = 4,
    min_win: int = 256,
    max_win: int = 4096,
    steps_per_level: int = 400,
    lr: float = 3e-2,
    beta: float = 100.0,
    seed: int = 0,
    init: FilterbankFit | None = None,
    reassign: bool = True,
    reassign_frac: float = 0.01,
    rescale_variance: bool = True,
) -> FilterbankFit:
    """Coarse-to-fine Whittle fit of a D-component probabilistic filterbank.

    Equivalent of fit_probSTFT_SD(y, D, kernel, opts): anneal the Welch
    window from min_win to max_win over num_levels, re-optimizing at each
    level; initialize centers uniformly over (0, pi) and bandwidths from the
    window scale (ref fit_probSTFT_SD.m:200-250 init heuristics).

    ``reassign``: re-initialize dead OR duplicate components (variance
    below reassign_frac * var_y / D, or centers within one bandwidth) at
    the worst-fit frequency (ref :359-415); after the final level the moved
    components are re-fit and re-checked (up to 3 rounds).
    ``rescale_variance``: rescale component variances at exit so they sum
    to the signal variance (ref :484-490).
    ``beta``: top of the ANNEALED shrinkage schedule on component
    variances, logspace(log10(beta), 0) over levels exactly like the
    reference's `bet` (fit_probSTFT_SD.m:179-183, default 100) — strong
    early shrinkage prunes redundant components so reassignment can move
    them; without it components collapse onto the dominant spectral peak.
    """
    import optax

    y = jnp.asarray(y)
    dt_ = y.dtype
    var_y = jnp.var(y)

    if init is None:
        omega_init = (np.arange(D) + 0.5) / D * np.pi
        # logit of omega/pi
        uo = np.log(omega_init / np.pi) - np.log1p(-omega_init / np.pi)
        log_params = jnp.concatenate(
            [
                jnp.log(jnp.full((D,), var_y / D)),
                jnp.full((D,), jnp.log(2.0 * jnp.pi / max_win * 4.0)).astype(dt_),
                jnp.asarray(uo, dt_),
                jnp.log(jnp.asarray([var_y * 0.1], dt_)),
            ]
        )
    else:
        w0 = jnp.clip(init.omega / jnp.pi, 1e-4, 1 - 1e-4)
        log_params = jnp.concatenate(
            [jnp.log(init.sigma2), jnp.log(init.lam),
             jnp.log(w0) - jnp.log1p(-w0), jnp.log(init.noise[None])]
        )

    wins = np.unique(
        np.geomspace(min_win, max_win, num_levels).astype(int) // 2 * 2
    )

    @partial(jax.jit, static_argnums=(2,))
    def optimize(log_params, data, nsteps, bet=0.0):
        w, target = data
        opt = optax.adam(lr)
        state = opt.init(log_params)

        def body(carry, _):
            p, s = carry
            val, g = jax.value_and_grad(
                lambda pp: _whittle_obj(kernel, pp, w, target, bet)
            )(p)
            upd, s = opt.update(g, s)
            return (optax.apply_updates(p, upd), s), val

        (log_params, _), vals = jax.lax.scan(
            body, (log_params, state), None, length=nsteps
        )
        return log_params, vals[-1]

    if beta > 0.0:
        betas = np.logspace(np.log10(beta), 0.0, len(wins))
    else:
        betas = np.zeros(len(wins))
    obj = jnp.asarray(0.0, dt_)
    for lvl, nwin in enumerate(wins):
        w, target = welch(y, int(nwin))
        bet = float(betas[lvl])
        # drop DC
        log_params, obj = optimize(log_params, (w[1:], target[1:]),
                                   steps_per_level, bet)
        if reassign:
            # Final level: iterate reassign -> re-fit until clean (moved
            # components need fitting, and may re-collide once), then one
            # last reassignment WITHOUT re-optimization so the returned fit
            # is guaranteed duplicate-free even when the optimizer keeps
            # re-collapsing components onto a dominant peak.
            final = lvl == len(wins) - 1
            rounds = 3 if final else 1
            for r in range(rounds):
                p, moved = _reassign_dead(
                    kernel, np.asarray(log_params), D, np.asarray(w[1:]),
                    np.asarray(target[1:]), float(var_y), reassign_frac,
                )
                if not moved:
                    break
                log_params = jnp.asarray(p, dt_)
                if final and r < rounds - 1:
                    log_params, obj = optimize(
                        log_params, (w[1:], target[1:]), steps_per_level, bet
                    )

    sigma2 = jnp.exp(log_params[:D])
    lam = jnp.exp(log_params[D : 2 * D])
    omega0 = jnp.pi * jax.nn.sigmoid(log_params[2 * D : 3 * D])
    noise = jnp.exp(log_params[-1])
    if rescale_variance:
        # Exit rescaling (ref fit_probSTFT_SD.m:484-490): component
        # variances sum to the signal variance.
        sigma2 = sigma2 * (var_y / jnp.sum(sigma2))
    order = jnp.argsort(omega0)
    return FilterbankFit(
        sigma2=sigma2[order], lam=lam[order], omega=omega0[order],
        noise=noise, obj=obj,
    )


def fit_probstft_staged(
    y,
    D: int,
    kernel: str = "matern32",
    **kwargs,
) -> FilterbankFit:
    """Two-stage fit: 'exp' first, then refine with the target kernel.

    The reference's recipe (demo_nonstationary_filterbank.m:45-89 /
    demo_stationary_filterbank.m): the exp fit is cheap and robust; the
    Matern refinement starts from it with the LENGTHSCALE preserved
    (lam_new = LAM_SCALE[kernel] * lam_exp, since ell = scale / lam).
    """
    fit = fit_probstft(y, D, kernel="exp", **kwargs)
    if kernel in ("exp", "matern12"):
        return fit
    init = fit._replace(lam=fit.lam * LAM_SCALE[kernel])
    return fit_probstft(y, D, kernel=kernel, init=init, **kwargs)
