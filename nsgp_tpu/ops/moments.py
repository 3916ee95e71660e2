"""EP moment matching for the modulator likelihoods.

TPU-native re-design of the reference's per-sample moment functions
(matlab/likModulatorNMFPower.m, matlab/likModulatorPower.m,
matlab/experiments/likModulatorPreCalcwn.m).

The observation model couples D subband values z and N modulator values g
through a single scalar sample:

    amplitude variant ('amp'): y ~ N( a(g)' z,  sn2/alpha ),  a(g) = W link(g)
    spectrogram variant ('sq'): a(g) = sqrt(W link(g))   (paper experiments,
        ref likModulatorPreCalcwn.m:44)

Given a Gaussian cavity q(z, g) = N(mu, diag(s2)) (dimensions split as
[D subbands | N modulators], matching the reference's H-row ordering), the
log-normalizer lZ = log E_q[ N(y | a(g)'z, sn2/alpha) ] has an *analytic*
z-integral (Gaussian in z) and an N-dim g-integral handled by sigma points:

    Z = sum_s w_s N(y | a_s' mu_z,  sn2/alpha + a_s'^2 s2_z)

with a_s = a(x_s), x_s = mu_g + sqrt(s2_g) * xi_s.  dlZ/d2lZ w.r.t. the
cavity means follow the same quadrature (ref likModulatorNMFPower.m:58-83).

Everything here is vectorized over a leading batch of T sites: the hot path
is ``link(xn) @ W.T`` — a (T*S, N) x (N, D) matmul that maps straight onto
the MXU — followed by elementwise VPU work and weighted reductions over S.
For long signals use ``chunked=True`` to bound the (T, S, D) intermediate.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from nsgp_tpu.ops import cubature

_LOG2PI = float(np.log(2.0 * np.pi))
_JITTER = 1e-10  # floor on Z, ref likModulatorNMFPower.m:28,55


def softplus(x):
    """The positive link used throughout the reference: log(1 + exp(x))."""
    return jax.nn.softplus(x)


LINKS = {"softplus": softplus, "exp": jnp.exp}


class MomentParams(NamedTuple):
    """Static configuration of a moment function (hashable, jit-friendly)."""

    D: int
    N: int
    p_cubature: int = 9
    link: str = "softplus"
    variant: str = "amp"  # 'amp' (likModulatorNMFPower) or 'sq' (PreCalcwn)
    method: str = "symmetric"  # 'symmetric' (utp) or 'gh' tensor grid
    z_floor: float = _JITTER  # raw-scale floor on Z; the reference uses
    # 1e-10 for likModulatorNMFPower.m:28 and 1e-8 for likModulatorPower.m:25
    use_pep_const: bool = False  # ref NMFPower sets pEP const to 1 (:48-49);
    # PreCalcwn uses (2 pi sn2)^((1-a)/2) a^(-1/2) (:48)


def sigma_points(mp: MomentParams):
    w, x = cubature.unit_sigma_points(mp.p_cubature, mp.N, mp.method)
    return jnp.asarray(w), jnp.asarray(x.T)  # (S,), (S, N)


def moments(
    mp: MomentParams,
    sn2,
    y,  # (...,) observations
    mu,  # (..., D+N) cavity means
    s2,  # (..., D+N) cavity variances
    W,  # (D, N) NMF weights
    ep_fraction=1.0,
):
    """lZ, dlZ, d2lZ of the tilted-distribution normalizer, batched.

    Shapes: y (...,), mu/s2 (..., D+N) -> lZ (...,), dlZ/d2lZ (..., D+N).
    Faithful to likModulatorNMFPower.m:28-86 ('amp') and
    likModulatorPreCalcwn.m:44-79 ('sq').
    """
    D, N = mp.D, mp.N
    link = LINKS[mp.link]
    wn, xi = sigma_points(mp)  # (S,), (S, N)
    dtype = mu.dtype
    wn = wn.astype(dtype)
    xi = xi.astype(dtype)

    mu_z, mu_g = mu[..., :D], mu[..., D:]
    s2_z, s2_g = s2[..., :D], s2[..., D:]

    # Sigma points in g-space: (..., S, N)
    xn = mu_g[..., None, :] + jnp.sqrt(s2_g)[..., None, :] * xi

    a = link(xn) @ W.T  # (..., S, D) amplitudes (or squared amps for 'sq')
    if mp.variant == "sq":
        a = jnp.sqrt(a)

    s2_eff = sn2 / ep_fraction + jnp.einsum("...sd,...d->...s", a * a, s2_z)
    mean = jnp.einsum("...sd,...d->...s", a, mu_z)
    resid = y[..., None] - mean
    # N(y; mean, s2_eff) in log space, accumulated with a max shift so the
    # sigma-point sum never under/overflows in f32 (the reference works with
    # raw normpdf, which is fine in f64 only).  Symmetric-cubature weights can
    # be NEGATIVE (ut7/ut9), so plain logsumexp does not apply; the shifted
    # sum Z0r = sum_s w_s exp(l_s - lmax) is exact and well-scaled, and every
    # derivative below is a ratio (sum w f exp(l - lmax)) / Z0r in which the
    # exp(lmax) scale cancels.
    log_norm = -0.5 * (resid * resid / s2_eff + jnp.log(s2_eff) + _LOG2PI)
    lmax = jax.lax.stop_gradient(jnp.max(log_norm, axis=-1, keepdims=True))
    # Guard the degenerate all -inf case (every sigma point underflowed,
    # e.g. an f32 cavity blown up to inf): exp(-inf - -inf) would be NaN.
    lmax = jnp.where(jnp.isfinite(lmax), lmax, 0.0)
    norm = jnp.exp(log_norm - lmax)

    if mp.use_pep_const:
        pep_const = (2.0 * jnp.pi * sn2) ** (0.5 * (1.0 - ep_fraction)) * ep_fraction ** (-0.5)
    else:
        pep_const = jnp.asarray(1.0, dtype)

    # Raw-scale floor Z >= _JITTER exactly as the reference (max on the raw
    # sum, likModulatorNMFPower.m:55): log(max(Z, j)) == max(log Z, log j),
    # and the floored Z also feeds Zinv.  The shifted sum can be <= 0
    # (negative ut7/ut9 weights), in which case the reference's max() kicks
    # in too — the inner tiny-clamp only keeps the log finite on that path.
    Z0 = jnp.maximum(jnp.einsum("s,...s->...", wn, norm), jnp.finfo(dtype).tiny)
    lZ_raw = lmax[..., 0] + jnp.log(Z0)
    lZ_floor = jnp.maximum(lZ_raw, jnp.log(jnp.asarray(mp.z_floor, dtype)))
    lZ = jnp.log(pep_const) + lZ_floor
    # Rescaled 1/Z consistent with the rescaled ``norm``; the extra factor
    # folds the raw-scale floor into the shifted representation.
    Zinv = jnp.exp(lZ_raw - lZ_floor) / Z0

    # --- first derivatives w.r.t. cavity means -----------------------------
    rs = resid / s2_eff  # (..., S)
    dlZ_z = Zinv[..., None] * jnp.einsum("s,...sd->...d", wn, a * (rs * norm)[..., None])

    dmu_g = (xn - mu_g[..., None, :]) / s2_g[..., None, :]  # (..., S, N)
    dlZ_g = Zinv[..., None] * jnp.einsum("s,...sn->...n", wn, dmu_g * norm[..., None])

    # --- second derivatives -------------------------------------------------
    d2_int_z = (a * a) * ((rs * rs) - 1.0 / s2_eff)[..., None] * norm[..., None]
    d2lZ_z = -dlZ_z * dlZ_z + Zinv[..., None] * jnp.einsum("s,...sd->...d", wn, d2_int_z)

    d2_int_g = (dmu_g * dmu_g - 1.0 / s2_g[..., None, :]) * norm[..., None]
    d2lZ_g = -dlZ_g * dlZ_g + Zinv[..., None] * jnp.einsum("s,...sn->...n", wn, d2_int_g)

    dlZ = jnp.concatenate([dlZ_z, dlZ_g], axis=-1)
    d2lZ = jnp.concatenate([d2lZ_z, d2lZ_g], axis=-1)
    return lZ, dlZ, d2lZ


def moments_chunked(
    mp: MomentParams, sn2, y, mu, s2, W, ep_fraction=1.0, chunk: int = 4096
):
    """Memory-bounded moments over a long leading T axis via lax.map.

    Bounds the (T, S, D) intermediate to (chunk, S, D); use for T >~ 16k.
    T must be padded to a multiple of ``chunk`` by the caller or is padded
    here (extra sites are discarded).
    """
    T = y.shape[0]
    nchunk = -(-T // chunk)
    pad = nchunk * chunk - T
    yp = jnp.pad(y, (0, pad))
    mup = jnp.pad(mu, ((0, pad), (0, 0)))
    s2p = jnp.pad(s2, ((0, pad), (0, 0)), constant_values=1.0)

    def f(args):
        yc, muc, s2c = args
        return moments(mp, sn2, yc, muc, s2c, W, ep_fraction)

    lZ, dlZ, d2lZ = jax.lax.map(
        f,
        (
            yp.reshape(nchunk, chunk),
            mup.reshape(nchunk, chunk, -1),
            s2p.reshape(nchunk, chunk, -1),
        ),
    )
    out_dim = mu.shape[-1]
    return (
        lZ.reshape(-1)[:T],
        dlZ.reshape(-1, out_dim)[:T],
        d2lZ.reshape(-1, out_dim)[:T],
    )
