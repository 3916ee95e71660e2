"""Batched, jittable Riccati (DARE) and discrete-Lyapunov solvers.

The reference relies on MATLAB's ``dare()`` (ihgp_ep_modulator_nmf.m:112-191,
kernel_ss_kalmanFastFB.m:49) — a LAPACK Schur method, neither jittable nor
batchable.  We use the *structure-preserving doubling algorithm* (SDA):
quadratically convergent, fixed iteration count, nothing but batched small
matmuls and solves — ideal for TPU (hundreds of (bs x bs) DAREs solved as one
vmapped program, bs <= 8).

Filtering DARE solved here (prediction covariance form):

    P = A P A' + Q - A P h (h' P h + r)^{-1} h' P A'

with scalar measurement row ``h`` and noise ``r``.  This is the dual of the
control DARE, so SDA runs on (A', h h'/r, Q):

    A_{k+1} = A_k (I + G_k H_k)^{-1} A_k
    G_{k+1} = G_k + A_k (I + G_k H_k)^{-1} G_k A_k'
    H_{k+1} = H_k + A_k' H_k (I + G_k H_k)^{-1} A_k,   H_k -> P.

The smoother steady covariance solves the discrete Lyapunov equation
PS = G PS G' + QQ (reference's ``dare(G', 0, QQ)``), by squaring-doubling:
X <- X + M X M', M <- M M (converges since rho(G) < 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sym(M):
    return 0.5 * (M + jnp.swapaxes(M, -1, -2))


def dare_filter(A, h, Q, r, iters: int = 30, ridge: float = 0.0):
    """Steady-state *prediction* covariance P of a scalar-output Kalman filter.

    Args:
      A: (bs, bs) transition.  h: (bs,) measurement row.  Q: (bs, bs) process
      noise.  r: () measurement noise variance.  All batchable via vmap.
    Returns (bs, bs) P solving the filtering DARE above.
    """
    bs = A.shape[-1]
    I = jnp.eye(bs, dtype=A.dtype)
    Ak = jnp.swapaxes(A, -1, -2)  # dual: run SDA on A'
    Gk = jnp.outer(h, h) / r
    Hk = Q + ridge * I

    def body(i, carry):
        Ak, Gk, Hk = carry
        W = I + Gk @ Hk
        WinvA = jnp.linalg.solve(W, Ak)
        A_next = Ak @ WinvA
        G_next = Gk + Ak @ jnp.linalg.solve(W, Gk @ jnp.swapaxes(Ak, -1, -2))
        H_next = Hk + jnp.swapaxes(Ak, -1, -2) @ Hk @ WinvA
        return A_next, _sym(G_next), _sym(H_next)

    _, _, P = jax.lax.fori_loop(0, iters, body, (Ak, Gk, Hk))
    return _sym(P)


def dare_residual(P, A, h, Q, r):
    """Relative fixed-point residual of the filtering DARE at ``P``.

    The reference detects failed ``dare()`` calls and drops those grid
    points (ihgp_ep_modulator_nmf.m:114-128); the doubling iteration cannot
    raise, so failures are detected by this residual instead (large or
    non-finite => no valid stabilizing solution, e.g. an undetectable
    unstable channel).
    """
    Ph = jnp.einsum("...ij,...j->...i", P, h)
    S = jnp.einsum("...i,...i->...", h, Ph) + r
    APh = jnp.einsum("...ij,...j->...i", A, Ph)
    P_next = (
        jnp.einsum("...ij,...jk,...lk->...il", A, P, A)
        + Q
        - APh[..., :, None] * APh[..., None, :] / S[..., None, None]
    )
    num = jnp.linalg.norm(P_next - P, axis=(-2, -1))
    den = 1.0 + jnp.linalg.norm(P, axis=(-2, -1))
    res = num / den
    return jnp.where(jnp.isfinite(res), res, jnp.inf)


def dlyap_doubling(M, Q, iters: int = 30):
    """Solve X = M X M' + Q by squaring-doubling (rho(M) < 1 required)."""

    def body(i, carry):
        Mk, Xk = carry
        X_next = Xk + Mk @ Xk @ jnp.swapaxes(Mk, -1, -2)
        return Mk @ Mk, _sym(X_next)

    _, X = jax.lax.fori_loop(0, iters, body, (M, _sym(Q)))
    return X


def cubic_interp_matrix(xg, xq):
    """Catmull-Rom cubic interpolation weights from grid ``xg`` (sorted, 1-D,
    uniform or log-uniform handled by the caller passing transformed coords)
    to query points ``xq``.  Equivalent of the reference's
    ``apxGrid('interp', {ro}, r, 3)`` usage (ihgp_ep_modulator_nmf.m:130-133).

    Returns W (len(xq), len(xg)) with rows summing to 1, as a numpy array
    (static precomputation).
    """
    import numpy as np

    xg = np.asarray(xg, np.float64)
    xq = np.asarray(xq, np.float64)
    n = xg.shape[0]
    W = np.zeros((xq.shape[0], n))
    # assume uniform spacing in the transformed coordinate
    dx = xg[1] - xg[0]
    t_all = (xq - xg[0]) / dx
    i1 = np.clip(np.floor(t_all).astype(int), 0, n - 2)
    t = t_all - i1
    # Catmull-Rom basis on points i1-1, i1, i1+1, i1+2 (clamped at edges)
    w_m1 = 0.5 * (-t + 2 * t**2 - t**3)
    w_0 = 0.5 * (2 - 5 * t**2 + 3 * t**3)
    w_p1 = 0.5 * (t + 4 * t**2 - 3 * t**3)
    w_p2 = 0.5 * (-(t**2) + t**3)
    rows = np.arange(xq.shape[0])
    for off, w in ((-1, w_m1), (0, w_0), (1, w_p1), (2, w_p2)):
        idx = np.clip(i1 + off, 0, n - 1)
        np.add.at(W, (rows, idx), w)
    return W
