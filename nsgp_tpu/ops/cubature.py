"""Gaussian quadrature / fully-symmetric cubature rules.

Re-implementation of the reference's sigma-point machinery
(matlab/symmetric-cubature-rules/{ut3,ut5,ut7,ut9}_ws.m, sym_set.m,
matlab/mvhermgauss.m, matlab/gauher.m) as *static* numpy precomputation:
the points/weights depend only on (order p, dimension n), both Python ints,
so they are built once on host and baked into the jitted computation as
constants — no dynamic shapes inside XLA.

Rules return ``(weights (S,), points (n, S))`` for the standard normal
N(0, I_n); callers scale/shift per-site: ``x = mu + sqrt(s2) * points``.
"""

from __future__ import annotations

import functools
import math
from itertools import combinations, product

import numpy as np

__all__ = ["unit_sigma_points", "gauss_hermite", "mvhermgauss_points"]


# ---------------------------------------------------------------------------
# Fully-symmetric point sets (McNamee & Stenger 1967) — ref sym_set.m
# ---------------------------------------------------------------------------


def _sym_set(n: int, gen: tuple[float, ...]) -> np.ndarray:
    """All fully-symmetric permutations/sign-flips of the generator ``gen``
    embedded in n dims.  Returns (n, S).  Mirrors sym_set.m:1-40 (including
    its treatment of repeated vs distinct generator entries)."""
    if len(gen) == 0:
        return np.zeros((n, 1))
    vals = list(gen)
    # Distinct absolute values and their multiplicities
    cols = []
    uniq = []
    for v in vals:
        if not any(abs(v - u) < 1e-12 for u in uniq):
            uniq.append(v)
    counts = [sum(1 for v in vals if abs(v - u) < 1e-12) for u in uniq]
    # choose disjoint position sets for each distinct value, then sign flips
    positions = range(n)

    def rec(avail: tuple[int, ...], gi: int, placed: list[tuple[int, float]]):
        if gi == len(uniq):
            for signs in product([1.0, -1.0], repeat=len(placed)):
                col = np.zeros(n)
                for (i, v), s in zip(placed, signs):
                    col[i] = s * v
                cols.append(col)
            return
        for combo in combinations(avail, counts[gi]):
            rest = tuple(a for a in avail if a not in combo)
            rec(rest, gi + 1, placed + [(i, uniq[gi]) for i in combo])

    rec(tuple(positions), 0, [])
    if not cols:  # generator needs more slots than dimensions provide
        return np.zeros((n, 0))
    return np.array(cols).T  # (n, S)


def _ut3(n: int):
    """3rd-order UT, kappa=0 (ref ut3_ws.m:7-26, with Arno's kappa=0)."""
    kappa = 0.0
    W = np.full(2 * n + 1, 1.0 / (2 * (n + kappa)))
    W[0] = kappa / (n + kappa)
    SX = np.concatenate([np.zeros((n, 1)), np.eye(n), -np.eye(n)], axis=1)
    SX = math.sqrt(n + kappa) * SX
    return W, SX


def _ut5(n: int):
    """5th-order rule (ref ut5_ws.m)."""
    I0, I2, I4, I22 = 1.0, 1.0, 3.0, 1.0
    u = math.sqrt(I4 / I2)
    A0 = I0 - n * (I2 / I4) ** 2 * (I4 - 0.5 * (n - 1) * I22)
    A1 = 0.5 * (I2 / I4) ** 2 * (I4 - (n - 1) * I22)
    A11 = 0.25 * (I2 / I4) ** 2 * I22
    U0 = _sym_set(n, ())
    U1 = _sym_set(n, (u,))
    U2 = _sym_set(n, (u, u))
    SX = np.concatenate([U0, U1, U2], axis=1)
    W = np.concatenate(
        [np.full(U0.shape[1], A0), np.full(U1.shape[1], A1), np.full(U2.shape[1], A11)]
    )
    return W, SX


def _ndownk(n: int, k: int) -> float:
    return math.prod(range(n - k + 1, n + 1)) / math.factorial(k)


def _ut7(n: int):
    """7th-order rule (ref ut7_ws.m)."""
    I222, I22, I24, I2, I6, I4, I0 = 1.0, 1.0, 3.0, 1.0, 15.0, 3.0, 1.0
    r = np.roots([I2**2 - I0 * I4, 0.0, -(I2 * I4 - I0 * I6), 0.0, I4**2 - I2 * I6])
    r = np.real(r[np.real(r) > 0])
    u, v = float(r[0]), float(r[1])
    u2, u4, u6 = u * u, u**4, u**6
    v2, v4, v6 = v * v, v**4, v**6
    A111 = I222 / 8.0 / u6
    M = np.array([[u4, v4], [u6, v6]])
    rhs = np.array([I22, I24]) - 8.0 * (n - 2) * np.array([u4, u6]) * A111
    A11, A22 = 0.25 * np.linalg.solve(M, rhs)
    M2 = np.array([[u2, v2], [u4, v4]])
    rhs2 = np.array([I2, I4]) - 8.0 * (n - 1) * (n - 2) / 2.0 * np.array([u2, u4]) * A111
    t = -2.0 * (n - 1) * np.array([A11, A22]) + 0.5 * np.linalg.solve(M2, rhs2)
    A1, A2 = t
    A0 = (
        I0
        - 2 * n * (A1 + A2)
        - 4 * n * (n - 1) / 2 * (A11 + A22)
        - 8 * n * (n - 1) * (n - 2) / 6 * A111
    )
    sets = [
        (_sym_set(n, ()), A0),
        (_sym_set(n, (u,)), A1),
        (_sym_set(n, (v,)), A2),
        (_sym_set(n, (u, u)), A11),
        (_sym_set(n, (v, v)), A22),
        (_sym_set(n, (u, u, u)), A111),
    ]
    SX = np.concatenate([s for s, _ in sets], axis=1)
    W = np.concatenate([np.full(s.shape[1], a) for s, a in sets])
    return W, SX


def _ut9(n: int):
    """9th-order rule (ref ut9_ws.m:21-100)."""
    I2222, I224, I222 = 1.0, 3.0, 1.0
    I44, I26, I24, I22 = 9.0, 15.0, 3.0, 1.0
    I8, I6, I4, I2, I0 = 105.0, 15.0, 3.0, 1.0, 1.0
    r = np.roots([I4**2 - I2 * I6, 0.0, -(I4 * I6 - I2 * I8), 0.0, I6**2 - I4 * I8])
    r = np.real(r[np.real(r) > 0])
    u, v = float(r[0]), float(r[1])
    u2, u4, u6, u8 = u**2, u**4, u**6, u**8
    v2, v4, v6, v8 = v**2, v**4, v**6, v**8
    A1111 = I2222 / 16.0 / u8
    M68 = np.array([[u6, v6], [u8, v8]])
    t = np.linalg.solve(M68, np.array([I222, I224]) - 16.0 * (n - 3) * A1111 * np.array([u6, u8])) / 8.0
    A111, A222 = t
    A12 = (I26 - I44) / (4.0 * u2 * v2 * (u2 - v2) ** 2)
    rhs = (
        np.array([I24, I26])
        - 4.0 * np.array([u4 * v2 + u2 * v4, u6 * v2 + u2 * v6]) * A12
        - 16.0 * _ndownk(n - 2, 2) * np.array([u6, u8]) * A1111
    )
    t = -2.0 * (n - 2) * np.array([A111, A222]) + 0.25 * np.linalg.solve(M68, rhs)
    A11, A22 = t
    M24 = np.array([[u2, v2], [u4, v4]])
    rhs = np.array([I2, I4]) - 16.0 * _ndownk(n - 1, 3) * np.array([u2, u4]) * A1111
    t = (
        -2.0 * (n - 1) * np.array([A11 + A12, A22 + A12])
        - 4.0 * _ndownk(n - 1, 2) * np.array([A111, A222])
        + 0.5 * np.linalg.solve(M24, rhs)
    )
    A1, A2 = t
    # NOTE: the reference (ut9_ws.m:78-79) has a `- -8*...` double negative
    # here, which breaks E[1]=1 for n>=3 (inert for the n=2 demos).  We use
    # the correct McNamee-Stenger sign (-8), verified by moment exactness
    # tests up to order 9.
    A0 = (
        I0
        - 2 * n * (A1 + A2)
        - 4 * _ndownk(n, 2) * (A11 + 2 * A12 + A22)
        - 8 * _ndownk(n, 3) * (A111 + A222)
        - 16 * _ndownk(n, 4) * A1111
    )
    sets = [
        (_sym_set(n, ()), A0),
        (_sym_set(n, (u,)), A1),
        (_sym_set(n, (v,)), A2),
        (_sym_set(n, (u, u)), A11),
        (_sym_set(n, (u, v)), A12),
        (_sym_set(n, (v, v)), A22),
        (_sym_set(n, (u, u, u)), A111),
        (_sym_set(n, (v, v, v)), A222),
        (_sym_set(n, (u, u, u, u)), A1111),
    ]
    sets = [(s, a) for s, a in sets if s.shape[1] > 0]
    SX = np.concatenate([s for s, _ in sets], axis=1)
    W = np.concatenate([np.full(s.shape[1], a) for s, a in sets])
    return W, SX


# ---------------------------------------------------------------------------
# Gauss-Hermite (probabilists') — ref gauher.m / mvhermgauss.m
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def gauss_hermite(p: int):
    """1-D Gauss-Hermite nodes/weights for N(0,1): sum w_i f(x_i) ~ E[f]."""
    x, w = np.polynomial.hermite_e.hermegauss(p)
    w = w / math.sqrt(2.0 * math.pi)
    return w, x


@functools.lru_cache(maxsize=64)
def mvhermgauss_points(p: int, n: int):
    """Tensor-grid GH rule for N(0, I_n): (weights (p^n,), points (n, p^n)).

    Ref: mvhermgauss.m:15-23."""
    w1, x1 = gauss_hermite(p)
    grids = np.meshgrid(*([x1] * n), indexing="ij")
    pts = np.stack([g.reshape(-1) for g in grids], axis=0)
    wgrids = np.meshgrid(*([w1] * n), indexing="ij")
    W = np.ones(pts.shape[1])
    for g in wgrids:
        W = W * g.reshape(-1)
    return W, pts


@functools.lru_cache(maxsize=64)
def unit_sigma_points(p: int, n: int, method: str = "symmetric"):
    """Unit sigma points for the n-dim standard normal.

    ``p in {3,5,7,9}`` with method='symmetric' uses the McNamee-Stenger
    fully-symmetric rules (ref utp_ws.m dispatch); otherwise falls back to
    tensor-grid Gauss-Hermite of order p (ref likModulatorNMFPower.m:32-41).
    Returns ``(weights (S,), points (n, S))`` as float64 numpy arrays.
    """
    if method == "symmetric" and p in (3, 5, 7, 9):
        W, SX = {3: _ut3, 5: _ut5, 7: _ut7, 9: _ut9}[p](n)
    else:
        W, SX = mvhermgauss_points(p, n)
    return np.asarray(W, np.float64), np.asarray(SX, np.float64)
