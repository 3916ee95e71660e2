"""Cubature rule exactness: each rule integrates Gaussian moments exactly
up to its stated polynomial order (the ut9 center-weight sign bug of
ut9_ws.m:78-79 is fixed in our implementation; these tests prove exactness
for n >= 3 where the reference rule fails E[1] = 1)."""

import numpy as np
import pytest

from nsgp_tpu.ops import cubature as cub


@pytest.mark.parametrize("p", [3, 5, 7, 9])
@pytest.mark.parametrize("n", [1, 2, 3, 5, 9])
def test_moment_exactness(p, n):
    W, SX = cub.unit_sigma_points(p, n)
    checks = {(0,): 1.0, (2,): 1.0}
    if p >= 5:
        checks[(4,)] = 3.0
        if n > 1:
            checks[(2, 2)] = 1.0
    if p >= 7:
        checks[(6,)] = 15.0
        if n > 1:
            checks[(4, 2)] = 3.0
        if n > 2:
            checks[(2, 2, 2)] = 1.0
    if p >= 9:
        checks[(8,)] = 105.0
        if n > 1:
            checks[(4, 4)] = 9.0
            checks[(6, 2)] = 15.0
        if n > 2:
            checks[(4, 2, 2)] = 3.0
        if n > 3:
            checks[(2, 2, 2, 2)] = 1.0
    for powers, want in checks.items():
        if len(powers) > n:
            continue
        val = W.copy()
        for axis, pw in enumerate(powers):
            val = val * SX[axis] ** pw
        assert abs(val.sum() - want) < 1e-9, (p, n, powers, val.sum(), want)


def test_odd_moments_vanish():
    for p in (3, 5, 7, 9):
        W, SX = cub.unit_sigma_points(p, 3)
        assert abs((W * SX[0]).sum()) < 1e-12
        assert abs((W * SX[0] ** 3).sum()) < 1e-12
        assert abs((W * SX[0] * SX[1] ** 2).sum()) < 1e-12


def test_point_counts():
    # Known sizes: ut3 -> 2n+1; ut5 -> 2n^2+1; ut7 adds u/v sets.
    for n in (2, 3, 5):
        W, SX = cub.unit_sigma_points(3, n)
        assert SX.shape == (n, 2 * n + 1)
        W, SX = cub.unit_sigma_points(5, n)
        assert SX.shape == (n, 2 * n * n + 1)


def test_gauss_hermite_tensor_grid():
    W, SX = cub.mvhermgauss_points(5, 2)
    assert SX.shape == (2, 25)
    assert abs(W.sum() - 1.0) < 1e-12
    assert abs((W * SX[0] ** 2).sum() - 1.0) < 1e-12
    assert abs((W * SX[0] ** 8).sum() - 105.0) < 1e-9  # p=5 exact to order 9


def test_gh_matches_symmetric_on_smooth_integrand():
    rng = np.random.default_rng(2)
    a = rng.normal(size=3)
    f = lambda x: np.log1p(np.exp(a @ x))
    W9, S9 = cub.unit_sigma_points(9, 3)
    Wg, Sg = cub.unit_sigma_points(11, 3, method="gh")
    v_sym = (W9 * np.apply_along_axis(f, 0, S9)).sum()
    v_gh = (Wg * np.apply_along_axis(f, 0, Sg)).sum()
    assert abs(v_sym - v_gh) < 1e-4
