"""Golden posterior regression fixture (tests/golden/ep_toy.npz).

The reference's de-facto correctness goldens are its seeded toy demos
(demo_toy_modulators_nmf.m:13-14,177-178); ours is a committed f64
sequential-EP posterior on a seeded prior sample (scripts/make_golden.py).

- The SEQUENTIAL EP engine must reproduce the fixture exactly (bit-level on
  the same BLAS; 1e-9 guard for cross-platform drift) — any regression in
  the filter/smoother/moment stack trips this.
- The parallel (associative-scan) path must agree except for the documented
  last-step re-match quirk (difference decays geometrically from t=T-1).
- IHGP / GIEKF approximate the same posterior but the toy's near-noiseless
  likelihood (sn2=1e-3) makes the per-subband decomposition weakly
  identified, so cross-engine checks compare signal RECONSTRUCTIONS (what
  the reference's synthetic_data_experiment.m:242-253 RMSE tables measure),
  not pointwise posteriors.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from nsgp_tpu.inference import ep, giekf, ihgp

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "ep_toy.npz")


@pytest.fixture(scope="module")
def golden():
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from scripts.make_golden import toy

    g = np.load(GOLDEN)
    model, params, y = toy()
    np.testing.assert_allclose(np.asarray(y), g["y"], atol=1e-12)
    return model, params, y, g


def _recon(model, params, Eft):
    from nsgp_tpu.ops.moments import LINKS

    D = model.D
    amps = np.asarray(LINKS[model.link](jnp.asarray(Eft[:, D:])) @ params.W.T)
    return (np.asarray(Eft[:, :D]) * amps).sum(-1)


def test_sequential_ep_reproduces_golden(golden):
    model, params, y, g = golden
    r = ep.ep_infer(model, params, y, None, ep.EPConfig(ep_itts=5, parallel=False))
    np.testing.assert_allclose(np.asarray(r.Eft), g["Eft"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(r.Varft), g["Varft"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(r.nlZ), g["nlZ"], rtol=1e-9)


def test_parallel_ep_matches_golden(golden):
    model, params, y, g = golden
    r = ep.ep_infer(model, params, y, None, ep.EPConfig(ep_itts=5, parallel=True))
    d = np.abs(np.asarray(r.Eft) - g["Eft"])
    # Bulk agreement; the last-step quirk perturbs the final ~50 steps
    # (measured: 2.3e-3 bulk, 1.3e-2 at the end).
    assert d[:-50].max() < 5e-3, d[:-50].max()
    assert d.max() < 3e-2, d.max()


def test_ihgp_reconstruction_matches_golden(golden):
    """The toy's sn2 = 1e-3 produces site precisions beyond the reference's
    logspace(-2, 4) effective-noise grid, so widen it (grid_lo=-4).  The
    reference-exact engine needs the reference's heavy-damping IHGP regime
    (damping 0.025-0.1, e.g. source_sep_piano.m:84-88): at damping 0.5 the
    EP fixed-point iteration DIVERGES on this near-noiseless toy (verified
    identical divergence in the line-faithful oracle), while 0.1 x 12
    sweeps converges to rmse 0.18 vs EP's 0.05 on ystd 2.05."""
    model, params, y, g = golden
    r = ihgp.ihgp_infer(
        model, params, y, None,
        ihgp.IHGPConfig(ep_itts=12, grid_lo=-4.0, grid_fine=300,
                        damping=(0.1,)),
    )
    y_ih = _recon(model, params, np.asarray(r.Eft))
    rmse_ih = np.sqrt(np.mean((y_ih - np.asarray(y)) ** 2))
    assert rmse_ih < 0.3, rmse_ih
    assert np.isfinite(np.asarray(r.nlZ)).all()


def test_giekf_reconstruction_matches_golden(golden):
    model, params, y, g = golden
    r = giekf.giekf_infer(model, params, y, None,
                          giekf.GIEKFConfig(g_iter=3, l_iter=5))
    y_ep = _recon(model, params, g["Eft"])
    y_kf = _recon(model, params, np.asarray(r.Eft))
    rmse_ep = np.sqrt(np.mean((y_ep - np.asarray(y)) ** 2))
    rmse_kf = np.sqrt(np.mean((y_kf - np.asarray(y)) ** 2))
    assert rmse_kf < 3.0 * rmse_ep + 0.05, (rmse_kf, rmse_ep)
