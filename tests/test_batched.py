"""Batched multi-file inference: parity with the single-file engines.

The batched paths must be bit-for-bit (XLA vmap) or numerically tight
(lane-batched Pallas layout) against running each file alone — the layout
transform and the selector-matmul segment reductions must not change the
math (see nsgp_tpu.inference.batched).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsgp_tpu.inference import batched, ep, giekf, ihgp
from nsgp_tpu.models.gtnmf import GTNMFModel, GTNMFParams, sample_prior


def _toy_files(BF=3, D=4, N=2, T=320, seed=0):
    model = GTNMFModel(D=D, N=N, kernel1="exp", kernel2="matern52",
                       p_cubature=7)
    plist, ys, masks = [], [], []
    for b in range(BF):
        key = jax.random.PRNGKey(seed + 17 * b)
        kp, ks, km = jax.random.split(key, 3)
        params = GTNMFParams(
            lik=jnp.asarray(0.05 + 0.01 * b),
            sub_var=jnp.linspace(0.5, 1.5 + 0.2 * b, D),
            sub_len=jnp.linspace(30.0, 90.0 + 5 * b, D),
            omega=jnp.linspace(0.2, 1.2, D) * (1.0 + 0.03 * b),
            mod_var=jnp.full((N,), 1.5 + 0.1 * b),
            mod_len=jnp.linspace(200.0, 400.0, N),
            W=jax.random.uniform(kp, (D, N), minval=0.2, maxval=1.0),
        )
        y, _, _ = sample_prior(ks, model, params, T=T)
        mask = jnp.ones((T,), bool).at[40 + 10 * b : 80 + 10 * b].set(False)
        plist.append(params)
        ys.append(y)
        masks.append(mask)
    return (model, batched.stack_params(plist), plist,
            jnp.stack(ys), jnp.stack(masks))


def test_ep_batch_pallas_matches_single():
    model, paramsB, plist, yB, maskB = _toy_files()
    cfg = ep.EPConfig(ep_itts=3, backend="pallas", pallas_block=64)
    res = batched.ep_infer_batch(model, paramsB, yB, maskB, cfg)
    for b in range(3):
        r1 = ep.ep_infer(model, plist[b], yB[b], maskB[b], cfg)
        np.testing.assert_allclose(np.asarray(res.Eft[b]),
                                   np.asarray(r1.Eft), atol=1e-9)
        np.testing.assert_allclose(np.asarray(res.Varft[b]),
                                   np.asarray(r1.Varft), atol=1e-9)
        np.testing.assert_allclose(np.asarray(res.nlZ[b]),
                                   np.asarray(r1.nlZ), rtol=1e-9)


def test_ep_batch_s_chunk_invariant():
    """Chunked sigma-point accumulation (online max-rescale) must reproduce
    the single-chunk result exactly up to fp reordering."""
    model, paramsB, plist, yB, maskB = _toy_files(BF=2)
    cfg0 = ep.EPConfig(ep_itts=2, backend="pallas", pallas_block=64)
    cfg7 = cfg0._replace(s_chunk=7)  # S=? (ut7, N=2) — odd chunk forces
    # a ragged last chunk through the validity mask
    r0 = batched.ep_infer_batch(model, paramsB, yB, maskB, cfg0)
    r7 = batched.ep_infer_batch(model, paramsB, yB, maskB, cfg7)
    np.testing.assert_allclose(np.asarray(r0.Eft), np.asarray(r7.Eft),
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(r0.nlZ), np.asarray(r7.nlZ),
                               rtol=1e-11)


def test_ep_batch_xla_vmap_matches_single():
    model, paramsB, plist, yB, maskB = _toy_files(BF=2)
    cfg = ep.EPConfig(ep_itts=2)  # sequential XLA backend
    res = batched.ep_infer_batch(model, paramsB, yB, maskB, cfg)
    for b in range(2):
        r1 = ep.ep_infer(model, plist[b], yB[b], maskB[b], cfg)
        np.testing.assert_allclose(np.asarray(res.Eft[b]),
                                   np.asarray(r1.Eft), atol=1e-10)
        np.testing.assert_allclose(np.asarray(res.nlZ[b]),
                                   np.asarray(r1.nlZ), rtol=1e-10)


def test_ihgp_batch_matches_single():
    model, paramsB, plist, yB, maskB = _toy_files(BF=2, T=256)
    cfg = ihgp.IHGPConfig(ep_itts=2, grid_lo=-5.0)
    res = batched.ihgp_infer_batch(model, paramsB, yB, maskB, cfg)
    for b in range(2):
        r1 = ihgp.ihgp_infer(model, plist[b], yB[b], maskB[b], cfg)
        np.testing.assert_allclose(np.asarray(res.Eft[b]),
                                   np.asarray(r1.Eft), atol=1e-10)


def test_giekf_batch_matches_single():
    model, paramsB, plist, yB, maskB = _toy_files(BF=2, T=256)
    cfg = giekf.GIEKFConfig(g_iter=2, l_iter=1)
    res = batched.giekf_infer_batch(model, paramsB, yB, maskB, cfg)
    for b in range(2):
        r1 = giekf.giekf_infer(model, plist[b], yB[b], maskB[b], cfg)
        np.testing.assert_allclose(np.asarray(res.Eft[b]),
                                   np.asarray(r1.Eft), atol=1e-10)
        np.testing.assert_allclose(float(res.nll[b]), float(r1.nll),
                                   rtol=1e-10)
