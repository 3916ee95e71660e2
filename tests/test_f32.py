"""f32 vs f64 numerics audit of the inference engines (SURVEY 7.3 item 1).

bench.py runs the engines in f32 on the TPU chip while the rest of the suite
is f64-on-CPU; these tests pin the f32 path's accuracy on the same toy
posteriors.  (TPU-specific bf16-matmul hazards are separately neutralized by
utils.precision.f32_matmuls on every engine entry point.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from nsgp_tpu.inference import ep, ihgp
from nsgp_tpu.models.gtnmf import GTNMFModel, GTNMFParams, sample_prior


def _toy(dtype, D=4, N=2, T=512):
    model = GTNMFModel(D=D, N=N, kernel1="matern32", kernel2="matern52",
                       p_cubature=9)
    key = jax.random.PRNGKey(11)
    kw, ky = jax.random.split(key)
    params = GTNMFParams(
        lik=jnp.asarray(1e-3, dtype),
        sub_var=jnp.ones((D,), dtype),
        sub_len=jnp.linspace(30.0, 90.0, D).astype(dtype),
        omega=jnp.linspace(0.2, 2.0, D).astype(dtype),
        mod_var=jnp.full((N,), 2.0, dtype),
        mod_len=jnp.linspace(120.0, 260.0, N).astype(dtype),
        W=jax.random.uniform(kw, (D, N), dtype, minval=0.1, maxval=1.0),
    )
    return model, params, ky


def _cast(params, dtype):
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)


def test_ep_f32_matches_f64_posterior():
    model, p64, ky = _toy(jnp.float64)
    y64, _, _ = sample_prior(ky, model, p64, T=512)
    cfg = ep.EPConfig(ep_itts=3)
    r64 = ep.ep_infer(model, p64, y64, None, cfg)
    r32 = ep.ep_infer(model, _cast(p64, jnp.float32),
                      y64.astype(jnp.float32), None, cfg)

    scale = float(jnp.std(r64.Eft))
    dE = float(jnp.max(jnp.abs(r32.Eft.astype(jnp.float64) - r64.Eft)))
    assert dE < 2e-2 * scale, (dE, scale)
    assert np.all(np.asarray(r32.Varft) > 0)
    dV = float(jnp.max(jnp.abs(r32.Varft.astype(jnp.float64) - r64.Varft)
                       / (r64.Varft + 1e-3)))
    assert dV < 5e-2, dV
    # energies agree to ~f32 accumulation error over T=512 terms
    n64, n32 = np.asarray(r64.nlZ), np.asarray(r32.nlZ)
    assert np.all(np.isfinite(n32))
    np.testing.assert_allclose(n32, n64, rtol=1e-3)


def test_ihgp_f32_matches_f64_posterior():
    """IHGP's steady-state tables are looked up by a rounded grid index
    (1/ttau on a 200-cell log grid), so a site precision sitting near a cell
    boundary lands in DIFFERENT cells in f32 vs f64 — pointwise max-norm
    agreement is structurally impossible (the reference's nearest-neighbor
    lookup has the same discretization sensitivity).  Audit the f32 path by
    energy agreement and typical (quantile) posterior error instead."""
    model, p64, ky = _toy(jnp.float64)
    y64, _, _ = sample_prior(ky, model, p64, T=512)
    cfg = ihgp.IHGPConfig(ep_itts=2)
    r64 = ihgp.ihgp_infer(model, p64, y64, None, cfg)
    r32 = ihgp.ihgp_infer(model, _cast(p64, jnp.float32),
                          y64.astype(jnp.float32), None, cfg)
    scale = float(jnp.std(r64.Eft))
    dE = np.abs(np.asarray(r32.Eft, np.float64) - np.asarray(r64.Eft))
    assert float(np.quantile(dE, 0.95)) < 5e-2 * scale, np.quantile(dE, 0.95)
    n32 = np.asarray(r32.nlZ)
    assert np.all(np.isfinite(n32))
    np.testing.assert_allclose(n32, np.asarray(r64.nlZ), rtol=5e-3)
