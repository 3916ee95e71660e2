"""Headline benchmark: GT-NMF Power-EP inference on a 100k-sample signal.

Target (BASELINE.md / BASELINE.json north star): < 10 s per EP sweep on one
TPU v5e chip — the reference (single-threaded MATLAB) records no numbers, so
the 10 s/sweep operational target is the baseline.  ``vs_baseline`` is the
speedup over that target (> 1 is better).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from nsgp_tpu.inference import ep
    from nsgp_tpu.models.gtnmf import GTNMFModel, GTNMFParams, sample_prior

    D, N, T = 16, 3, 100_000
    EP_ITTS = 3
    dtype = jnp.float32

    model = GTNMFModel(D=D, N=N, kernel1="matern32", kernel2="matern52",
                       p_cubature=9)
    key = jax.random.PRNGKey(0)
    kw, ky = jax.random.split(key)
    params = GTNMFParams(
        lik=jnp.asarray(1e-3, dtype),
        sub_var=jnp.ones((D,), dtype),
        sub_len=jnp.linspace(50.0, 300.0, D).astype(dtype),
        omega=jnp.linspace(0.05, 2.8, D).astype(dtype),
        mod_var=jnp.full((N,), 2.0, dtype),
        mod_len=jnp.linspace(800.0, 2500.0, N).astype(dtype),
        W=jax.random.uniform(kw, (D, N), dtype, minval=0.1, maxval=1.0),
    )
    y, _, _ = sample_prior(ky, model, params, T=T)

    cfg = ep.EPConfig(ep_itts=EP_ITTS, parallel=True, moment_chunk=8192)

    def run(y):
        res = ep.ep_infer(model, params, y, None, cfg)
        return res.Eft, res.nlZ

    # Warm-up / compile
    out = run(y)
    jax.block_until_ready(out)

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(y)
    jax.block_until_ready(out)
    elapsed = (time.perf_counter() - t0) / reps
    per_sweep = elapsed / EP_ITTS

    baseline = 10.0  # seconds/sweep target on one chip (BASELINE.md)
    print(json.dumps({
        "metric": "gtnmf_ep_sweep_100k",
        "value": round(per_sweep, 4),
        "unit": "s/sweep",
        "vs_baseline": round(baseline / per_sweep, 2),
    }))


if __name__ == "__main__":
    main()
