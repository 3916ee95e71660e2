"""Stage-by-stage timing diagnosis of the headline EP bench on the TPU chip.

Usage: python scripts/diag_bench.py [T] [--seq]
Prints wall-clock per stage: model build, prior sample, ADF sweep (compile +
run), smoother, resite, full ep_infer.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def tic(label, fn, *args, **kw):
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    out = jax.block_until_ready(out)
    t1 = time.perf_counter()
    print(f"  {label:40s} {t1 - t0:8.2f} s", flush=True)
    return out


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    parallel = "--seq" not in sys.argv
    D, N = 16, 3
    dtype = jnp.float32

    from nsgp_tpu.inference import ep
    from nsgp_tpu.models.gtnmf import GTNMFModel, GTNMFParams, sample_prior
    from nsgp_tpu.ops import kalman

    print(f"devices={jax.devices()} T={T} parallel={parallel}", flush=True)

    model = GTNMFModel(D=D, N=N, kernel1="matern32", kernel2="matern52",
                       p_cubature=9)
    key = jax.random.PRNGKey(0)
    kw_, ky = jax.random.split(key)
    params = GTNMFParams(
        lik=jnp.asarray(1e-3, dtype),
        sub_var=jnp.ones((D,), dtype),
        sub_len=jnp.linspace(50.0, 300.0, D).astype(dtype),
        omega=jnp.linspace(0.05, 2.8, D).astype(dtype),
        mod_var=jnp.full((N,), 2.0, dtype),
        mod_len=jnp.linspace(800.0, 2500.0, N).astype(dtype),
        W=jax.random.uniform(kw_, (D, N), dtype, minval=0.1, maxval=1.0),
    )

    y, _, _ = tic("sample_prior", lambda: sample_prior(ky, model, params, T=T))
    y = y[0] if isinstance(y, tuple) else y

    ssm = tic("build_ssm", lambda: model.build_ssm(params))
    C = ssm.num_channels
    print(f"  C={C} bs={ssm.A.shape[-1]}", flush=True)

    # Stage: ADF sweep alone (compile then run)
    mask = jnp.ones((T,), bool)
    sites0 = kalman.init_sites(T, C, dtype)
    mom_fn = ep._mom_point(model, params)

    adf = jax.jit(lambda s: kalman.adf_filter(ssm, y, mask, s, mom_fn, 0.5,
                                              None, True))
    tic("adf_filter compile+run", adf, sites0)
    fr, lZ, sites = tic("adf_filter run", adf, sites0)

    smo = jax.jit(lambda f: kalman.rts_smoother(ssm, f))
    tic("rts_smoother compile+run", smo, fr)
    ms, Ps = tic("rts_smoother run", smo, fr)

    if parallel:
        from nsgp_tpu.ops import pscan

        fb = jax.jit(lambda s: pscan.filter_smoother_with_sites(ssm, s))
        tic("pscan fwd-bwd compile+run", fb, sites)
        tic("pscan fwd-bwd run", fb, sites)

    mu, var = kalman.observable_marginals(ssm, ms, Ps)
    cfg = ep.EPConfig(ep_itts=3, parallel=parallel, moment_chunk=8192)
    rs = jax.jit(lambda s: ep._ep_resite(model, params, cfg, y, mask, mu, var,
                                         s, 0.5))
    tic("ep_resite compile+run", rs, sites)
    tic("ep_resite run", rs, sites)

    run = lambda: ep.ep_infer(model, params, y, None, cfg)
    tic("ep_infer compile+run", run)
    tic("ep_infer run", run)
    tic("ep_infer run", run)


if __name__ == "__main__":
    main()
