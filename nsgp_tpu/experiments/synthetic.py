"""Synthetic 3-engine comparison (ref synthetic_data_experiment.m).

Samples from the GT-NMF prior, infers at the TRUE hyperparameters with all
three engines, and reports RMSE on the reconstructed signal, the subband
posteriors, and the (linked) modulator posteriors — the reference's
:242-253 table.

CLI: python -m nsgp_tpu.experiments.synthetic [--T 4000] [--seed 0]
Writes results/synthetic_comparison.json.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from nsgp_tpu.inference import registry
from nsgp_tpu.models.gtnmf import GTNMFModel, GTNMFParams, sample_prior
from nsgp_tpu.ops.moments import LINKS


def toy_model(D=6, N=2, seed=0, dtype=jnp.float64):
    model = GTNMFModel(D=D, N=N, kernel1="matern32", kernel2="matern52",
                       p_cubature=9)
    params = GTNMFParams(
        lik=jnp.asarray(1e-2, dtype),
        sub_var=jnp.ones((D,), dtype),
        sub_len=jnp.linspace(40.0, 120.0, D).astype(dtype),
        omega=jnp.linspace(0.1, 2.2, D).astype(dtype),
        mod_var=jnp.full((N,), 2.0, dtype),
        mod_len=jnp.linspace(200.0, 400.0, N).astype(dtype),
        W=jax.random.uniform(jax.random.PRNGKey(seed), (D, N), dtype,
                             minval=0.1, maxval=1.0),
    )
    return model, params


def _metrics(model, params, Eft, y, sub, g):
    link = LINKS[model.link]
    D = model.D
    z_hat, g_hat = np.asarray(Eft[:, :D]), np.asarray(Eft[:, D:])
    amps = np.asarray(link(jnp.asarray(g_hat)) @ params.W.T)
    if model.variant == "sq":
        amps = np.sqrt(np.maximum(amps, 1e-12))
    y_hat = (z_hat * amps).sum(-1)
    mods_true = np.asarray(link(g))
    mods_hat = np.asarray(link(jnp.asarray(g_hat)))
    return {
        "rmse_sig": float(np.sqrt(np.mean((y_hat - np.asarray(y)) ** 2))),
        "rmse_sub": float(np.sqrt(np.mean((z_hat - np.asarray(sub)) ** 2))),
        "rmse_mod": float(np.sqrt(np.mean((mods_hat - mods_true) ** 2))),
    }


def run(T=4000, seed=0, ep_itts=4, engines=("ep", "ihgp", "giekf"),
        engine_kwargs=None):
    """Returns {engine: {rmse_sig, rmse_sub, rmse_mod, seconds}}."""
    model, params = toy_model(seed=seed)
    y, sub, g = sample_prior(jax.random.PRNGKey(seed + 1), model, params, T=T)
    per_engine_kwargs = {
        "ep": dict(ep_itts=ep_itts),
        # IHGP needs the reference's heavy-damping regime (source_sep_piano.m
        # uses 0.025 x 10 iters); 0.5 damping diverges on low-noise toys.
        "ihgp": dict(ep_itts=4 * ep_itts, grid_lo=-4.0, damping=(0.1,)),
        "giekf": dict(g_iter=3, l_iter=5),
    }
    if engine_kwargs:
        for k, v in engine_kwargs.items():
            per_engine_kwargs[k].update(v)

    out = {"config": {"T": T, "seed": seed, "D": model.D, "N": model.N,
                      "ep_itts": ep_itts}}
    for eng in engines:
        t0 = time.perf_counter()
        res = registry.infer(eng, model, params, y, None,
                             **per_engine_kwargs[eng])
        m = _metrics(model, params, res.Eft, y, sub, g)
        m["seconds"] = round(time.perf_counter() - t0, 3)
        m["nlZ_final"] = float(np.asarray(res.nlZ)[-1]) if hasattr(res, "nlZ") else None
        out[eng] = m
    ystd = float(jnp.std(y))
    out["config"]["y_std"] = ystd
    return out


def _setup_backend(device: str):
    import jax

    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--T", type=int, default=4000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ep-itts", type=int, default=4)
    ap.add_argument("--out", default="results/synthetic_comparison.json")
    args = ap.parse_args()
    _setup_backend(args.device)
    res = run(T=args.T, seed=args.seed, ep_itts=args.ep_itts)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
