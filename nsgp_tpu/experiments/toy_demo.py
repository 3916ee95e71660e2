"""Toy GT-NMF demo (ref demo_toy_modulators_nmf.m / demo_toy_modulators.m).

Samples subbands + modulators from the prior at fixed seeds, runs EP
inference at the true hyperparameters, and prints signal/subband/modulator
RMSEs and the per-sweep energies — the reference's de-facto correctness
demo (:13-14, :177-178).  Pass --per-subband for the non-NMF model
(one modulator per subband, ss_modulators.m: N = D, W = I).

CLI: python -m nsgp_tpu.experiments.toy_demo [--T 2000] [--per-subband]
Writes results/toy_demo.json.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from nsgp_tpu.experiments.synthetic import _metrics, toy_model
from nsgp_tpu.inference import ep
from nsgp_tpu.models.gtnmf import per_subband_params, sample_prior


def run(T=2000, seed=123, ep_itts=5, per_subband=False):
    model, params = toy_model(D=6, N=2, seed=seed)
    if per_subband:
        # non-NMF model: one modulator per subband (gf_ep_modulator.m path)
        params = per_subband_params(
            params.lik, params.sub_var, params.sub_len, params.omega,
            jnp.full((model.D,), 2.0), jnp.linspace(200.0, 400.0, model.D),
        )
        model = model._replace(N=model.D)
    y, sub, g = sample_prior(jax.random.PRNGKey(seed + 1), model, params, T=T)
    res = ep.ep_infer(model, params, y, None, ep.EPConfig(ep_itts=ep_itts))
    m = _metrics(model, params, res.Eft, y, sub, g)
    m.update({
        "model": "per_subband" if per_subband else "nmf",
        "T": T, "seed": seed, "ep_itts": ep_itts,
        "y_std": float(jnp.std(y)),
        "nlZ": np.asarray(res.nlZ).tolist(),
        "maxdiff": np.asarray(res.maxdiff).tolist(),
    })
    return m


def _setup_backend(device: str):
    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--T", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--per-subband", action="store_true")
    ap.add_argument("--out", default="results/toy_demo.json")
    args = ap.parse_args()
    _setup_backend(args.device)
    res = run(T=args.T, seed=args.seed, per_subband=args.per_subband)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
