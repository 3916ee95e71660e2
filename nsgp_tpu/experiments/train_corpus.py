"""Corpus pre-training driver (ref train_speech.m / train_music.m /
train_textures.m: loop corpus files x kernels through
train_GTFNMF_fixed_params, saving trained_<file>_<kernel> artifacts).

CLI: python -m nsgp_tpu.experiments.train_corpus --corpus speech \\
         [--kernels exp matern32] [--limit 3]
Writes results/trained/<corpus>/trained_<file>_<kernel>.npz and a summary
results/train_<corpus>.json.
"""

from __future__ import annotations

import json
import os
import time

import jax.numpy as jnp
import numpy as np

from nsgp_tpu.experiments import AUDIO_ROOT
from nsgp_tpu.inference import ep
from nsgp_tpu.pretrain import pipeline
from nsgp_tpu.utils.audio import read_wav


def run(
    corpus="speech",
    kernels=("exp",),
    D=16,
    N=3,
    seconds=1.0,
    limit=None,
    out_dir="results/trained",
    pretrain_kwargs=None,
    eval_seconds=0.25,
):
    """Train per-(file, kernel) models; returns a summary table.

    Each artifact also records the 1-sweep EP energy on a held-out segment
    so corpus-level fit quality is comparable across files.
    """
    root = os.path.join(AUDIO_ROOT, corpus)
    files = sorted(f for f in os.listdir(root) if f.endswith(".wav"))
    if limit:
        files = files[: int(limit)]
    kw = dict(num_levels=2, steps_per_level=200)
    kw.update(pretrain_kwargs or {})
    os.makedirs(os.path.join(out_dir, corpus), exist_ok=True)

    rows = []
    for fname in files:
        y_raw, fs = read_wav(os.path.join(root, fname))
        y_raw = y_raw / (np.std(y_raw) + 1e-12)
        n = int(seconds * fs)
        y = jnp.asarray(y_raw[:n])
        y_eval = jnp.asarray(y_raw[n : n + int(eval_seconds * fs)])
        y_eval = y_eval / (jnp.std(y_eval) + 1e-12)
        for kernel in kernels:
            t0 = time.perf_counter()
            tm = pipeline.train_gtnmf_fixed_params(
                y, D=D, N=N, kernel1=kernel, fs=float(fs),
                filterbank_kwargs=kw,
            )
            stem = os.path.splitext(fname)[0]
            path = os.path.join(out_dir, corpus,
                                f"trained_{stem}_{kernel}.npz")
            pipeline.save_trained(path, tm)
            e = float(ep.ep_energy(tm.model, tm.params, y_eval, None,
                                   ep.EPConfig(ep_itts=1)))
            rows.append({
                "file": fname, "kernel": kernel, "artifact": path,
                "heldout_energy_per_sample": round(e / int(y_eval.shape[0]), 4),
                "seconds": round(time.perf_counter() - t0, 2),
            })
            print(rows[-1], flush=True)
    return {"experiment": f"train_{corpus}", "D": D, "N": N,
            "train_seconds_per_file": seconds, "rows": rows}


def _setup_backend(device: str):
    import jax

    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--corpus", default="speech",
                    choices=["speech", "music", "textures"])
    ap.add_argument("--kernels", nargs="+", default=["exp"])
    ap.add_argument("--limit", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    _setup_backend(args.device)
    res = run(corpus=args.corpus, kernels=tuple(args.kernels),
              limit=args.limit)
    out = args.out or f"results/train_{args.corpus}.json"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
