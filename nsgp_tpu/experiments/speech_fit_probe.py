"""Per-file model-fit probe for the sub-3dB speech files (VERDICT r5 item 5).

Round 4 traced the speech missing-data spread (0.3-4.7 dB) to per-file
pretrain fit quality, not the inference or the optimizer.  This driver
retrains the weak files with fit variations:

- ``base``    : the shipped artifact (reference recipe, D=16, 3 anneal
                levels x 400 steps);
- ``d24``     : D = 24 subbands (more spectral components for breathy /
                wideband voices);
- ``anneal``  : finer coarse-to-fine schedule (4 levels x 600 steps);
- ``d24_anneal``: both.

Selection is honest: arms are scored by EP@20 gap SNR on VALIDATION gaps
(reference gap positions shifted by +2500 samples, away from the test
gaps); only the selected arm is then evaluated on the REFERENCE test gaps
and (optionally, --promote) saved over the shipped artifact with the arm
recorded in the summary JSON.

CLI: python -m nsgp_tpu.experiments.speech_fit_probe \\
        [--files speech1_male ...] [--kernel matern32] [--promote]
Writes results/speech_fit_probe.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ARMS = {
    "base": {},
    "d24": {"D": 24},
    "anneal": {"filterbank_kwargs": {"num_levels": 4,
                                     "steps_per_level": 600}},
    "d24_anneal": {"D": 24,
                   "filterbank_kwargs": {"num_levels": 4,
                                         "steps_per_level": 600}},
}


def _gap_mask(name, T, shift=0):
    import jax.numpy as jnp

    from nsgp_tpu.experiments import protocol

    mask = np.ones((T,), bool)
    for c in protocol.GAP_POSITIONS[name]:
        c = min(max(c + shift, protocol.GAP_HALF + 1),
                T - protocol.GAP_HALF - 2)
        mask[c - protocol.GAP_HALF : c + protocol.GAP_HALF + 1] = False
    return jnp.asarray(mask)


def _gap_snr(tm, y_norm, mask):
    import jax
    import jax.numpy as jnp

    from nsgp_tpu.apps import missing_data as md
    from nsgp_tpu.experiments import protocol
    from nsgp_tpu.experiments.missing_data import engine_config

    params = tm.params._replace(
        lik=jnp.asarray(protocol.W_LIK_MISSING,
                        jnp.asarray(tm.params.lik).dtype))
    r = md.fill_gaps(tm.model, params, jnp.asarray(y_norm), mask,
                     engine="ep", n_samples=200, **engine_config("ep", 20))
    return float(r.snr_gaps)


def train_arms(files, kernel="matern32", corpus="speech",
               out_dir="results/trained/speech_probe"):
    """Phase 1 (CPU/f64): train every (file, arm) variant and save .npz.

    Training runs in f64 on CPU exactly like the shipped corpus artifacts
    (train_corpus defaults to --device cpu); the spectral/GPPAD/NMF/SE-GP
    stages are not f32-safe on TPU (probe round-5: retrained arms NaN'd).
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from nsgp_tpu.experiments import AUDIO_ROOT, protocol
    from nsgp_tpu.pretrain import pipeline
    from nsgp_tpu.utils.audio import load_normalized

    os.makedirs(out_dir, exist_ok=True)
    for name in files:
        y_norm, normaliser, _ = load_normalized(
            os.path.join(AUDIO_ROOT, corpus, f"{name}.wav"),
            fs_target=protocol.FS_REFERENCE)
        for arm, kw in ARMS.items():
            if arm == "base":
                continue
            path = os.path.join(out_dir, f"{name}_{kernel}_{arm}.npz")
            if os.path.exists(path):
                continue
            t0 = time.perf_counter()
            tm = pipeline.train_gtnmf_fixed_params(
                jnp.asarray(y_norm), kernel1=kernel, N=3,
                fs=protocol.FS_REFERENCE, **kw)
            tm = tm._replace(normaliser=normaliser)
            pipeline.save_trained(path, tm)
            print({"file": name, "arm": arm, "trained_s":
                   round(time.perf_counter() - t0, 1)},
                  file=sys.stderr, flush=True)


def run(files, kernel="matern32", corpus="speech", promote=False,
        out_dir="results/trained/speech_probe",
        save_path="results/speech_fit_probe.json"):
    """Phase 2 (TPU): evaluate each trained arm on validation gaps, select
    per file, score the selection on the reference test gaps."""
    import jax.numpy as jnp

    from nsgp_tpu.experiments import AUDIO_ROOT, protocol, train_corpus
    from nsgp_tpu.pretrain import pipeline
    from nsgp_tpu.utils.audio import load_normalized

    out = {"experiment": "speech_fit_probe", "kernel": kernel,
           "selection": "EP@20 SNR on validation gaps (+2500 shift)",
           "files": []}
    for name in files:
        y_norm, normaliser, _ = load_normalized(
            os.path.join(AUDIO_ROOT, corpus, f"{name}.wav"),
            fs_target=protocol.FS_REFERENCE)
        T = len(y_norm)
        val_mask = _gap_mask(name, T, shift=2500)
        test_mask = _gap_mask(name, T, shift=0)
        row = {"file": name, "arms": {}}
        tms = {}
        for arm in ARMS:
            t0 = time.perf_counter()
            try:
                if arm == "base":
                    tm, _ = train_corpus.load_corpus_model(corpus, name,
                                                           kernel)
                else:
                    path = os.path.join(out_dir,
                                        f"{name}_{kernel}_{arm}.npz")
                    if not os.path.exists(path):
                        continue
                    tm = pipeline.load_trained(path, full=True)
                val = _gap_snr(tm, y_norm, val_mask)
                tms[arm] = tm
                row["arms"][arm] = {
                    "val_snr_db": round(val, 3),
                    "seconds": round(time.perf_counter() - t0, 1),
                }
            except Exception as e:
                row["arms"][arm] = {"error": f"{type(e).__name__}: {e}"[:200]}
            print({"file": name, "arm": arm, **row["arms"].get(arm, {})},
                  file=sys.stderr, flush=True)
        ok = {a: r["val_snr_db"] for a, r in row["arms"].items()
              if "val_snr_db" in r and np.isfinite(r["val_snr_db"])}
        best = max(ok, key=ok.get)
        row["selected"] = best
        row["test_snr_db_base"] = round(_gap_snr(tms["base"], y_norm,
                                                 test_mask), 3)
        row["test_snr_db_selected"] = (
            row["test_snr_db_base"] if best == "base"
            else round(_gap_snr(tms[best], y_norm, test_mask), 3))
        if promote and best != "base":
            path = train_corpus.trained_path(corpus, name, kernel)
            pipeline.save_trained(path, tms[best])
            row["promoted"] = True
        print({"file": name, "selected": best,
               "test_base": row["test_snr_db_base"],
               "test_selected": row["test_snr_db_selected"]},
              file=sys.stderr, flush=True)
        out["files"].append(row)
    os.makedirs(os.path.dirname(save_path), exist_ok=True)
    with open(save_path, "w") as f:
        json.dump(out, f, indent=2)
    return out


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--files", nargs="+",
                    default=["speech1_male", "speech4_male", "speech5_male",
                             "speech7_female", "speech9_female",
                             "speech6_female", "speech0_female"])
    ap.add_argument("--kernel", default="matern32")
    ap.add_argument("--phase", choices=["train", "eval"], required=True)
    ap.add_argument("--promote", action="store_true")
    args = ap.parse_args()
    if args.phase == "train":
        train_arms(files=args.files, kernel=args.kernel)
    else:
        run(files=args.files, kernel=args.kernel, promote=args.promote)


if __name__ == "__main__":
    main()
