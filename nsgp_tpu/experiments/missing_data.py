"""Missing-data music experiment (ref missing_data_music.m).

Per music file: pre-train a GT-NMF model on a training segment
(train_GTFNMF_fixed_params equivalent), NaN out gaps of growing length in a
test segment (the reference uses 6 gaps of 10-320 samples, :119), run the
engines, and score RMSE/SNR over the gaps.

CLI: python -m nsgp_tpu.experiments.missing_data [--files piano guitar]
Writes results/missing_data_music.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax.numpy as jnp
import numpy as np

from nsgp_tpu.apps import missing_data as md
from nsgp_tpu.experiments import AUDIO_ROOT
from nsgp_tpu.pretrain import pipeline
from nsgp_tpu.utils.audio import read_wav

GAP_LENGTHS = (10, 20, 40, 80, 160, 320)  # ref missing_data_music.m:119


def gaps_for(T: int, lengths=GAP_LENGTHS):
    """Evenly-spaced gaps of the reference's lengths, clear of the edges."""
    starts = np.linspace(0.1, 0.9, len(lengths)) * T
    return [(int(s), int(l)) for s, l in zip(starts, lengths)]


def run_file(
    path: str,
    D=12,
    N=3,
    kernel1="exp",
    train_seconds=1.0,
    test_seconds=1.0,
    engines=("ep", "ihgp"),
    ep_itts=(1, 8),
    ep_backend="xla",
    ihgp_parallel=False,
    pretrain_kwargs=None,
):
    import jax

    y_raw, fs = read_wav(path)
    y_raw = y_raw / (np.std(y_raw) + 1e-12)
    n_train = int(train_seconds * fs)
    n_test = int(test_seconds * fs)
    y_test = jnp.asarray(y_raw[n_train : n_train + n_test])

    kw = dict(num_levels=2, steps_per_level=200)
    kw.update(pretrain_kwargs or {})
    # Pre-train on the host CPU backend (many small jits compile for minutes
    # over the TPU tunnel); inference below runs on the default backend.
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        tm = pipeline.train_gtnmf_fixed_params(
            jnp.asarray(y_raw[:n_train]), D=D, N=N, kernel1=kernel1,
            fs=float(fs), filterbank_kwargs=kw,
        )
    tm = tm._replace(params=jax.device_put(jax.device_get(tm.params)))

    T = int(y_test.shape[0])
    mask = md.make_gap_mask(T, gaps_for(T))
    rows = []
    for eng in engines:
        for itts in ep_itts:
            # Reference settings (missing_data_music.m:23-26): ep_fraction
            # 0.75, damping 0.1 for EP; IHGP needs 0.0025 at many sweeps.
            ek = {}
            if eng in ("ep", "ihgp"):
                ek = {"ep_itts": itts, "ep_fraction": 0.75,
                      "damping": (0.1,)}
            if eng == "ihgp":
                ek["grid_lo"] = -4.0
                if itts > 1:
                    ek["damping"] = (0.0025,)
                if ihgp_parallel:
                    # blocked two-level steady scans (the long-signal fast
                    # path benched in bench.py)
                    ek["parallel"] = True
                    ek["chunk"] = 2048
            if eng == "giekf":
                # ref missing_data_music.m:128-129 runs the EKF with
                # g_iter = ep_itts global passes and 1 inner iteration
                ek = {"g_iter": itts, "l_iter": 1}
            if eng == "ep" and ep_backend != "xla":
                ek["backend"] = ep_backend
            t0 = time.perf_counter()
            r = md.fill_gaps(tm.model, tm.params, y_test, mask, engine=eng,
                             n_samples=20, **ek)
            rows.append({
                "engine": eng,
                "ep_itts": itts,
                "rmse_gaps": float(r.rmse_gaps),
                "snr_gaps_db": float(r.snr_gaps),
                "seconds": round(time.perf_counter() - t0, 3),
            })
    return {"file": os.path.basename(path), "fs": fs, "D": D, "N": N,
            "kernel1": kernel1, "rows": rows}


# Per-corpus defaults (ADVICE r2: the music defaults crash on --corpus
# speech; audio/speech holds speechK_{fe,}male.wav).
DEFAULT_FILES = {
    "music": ("piano", "guitar", "flute"),
    "speech": ("speech0_female", "speech1_male", "speech2_male"),
}


def resolve_audio(corpus: str, name: str) -> str:
    path = os.path.join(AUDIO_ROOT, corpus, f"{name}.wav")
    if not os.path.exists(path):
        have = sorted(
            f[:-4] for f in os.listdir(os.path.join(AUDIO_ROOT, corpus))
            if f.endswith(".wav")
        )
        raise FileNotFoundError(
            f"no {name}.wav in audio/{corpus}/ — available: {', '.join(have)}"
        )
    return path


def run(files=None, corpus="music", **kwargs):
    """corpus='music' is the paper driver (missing_data_music.m);
    corpus='speech' is the speech variant (test_missing_data.m)."""
    if files is None:
        files = DEFAULT_FILES[corpus]
    out = {"experiment": f"missing_data_{corpus}", "gap_lengths": GAP_LENGTHS,
           "files": []}
    for name in files:
        path = resolve_audio(corpus, name)
        t0 = time.perf_counter()
        out["files"].append(run_file(path, **kwargs))
        print(f"[missing_data] {name}: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
    # aggregation (ref missing_data_music_results.m:26-37); non-finite rows
    # (f32 divergence) are excluded and counted so they can't silently
    # poison the mean
    agg = {}
    for f in out["files"]:
        for row in f["rows"]:
            key = f"{row['engine']}_itts{row['ep_itts']}"
            agg.setdefault(key, []).append((row["snr_gaps_db"], row["rmse_gaps"]))
    out["aggregate"] = {
        k: {"mean_snr_gaps_db": float(np.nanmean([a for a, _ in v])),
            "mean_rmse_gaps": float(np.nanmean([b for _, b in v])),
            "n_nonfinite": int(sum(not np.isfinite(a) for a, _ in v))}
        for k, v in agg.items()
    }
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
    ap.add_argument("--files", nargs="+", default=None)
    ap.add_argument("--corpus", default="music", choices=["music", "speech"])
    ap.add_argument("--engines", nargs="+", default=["ep", "ihgp"],
                    choices=["ep", "ihgp", "giekf"])
    ap.add_argument("--itts", nargs="+", type=int, default=[1, 8])
    ap.add_argument("--ep-backend", default="xla", choices=["xla", "pallas"])
    # keep segment lengths uniform across files: each distinct test length is
    # a fresh shape -> full recompile of every engine config on the TPU
    ap.add_argument("--train-seconds", type=float, default=1.0)
    ap.add_argument("--test-seconds", type=float, default=1.0)
    ap.add_argument("--D", type=int, default=12)
    ap.add_argument("--N", type=int, default=3)
    ap.add_argument("--ihgp-parallel", action="store_true")
    ap.add_argument("--pretrain-levels", type=int, default=2)
    ap.add_argument("--pretrain-steps", type=int, default=200)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.out is None:
        args.out = f"results/missing_data_{args.corpus}.json"
    _setup_backend(args.device)
    files = tuple(args.files) if args.files else None
    res = run(files=files, corpus=args.corpus, engines=tuple(args.engines),
              ep_itts=tuple(args.itts), ep_backend=args.ep_backend,
              train_seconds=args.train_seconds,
              test_seconds=args.test_seconds, D=args.D, N=args.N,
              ihgp_parallel=args.ihgp_parallel,
              pretrain_kwargs=dict(num_levels=args.pretrain_levels,
                                   steps_per_level=args.pretrain_steps))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res["aggregate"], indent=2))


if __name__ == "__main__":
    main()
