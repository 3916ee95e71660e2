"""Piano 3-note source separation under the reference protocol
(ref source_sep_piano.m / train_source_sep.m / source_sep_results.m).

Protocol:
- per note (MIDI 60/64/67): pre-train a D=16/N=3 'exp' GT-NMF model on the
  whole 16 kHz training recording (train_source_sep.m:11-14) — artifacts
  cached in results/trained/source_sep/;
- test: the mixture recording resampled to 16 kHz and normalized by ITS
  variance; segment test_ind = 96001:192000 (the 6 s chord section,
  source_sep_piano.m:110); ground-truth parts share the mixture's
  normaliser and are divided by 3 (:116-125 — the corpus mixture is the
  average of the parts);
- joint inference: the three models stacked block-diagonally with mixture
  w_lik = 1e-4, ep_itts = 10, damping 0.025 (:57,:86-87);
- outputs: per-source SNR (snr(y_part, y_part - Esig_j)), per-source
  log-spectral SNR, and reconstructed per-source wavs — the data behind
  source_sep_results.m's figures.

CLI: python -m nsgp_tpu.experiments.source_sep [--instrument 011PFNOM]
Writes results/source_sep_<instrument>.json (+ wavs under results/wavs/).
"""

from __future__ import annotations

import json
import os
import time

import jax.numpy as jnp
import numpy as np

from nsgp_tpu.apps import source_sep as ss
from nsgp_tpu.experiments import AUDIO_ROOT
from nsgp_tpu.pretrain import pipeline
from nsgp_tpu.utils import metrics
from nsgp_tpu.utils.audio import load_normalized, read_wav, resample, write_wav

NOTES = ("M60", "M64", "M67")
PARTS = ("C", "E", "G")
MIX_LIK = 1e-4  # ref source_sep_piano.m:57
FS = 16000
TEST_IND = (96000, 192000)  # 0-based [96001:192000] (ref :110)


def _note_model(instrument, note, kernel1="exp", D=16, N=3,
                out_dir="results/trained", pretrain_kwargs=None):
    """Train (or load) the per-note model on the whole 16 kHz recording."""
    path = os.path.join(out_dir, "source_sep",
                        f"trained_{instrument}_{note}_{kernel1}.npz")
    if os.path.exists(path):
        return pipeline.load_trained(path, full=True)
    y_norm, normaliser, fs = load_normalized(
        os.path.join(AUDIO_ROOT, "source_sep", "training_data",
                     f"{instrument}_{note}_train.wav"), fs_target=FS,
    )
    kw = dict(num_levels=3, steps_per_level=300)
    kw.update(pretrain_kwargs or {})
    tm = pipeline.train_gtnmf_fixed_params(
        jnp.asarray(y_norm), D=D, N=N, kernel1=kernel1, fs=float(fs),
        filterbank_kwargs=kw,
    )
    tm = tm._replace(normaliser=normaliser)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pipeline.save_trained(path, tm)
    return tm


def run(
    instrument="011PFNOM",
    D=16,  # ref train_source_sep.m:12
    N=3,
    kernel1="exp",
    engine="ep",
    ep_itts=10,  # ref source_sep_piano.m:87
    damping=0.025,  # ref :86
    n_samples=200,
    save_wavs=True,
    pretrain_kwargs=None,
    out_dir="results/trained",
):
    import jax

    t0 = time.perf_counter()
    cpu = jax.local_devices(backend="cpu")[0]
    models, params = [], []
    with jax.default_device(cpu):
        for note in NOTES:
            tm = _note_model(instrument, note, kernel1, D, N, out_dir,
                             pretrain_kwargs)
            models.append(tm.model)
            params.append(jax.device_get(tm.params))
    params = [jax.device_put(p) for p in params]
    train_s = time.perf_counter() - t0

    # Test mixture: 16 kHz, normalized by its own variance (ref :103-112)
    test_dir = os.path.join(AUDIO_ROOT, "source_sep", "test_data")
    y_mix, normaliser, _ = load_normalized(
        os.path.join(test_dir, f"{instrument}_mixture.wav"), fs_target=FS,
    )
    lo, hi = TEST_IND
    y_test = jnp.asarray(y_mix[lo:hi])
    # Ground-truth parts: mixture normaliser, then /3 (ref :116-125)
    parts = []
    for p in PARTS:
        yp, fsp = read_wav(os.path.join(test_dir, f"{instrument}_{p}_part.wav"))
        yp = resample(yp, FS, fsp) / normaliser / 3.0
        parts.append(yp[lo:hi])
    parts = np.stack(parts, axis=-1)  # (T, 3)

    ek = {"ep_itts": ep_itts, "damping": (damping,), "ep_fraction": 0.75}
    if engine == "ihgp":
        ek["grid_lo"] = -7.0
        ek["parallel"] = True
        ek["chunk"] = 2048
    if engine == "ep" and jax.default_backend() not in ("cpu",):
        # TPU path (VERDICT r4 item 2): host-loop batched EP at BF=1 with
        # sigma-point chunking — the N=9 ut9 cubature (3973 points) streams
        # through VMEM in 256-point chunks, and per-sweep executions stay
        # under the TPU-tunnel watchdog.  moment_chunk bounds the XLA
        # re-site intermediate (chunk, 3973, 48) to ~50 MB.
        ek["backend"] = "pallas"
        ek["s_chunk"] = 256
        ek["moment_chunk"] = 64
    # NOTE: on the axon backend block_until_ready can return before the
    # dispatch finishes; a device->host fetch is the only reliable sync
    # (see bench.py).
    t0 = time.perf_counter()
    r = ss.separate(models, params, y_test, engine=engine,
                    true_sources=jnp.asarray(parts), n_samples=n_samples,
                    mixture_lik=MIX_LIK, **ek)
    np.asarray(r.sources)
    sep_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = ss.separate(models, params, y_test, engine=engine,
                    true_sources=jnp.asarray(parts), n_samples=n_samples,
                    mixture_lik=MIX_LIK, **ek)
    np.asarray(r.sources)
    sep_warm = time.perf_counter() - t0

    src = np.asarray(r.sources)
    if save_wavs:
        os.makedirs("results/wavs", exist_ok=True)
        peak = max(np.abs(src).max(), 1e-9)
        for j, p in enumerate(PARTS):
            write_wav(f"results/wavs/{instrument}_{p}_est.wav",
                      src[:, j] / peak * 0.9, FS)

    # mixture-as-estimate baseline: the trivial "no separation" predictor
    base = [float(metrics.snr_db(jnp.asarray(parts[:, j]), y_test))
            for j in range(3)]
    return {
        "experiment": "source_sep",
        "protocol": "reference (16 kHz, whole-file-trained notes, "
                    "test_ind 96001:192000, parts/3)",
        "instrument": instrument,
        "engine": engine,
        "ep_itts": ep_itts,
        "damping": damping,
        "D_per_source": D,
        "N_per_source": N,
        "snr_db": [float(s) for s in np.asarray(r.snr)],
        "snr_baseline_db": base,
        "log_spec_snr_db": [
            float(metrics.log_spec_snr_db(jnp.asarray(parts[:, j]),
                                          jnp.asarray(src[:, j])))
            for j in range(3)
        ],
        "log_spec_snr_baseline_db": [
            float(metrics.log_spec_snr_db(jnp.asarray(parts[:, j]), y_test))
            for j in range(3)
        ],
        "pretrain_seconds": round(train_s, 2),
        "separate_seconds_cold": round(sep_cold, 2),
        "separate_seconds_warm": round(sep_warm, 2),
    }


def _setup_backend(device: str):
    import jax

    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="tpu", choices=["cpu", "tpu"])
    ap.add_argument("--instrument", default="011PFNOM")
    ap.add_argument("--engine", default="ep", choices=["ep", "ihgp", "giekf"])
    ap.add_argument("--D", type=int, default=16)
    ap.add_argument("--N", type=int, default=3)
    ap.add_argument("--itts", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    _setup_backend(args.device)
    res = run(instrument=args.instrument, engine=args.engine, D=args.D,
              N=args.N, ep_itts=args.itts)
    out = args.out or (
        f"results/source_sep_{args.instrument}"
        + f"_{args.engine}.json"
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
