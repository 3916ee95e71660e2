"""Piano 3-note source separation (ref source_sep_piano.m).

Per instrument: pre-train a GT-NMF model on each note's training recording
(MIDI 60/64/67), stack the three models block-diagonally with the
reference's explicit mixture likelihood (w_lik = 1e-4, :84-88), run joint
inference on the mixture, and score per-source SNR against the ground-truth
parts (C/E/G).

CLI: python -m nsgp_tpu.experiments.source_sep [--instrument 011PFNOM]
Writes results/source_sep_<instrument>.json.
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
from nsgp_tpu.utils.audio import read_wav

NOTES = ("M60", "M64", "M67")
PARTS = ("C", "E", "G")
MIX_LIK = 1e-4  # ref source_sep_piano.m w_lik


def run(
    instrument="011PFNOM",
    D=8,
    N=2,
    kernel1="exp",
    train_seconds=2.0,
    test_offset=6.0,  # ref test_ind = 96001:192000 — the CHORD section
    test_seconds=6.0,
    engine="ihgp",
    ep_itts=10,  # ref ep_itts_test = 10
    damping=0.025,  # ref ep_damping = 0.025
    pretrain_kwargs=None,
):
    import jax

    root = os.path.join(AUDIO_ROOT, "source_sep")
    kw = dict(num_levels=2, steps_per_level=200)
    kw.update(pretrain_kwargs or {})

    models, params = [], []
    t0 = time.perf_counter()
    # Pre-training is many small jitted stages — cheap on the host CPU,
    # minutes of compile tax on the TPU tunnel.  Only the joint inference
    # below benefits from the chip.
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        for note in NOTES:
            y, fs = read_wav(os.path.join(root, "training_data",
                                          f"{instrument}_{note}_train.wav"))
            n = int(train_seconds * fs)
            tm = pipeline.train_gtnmf_fixed_params(
                jnp.asarray(y[:n]), D=D, N=N, kernel1=kernel1, fs=float(fs),
                filterbank_kwargs=kw,
            )
            models.append(tm.model)
            params.append(jax.device_get(tm.params))
    params = [jax.device_put(p) for p in params]
    train_s = time.perf_counter() - t0

    y_mix, fs = read_wav(os.path.join(root, "test_data",
                                      f"{instrument}_mixture.wav"))
    lo = int(test_offset * fs)
    hi = lo + int(test_seconds * fs)
    y_mix = y_mix[lo:hi]
    scale = np.std(y_mix) + 1e-12
    parts = np.stack(
        [read_wav(os.path.join(root, "test_data",
                               f"{instrument}_{p}_part.wav"))[0][lo:hi]
         for p in PARTS], axis=-1,
    ) / scale
    y_mix = jnp.asarray(y_mix / scale)

    ek = {"ep_itts": ep_itts, "damping": (damping,)}
    if engine == "ihgp":
        ek["grid_lo"] = -4.0
    t0 = time.perf_counter()
    r = ss.separate(models, params, y_mix, engine=engine,
                    true_sources=jnp.asarray(parts), n_samples=20,
                    mixture_lik=MIX_LIK, **ek)
    sep_s = time.perf_counter() - t0

    # mixture-as-estimate baseline: using the full mixture for every source
    base = [float(_snr(parts[:, j], np.asarray(y_mix))) for j in range(3)]
    return {
        "experiment": "source_sep",
        "instrument": instrument,
        "engine": engine,
        "ep_itts": ep_itts,
        "D_per_source": D,
        "N_per_source": N,
        "snr_db": [float(s) for s in np.asarray(r.snr)],
        "snr_baseline_db": base,
        "pretrain_seconds": round(train_s, 2),
        "separate_seconds": round(sep_s, 2),
    }


def _snr(x, x_hat):
    num = np.sum(x**2)
    den = np.sum((x - x_hat) ** 2) + 1e-12
    return 10.0 * np.log10(num / den)


def _setup_backend(device: str):
    import jax

    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--instrument", default="011PFNOM")
    ap.add_argument("--engine", default="ihgp")
    ap.add_argument("--D", type=int, default=8)
    ap.add_argument("--N", type=int, default=2)
    ap.add_argument("--itts", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    _setup_backend(args.device)
    res = run(instrument=args.instrument, engine=args.engine, D=args.D,
              N=args.N, ep_itts=args.itts)
    out = args.out or f"results/source_sep_{args.instrument}.json"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
