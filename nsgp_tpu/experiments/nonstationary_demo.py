"""Nonstationary filterbank demo: full GT-NMF on 1 s of speech, three
interchangeable engines (ref demo_nonstationary_filterbank.m).

The reference demo (matlab/demo_nonstationary_filterbank.m:10-33,206-211)
runs the GT-NMF model on speech0_female (T = 24000, D = 12 exp subbands,
N = 3 matern52 modulators, w_lik = 1e-3, ep_fraction 0.5, damping 0.5,
ep_itts 3, p_cubature 9) and exposes EP / GIEKF / IHGP as drop-in
alternatives on the same model.  This driver reproduces that: one pre-trained
model, all three engines on the same signal, per-engine reconstruction
SNR / log-spec SNR / wall-clock and cross-engine posterior agreement.

CLI: python -m nsgp_tpu.experiments.nonstationary_demo [--device tpu]
Writes results/nonstationary_filterbank.json.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from nsgp_tpu.apps.missing_data import reconstruct_signal
from nsgp_tpu.experiments import AUDIO_ROOT
from nsgp_tpu.inference import registry
from nsgp_tpu.pretrain import pipeline
from nsgp_tpu.utils import metrics
from nsgp_tpu.utils.audio import load_normalized


def run(
    file="speech0_female",
    D=12,
    N=3,
    kernel1="exp",
    kernel2="matern52",
    seconds=1.0,
    offset=4500,  # ref :42 yTest = yTest(4501:...)
    w_lik=1e-3,  # ref :23
    ep_itts=8,
    pretrain_kwargs=None,
):
    # Reference preprocessing (:36-42): resample to 24 kHz, normalize the
    # WHOLE signal to unit variance, then slice [4501 : 4500 + T].
    path = os.path.join(AUDIO_ROOT, "speech", f"{file}.wav")
    y_norm, _, fs = load_normalized(path, fs_target=24000)
    T = int(seconds * fs)
    y = jnp.asarray(y_norm[offset : offset + T])

    kw = dict(num_levels=2, steps_per_level=200)
    kw.update(pretrain_kwargs or {})
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        tm = pipeline.train_gtnmf_fixed_params(
            y, D=D, N=N, kernel1=kernel1, kernel2=kernel2, fs=float(fs),
            filterbank_kwargs=kw,
        )
    params = tm.params._replace(lik=jnp.asarray(w_lik))
    params = jax.tree.map(lambda x: jax.device_put(jax.device_get(x)), params)

    # The demo script's literal regime (ref :29-32: fraction 0.5, damping
    # 0.5, 3 sweeps) oscillates at this likelihood level — measured 3.4 dB
    # EP reconstruction vs 20+ dB for the paper-experiment regime below
    # (the same failure mode documented in experiments/denoising.py).  The
    # reference's own paper experiments use (0.75, 0.1)
    # (noise_reduction_speech.m:28-29, missing_data_music.m:22-23), so
    # that's the regime the artifact reports.
    cfgs = {
        "ep": dict(ep_itts=ep_itts, ep_fraction=0.75, damping=(0.1,)),
        # grid_lo must leave room for R = lik / ttau at the strongest
        # sites: at w_lik 1e-3 the realized effective noise reaches ~1e-7,
        # and a clamped lookup silently returns the wrong steady covariance
        # (measured: 0.6 dB at grid_lo=-4 vs 18.4 dB at -7).
        # multi-sweep damping schedule per missing_data.engine_config (the
        # reference's flat small damping under-converges the re-site loop)
        "ihgp": dict(ep_itts=ep_itts, ep_fraction=0.75,
                     damping=(0.1,) if ep_itts <= 1 else (0.1, 0.025),
                     grid_lo=-7.0),
        # l_iter = 1 per the reference's experiment usage
        # (missing_data_music.m:129); the 5-inner-iteration IEKF variant
        # compounds with >= 4 global relinearization passes in f32 and
        # collapses the posterior (measured: 18.0 dB at g=2, 1.6 dB at
        # g=4 with l=5; 18.9 dB at g=8 with l=1 — all finite).
        "giekf": dict(g_iter=ep_itts, l_iter=1),
    }
    rows, efts = [], {}
    for eng, ek in cfgs.items():
        t0 = time.perf_counter()
        res = registry.infer(eng, tm.model, params, y, None, **ek)
        jax.block_until_ready(res.Eft)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = registry.infer(eng, tm.model, params, y, None, **ek)
        jax.block_until_ready(res.Eft)
        warm = time.perf_counter() - t0
        y_hat = reconstruct_signal(tm.model, params, res.Eft)
        efts[eng] = np.asarray(res.Eft)
        rows.append({
            "engine": eng,
            "snr_db": float(metrics.snr_db(y, y_hat)),
            "log_spec_snr_db": float(metrics.log_spec_snr_db(y, y_hat)),
            "seconds_cold": round(cold, 3),
            "seconds_warm": round(warm, 3),
        })

    # cross-engine posterior agreement on the observable means (the demo's
    # claim is three interchangeable solvers)
    agree = {}
    for a, b in (("ep", "ihgp"), ("ep", "giekf")):
        num = float(np.sqrt(np.mean((efts[a] - efts[b]) ** 2)))
        den = float(np.sqrt(np.mean(efts[a] ** 2)) + 1e-12)
        agree[f"{a}_vs_{b}_rel_rmse"] = round(num / den, 4)

    return {
        "experiment": "nonstationary_filterbank",
        "file": file,
        "fs": fs,
        "T": int(y.shape[0]),
        "D": D,
        "N": N,
        "kernel1": kernel1,
        "kernel2": kernel2,
        "ep_itts": ep_itts,
        "engines": rows,
        "agreement": agree,
    }


def main():
    import argparse

    from nsgp_tpu.experiments.missing_data import _setup_backend

    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--file", default="speech0_female")
    ap.add_argument("--out", default="results/nonstationary_filterbank.json")
    args = ap.parse_args()
    _setup_backend(args.device)
    res = run(file=args.file)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
