"""Speech denoising noise-level sweep (ref noise_reduction_speech.m).

Per speech file: pre-train on clean speech, add white noise at the
reference's 5 variances (noise_levels = [0.01 0.05 0.1 0.3 0.5], :34),
set the model's likelihood noise to the true level (:63), run EP, and
report SNR in/out per level.

CLI: python -m nsgp_tpu.experiments.denoising [--files speech0_female]
Writes results/noise_reduction_speech.json.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from nsgp_tpu.apps import denoise as dn
from nsgp_tpu.experiments import AUDIO_ROOT
from nsgp_tpu.pretrain import filterbank as fb_mod
from nsgp_tpu.pretrain import pipeline, spectral
from nsgp_tpu.utils import metrics
from nsgp_tpu.utils.audio import read_wav
from nsgp_tpu.utils.stoi import stoi

NOISE_LEVELS = (0.01, 0.05, 0.1, 0.3, 0.5)  # ref noise_reduction_speech.m:34


def run_file(
    path: str,
    D=12,
    N=3,
    kernel1="exp",
    seconds=1.0,
    ep_itts=30,  # ref noise_reduction_speech.m:21
    noise_levels=NOISE_LEVELS,
    seed=0,
    pretrain_kwargs=None,
):
    y_raw, fs = read_wav(path)
    y_raw = y_raw / (np.std(y_raw) + 1e-12)
    n = int(seconds * fs)
    y_clean = jnp.asarray(y_raw[:n])

    kw = dict(num_levels=2, steps_per_level=200)
    kw.update(pretrain_kwargs or {})
    tm = pipeline.train_gtnmf_fixed_params(
        y_clean, D=D, N=N, kernel1=kernel1, fs=float(fs),
        filterbank_kwargs=kw,
    )
    y_norm = y_clean / jnp.std(y_clean)

    # Wiener baseline (ref noise_reduction_results.m:23-63 compares against a
    # Wiener-filter baseline): a STATIONARY spectral-mixture fit to the clean
    # training signal, applied as an FFT Wiener filter with the observation
    # noise set to the true added variance — the classical no-modulator
    # counterpart of the GT-NMF model.
    wfit = spectral.fit_probstft_staged(y_norm, D, kernel=kernel1, **kw)
    w_len = wfit.lengthscales(kernel1)
    w_noise = float(jnp.maximum(wfit.noise, 1e-6))

    rows = []
    for i, v in enumerate(noise_levels):
        key = jax.random.PRNGKey(seed + i)
        y_noisy = y_norm + jnp.sqrt(v) * jax.random.normal(
            key, y_norm.shape, y_norm.dtype
        )
        t0 = time.perf_counter()
        # Reference EP regime (noise_reduction_speech.m:28-29): fraction
        # 0.75, damping 0.1.  The engine-default (0.5, 0.5) oscillates at
        # low noise (measured: 8.9 dB vs 26.3 dB at v=0.01).
        r = dn.denoise(tm.model, tm.params, y_noisy, float(v),
                       y_clean=y_norm, engine="ep", ep_itts=ep_itts,
                       ep_fraction=0.75, damping=(0.1,))
        Zw = fb_mod.fft_filterbank(
            wfit.sigma2, w_len, wfit.omega, y_noisy, kernel=kernel1,
            noise=v + w_noise,
        )
        y_wiener = jnp.sum(jnp.real(Zw), axis=-1)
        rows.append({
            "noise_var": v,
            "snr_in_db": float(r.snr_in),
            "snr_out_db": float(r.snr_out),
            "snr_gain_db": float(r.snr_out - r.snr_in),
            "snr_wiener_db": float(metrics.snr_db(y_norm, y_wiener)),
            "log_spec_snr_out_db": float(
                metrics.log_spec_snr_db(y_norm, r.y_hat)
            ),
            "log_spec_snr_wiener_db": float(
                metrics.log_spec_snr_db(y_norm, y_wiener)
            ),
            # STOI as the PESQ substitute (ref ships pesq.p as an
            # obfuscated binary; see utils/stoi.py)
            "stoi_in": round(stoi(np.asarray(y_norm), np.asarray(y_noisy), fs), 4),
            "stoi_out": round(stoi(np.asarray(y_norm), np.asarray(r.y_hat), fs), 4),
            "stoi_wiener": round(
                stoi(np.asarray(y_norm), np.asarray(y_wiener), fs), 4
            ),
            "seconds": round(time.perf_counter() - t0, 3),
        })
    return {"file": os.path.basename(path), "fs": fs, "D": D, "N": N,
            "ep_itts": ep_itts, "rows": rows}


def run(files=("speech0_female", "speech1_male"), **kwargs):
    out = {"experiment": "noise_reduction_speech",
           "noise_levels": NOISE_LEVELS, "files": []}
    for name in files:
        path = os.path.join(AUDIO_ROOT, "speech", f"{name}.wav")
        out["files"].append(run_file(path, **kwargs))
    # per-level aggregate over files (ref noise_reduction_results.m:23-63)
    agg = {}
    for f in out["files"]:
        for row in f["rows"]:
            agg.setdefault(row["noise_var"], []).append(
                (row["snr_out_db"], row.get("snr_wiener_db", np.nan))
            )
    out["aggregate"] = {
        str(k): {
            "mean_snr_out_db": float(np.mean([a for a, _ in v])),
            "mean_snr_wiener_db": float(np.mean([b for _, b in v])),
        }
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
    ap.add_argument("--files", nargs="+",
                    default=["speech0_female", "speech1_male"])
    ap.add_argument("--out", default="results/noise_reduction_speech.json")
    args = ap.parse_args()
    _setup_backend(args.device)
    res = run(files=tuple(args.files))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res["aggregate"], indent=2))


if __name__ == "__main__":
    main()
