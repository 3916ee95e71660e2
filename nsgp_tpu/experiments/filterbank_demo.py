"""Stationary probabilistic filterbank demo (ref demo_stationary_filterbank.m).

Fits a D-component probabilistic filterbank to real speech (staged
exp -> matern32 Whittle fit), computes the complex subband decomposition
with the steady-state Kalman filterbank, reconstructs the signal from it,
and gap-fills missing samples with the exact (slow, masked) filterbank —
reporting reconstruction SNR and gap SNR like the reference's :204-226.

CLI: python -m nsgp_tpu.experiments.filterbank_demo [--file speech0_female]
Writes results/filterbank_demo.json.
"""

from __future__ import annotations

import json
import os
import time

import jax.numpy as jnp
import numpy as np

from nsgp_tpu.experiments import AUDIO_ROOT
from nsgp_tpu.pretrain import filterbank as fbm
from nsgp_tpu.pretrain import spectral
from nsgp_tpu.utils import metrics
from nsgp_tpu.utils.audio import read_wav


def run(file="speech0_female", D=12, kernel="matern32", seconds=0.75,
        gap=(6000, 200), fit_kwargs=None):
    path = os.path.join(AUDIO_ROOT, "speech", f"{file}.wav")
    y_raw, fs = read_wav(path)
    y = jnp.asarray(y_raw[: int(seconds * fs)])
    y = y / jnp.std(y)
    T = int(y.shape[0])

    kw = dict(num_levels=4, steps_per_level=400)
    kw.update(fit_kwargs or {})
    t0 = time.perf_counter()
    fit = spectral.fit_probstft_staged(y, D, kernel=kernel, **kw)
    fit_s = time.perf_counter() - t0

    fb = fbm.build_filterbank(
        fit.sigma2, fit.lengthscales(kernel), fit.omega, kernel=kernel,
        # the annealed-shrinkage fit can drive the noise to ~0; the steady
        # DARE bank needs it positive (the reference passes an explicit
        # vary to kernel_ss_probFB instead of the fitted noise)
        noise=max(float(fit.noise), 1e-6),
    )

    # Steady (fast/IHGP) path: subband decomposition + reconstruction.
    t0 = time.perf_counter()
    r = fbm.steady_filterbank(fb, y)
    fb_s = time.perf_counter() - t0
    y_rec = jnp.sum(jnp.real(r.Z), axis=-1)  # sum of subband means
    snr_rec = float(metrics.snr_db(y, y_rec))

    # Exact masked path: NaN a gap and inpaint (ref's slow-Kalman gap fill).
    lo, ln = gap
    mask = jnp.ones((T,), bool).at[lo : lo + ln].set(False)
    y_gap = jnp.where(mask, y, jnp.nan)
    re = fbm.exact_filterbank(fb, y_gap)
    y_fill = jnp.sum(jnp.real(re.Z), axis=-1)
    gap_sl = ~mask
    snr_gap = float(metrics.snr_db(y, y_fill, gap_sl))

    return {
        "experiment": "filterbank_demo",
        "file": file,
        "fs": fs,
        "D": D,
        "kernel": kernel,
        "T": T,
        "fit_seconds": round(fit_s, 2),
        "filterbank_seconds": round(fb_s, 3),
        "lml": float(r.lml),
        "snr_reconstruction_db": snr_rec,
        "snr_gap_fill_db": snr_gap,
        "omega": np.asarray(fit.omega).round(4).tolist(),
        "sigma2": np.asarray(fit.sigma2).round(5).tolist(),
    }


def _setup_backend(device: str):
    import jax

    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--file", default="speech0_female")
    ap.add_argument("--out", default="results/filterbank_demo.json")
    args = ap.parse_args()
    _setup_backend(args.device)
    res = run(file=args.file)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
