"""Speech denoising noise-level sweep under the reference protocol
(ref noise_reduction_speech.m).

Protocol: the clean signal is the whole 16 kHz unit-variance trained signal
(y_norm); white noise at the reference's 5 variances is added
(yTest = y_norm + sqrt(v) randn, :63); w_lik is set to the true level v
(:80); EP runs 30 sweeps at fraction 0.75, damping 0.1 (:21,:28-29);
reconstruction is 200 MC samples through the sqrt-link (:139-144).

Baselines/metrics beyond the reference's SNR+RMSE: an FFT Wiener filter
built from the SAME stage-1 stationary spectral fit the trained model used
(the no-modulator counterpart), log-spectral SNR, and STOI (the PESQ
substitute — the reference ships pesq.p as an obfuscated binary).

CLI: python -m nsgp_tpu.experiments.denoising [--files speech0_female ...]
Writes results/noise_reduction_speech.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from nsgp_tpu.apps import denoise as dn
from nsgp_tpu.experiments import protocol, train_corpus
from nsgp_tpu.pretrain import filterbank as fb_mod
from nsgp_tpu.utils import metrics
from nsgp_tpu.utils.speech_quality import fw_seg_snr
from nsgp_tpu.utils.stoi import stoi


def run_file(
    corpus: str,
    name: str,
    kernel1: str = "exp",
    ep_itts: int = 30,  # ref noise_reduction_speech.m:21
    engine: str = "ep",
    noise_levels=protocol.NOISE_LEVELS,
    seed: int = 0,
    pad_T: int | None = None,
    n_samples: int = 200,  # ref :113 (s = 200)
    stat_floor: float = 1.0,  # kappa of the headline readout (see
    # apps.denoise.tv_wiener.stat_floor); 1.0 = never suppress harder than
    # the stationary Wiener — the round-5 sweep's STOI/waveform-SNR winner
    # (kappa=0, the pure TV gain, wins log-spec SNR + fwSegSNR and is
    # recorded per row under 'blend')
    blend_arms: tuple = (0.0, 0.25, 0.5, 0.75, 1.0),  # recorded kappa sweep
):
    tm, y_norm = train_corpus.load_corpus_model(corpus, name, kernel1)
    T = len(y_norm)
    Tp = pad_T or T
    fs = int(tm.fs)
    y_clean = jnp.asarray(y_norm)

    # Wiener baseline from the trained artifact's own stationary fit
    # (no refit — ADVICE r3); the no-modulator counterpart of GT-NMF.
    wfit = tm.fit
    if wfit is None:
        raise ValueError(
            f"{name} artifact predates the stored stage-1 fit — re-run "
            "nsgp_tpu.experiments.train_corpus for this file"
        )
    w_len = wfit.lengthscales(kernel1)
    w_noise = float(jnp.maximum(wfit.noise, 1e-6))

    rows = []
    for i, v in enumerate(noise_levels):
        key = jax.random.PRNGKey(seed + i)
        y_noisy = y_clean + jnp.sqrt(v) * jax.random.normal(
            key, y_clean.shape, y_clean.dtype
        )
        ypad = jnp.full((Tp,), jnp.nan, y_noisy.dtype).at[:T].set(y_noisy)
        ek = {"ep_itts": ep_itts, "ep_fraction": 0.75, "damping": (0.1,)}
        if engine == "ihgp":
            ek["grid_lo"] = -7.0
            if ep_itts >= 20:
                ek["damping"] = (0.01,)  # ref noise_reduction_speech.m:30-32
        if engine == "giekf":
            ek = {"g_iter": ep_itts, "l_iter": 1}
        times = []
        for _ in range(2):  # cold / warm
            t0 = time.perf_counter()
            r = dn.denoise(tm.model, tm.params, ypad, float(v),
                           y_clean=None, engine=engine, n_samples=n_samples,
                           **ek)
            jax.block_until_ready(r.y_hat)
            times.append(time.perf_counter() - t0)
        y_mc = r.y_hat[:T]
        # Headline output: time-varying Wiener from the posterior modulator
        # envelopes (apps.denoise.tv_wiener) — the model's nonstationary
        # analogue of the stationary baseline.  The reference's MC
        # resynthesis (sum of D narrow subbands) is kept as *_mc parity
        # columns; it has ~zero energy between spectral peaks, which
        # log-spectral/STOI metrics punish regardless of fit quality.
        S_stat = dn.stationary_spectrum(
            kernel1, wfit.sigma2, w_len, wfit.omega,
            dtype=jnp.asarray(y_noisy).dtype)
        y_hat = dn.tv_wiener(tm.model, tm.params, r.result.Eft[:T],
                             y_noisy, float(v), stat_spec=S_stat,
                             stat_floor=stat_floor)
        # stationary-gain-floor sweep (VERDICT r5 item 4): same posterior,
        # different readout blends — cheap to evaluate per row
        blend = {}
        for kap in blend_arms:
            yk = dn.tv_wiener(tm.model, tm.params, r.result.Eft[:T],
                              y_noisy, float(v), stat_spec=S_stat,
                              stat_floor=kap)
            blend[str(kap)] = {
                "snr_db": float(metrics.snr_db(y_clean, yk)),
                "stoi": round(stoi(np.asarray(y_clean), np.asarray(yk), fs), 4),
                "log_spec_snr_db": float(metrics.log_spec_snr_db(y_clean, yk)),
                "fwsegsnr_db": round(float(fw_seg_snr(y_clean, yk, fs)), 3),
            }
        Zw = fb_mod.fft_filterbank(
            wfit.sigma2, w_len, wfit.omega, y_noisy, kernel=kernel1,
            noise=v + w_noise,
        )
        y_wiener = jnp.sum(jnp.real(Zw), axis=-1)
        rows.append({
            "noise_var": v,
            "snr_in_db": float(metrics.snr_db(y_clean, y_noisy)),
            "snr_out_db": float(metrics.snr_db(y_clean, y_hat)),
            "snr_mc_db": float(metrics.snr_db(y_clean, y_mc)),
            "snr_wiener_db": float(metrics.snr_db(y_clean, y_wiener)),
            "rmse": float(metrics.rmse(y_clean, y_hat)),
            "log_spec_snr_out_db": float(
                metrics.log_spec_snr_db(y_clean, y_hat)
            ),
            "log_spec_snr_mc_db": float(
                metrics.log_spec_snr_db(y_clean, y_mc)
            ),
            "log_spec_snr_wiener_db": float(
                metrics.log_spec_snr_db(y_clean, y_wiener)
            ),
            "stoi_in": round(stoi(np.asarray(y_clean), np.asarray(y_noisy), fs), 4),
            "stoi_out": round(stoi(np.asarray(y_clean), np.asarray(y_hat), fs), 4),
            "stoi_mc": round(stoi(np.asarray(y_clean), np.asarray(y_mc), fs), 4),
            "stoi_wiener": round(
                stoi(np.asarray(y_clean), np.asarray(y_wiener), fs), 4
            ),
            # PESQ stand-in (the reference ships pesq.p, un-portable
            # p-code): fwSegSNR, Hu & Loizou 2008 — see utils.speech_quality
            "fwsegsnr_in_db": round(float(fw_seg_snr(y_clean, y_noisy, fs)), 3),
            "fwsegsnr_out_db": round(float(fw_seg_snr(y_clean, y_hat, fs)), 3),
            "fwsegsnr_mc_db": round(float(fw_seg_snr(y_clean, y_mc, fs)), 3),
            "fwsegsnr_wiener_db": round(
                float(fw_seg_snr(y_clean, y_wiener, fs)), 3
            ),
            "seconds_cold": round(times[0], 3),
            "seconds_warm": round(times[1], 3),
            "stat_floor": stat_floor,
            "blend": blend,
        })
        print({"file": name, "kernel": kernel1, **rows[-1]},
              file=sys.stderr, flush=True)
    return {"file": name, "T": T, "pad_T": Tp, "fs": fs,
            "D": tm.model.D, "N": tm.model.N, "kernel1": kernel1,
            "engine": engine, "ep_itts": ep_itts, "rows": rows}


def run(files=("speech0_female", "speech1_male"), corpus="speech",
        kernels=("exp",), engine="ep", ep_itts=30, n_samples=200,
        stat_floor=1.0):
    pad_T = None
    if len(files) > 1:
        from nsgp_tpu.experiments.missing_data import _pad_len

        pad_T = _pad_len(corpus, files)
    out = {"experiment": "noise_reduction_speech",
           "protocol": "reference (whole y_norm @16kHz, w_lik = true v)",
           "noise_levels": protocol.NOISE_LEVELS, "files": []}
    for name in files:
        for kernel in kernels:
            out["files"].append(run_file(
                corpus, name, kernel1=kernel, ep_itts=ep_itts,
                engine=engine, pad_T=pad_T, n_samples=n_samples,
                stat_floor=stat_floor,
            ))
    # per-level aggregate over files (ref noise_reduction_results.m:23-63)
    agg = {}
    for f in out["files"]:
        for row in f["rows"]:
            agg.setdefault((f["kernel1"], row["noise_var"]), []).append(row)
    out["aggregate"] = {
        f"{k}_{v}": {
            "mean_snr_out_db": float(np.mean([r["snr_out_db"] for r in rows])),
            "mean_snr_wiener_db": float(
                np.mean([r["snr_wiener_db"] for r in rows])
            ),
            "mean_log_spec_snr_out_db": float(
                np.mean([r["log_spec_snr_out_db"] for r in rows])
            ),
            "mean_log_spec_snr_wiener_db": float(
                np.mean([r["log_spec_snr_wiener_db"] for r in rows])
            ),
            "mean_stoi_out": float(np.mean([r["stoi_out"] for r in rows])),
            "mean_stoi_in": float(np.mean([r["stoi_in"] for r in rows])),
            "mean_fwsegsnr_out_db": float(
                np.mean([r["fwsegsnr_out_db"] for r in rows])
            ),
            "mean_fwsegsnr_in_db": float(
                np.mean([r["fwsegsnr_in_db"] for r in rows])
            ),
            "mean_fwsegsnr_wiener_db": float(
                np.mean([r["fwsegsnr_wiener_db"] for r in rows])
            ),
        }
        for (k, v), rows in agg.items()
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
    ap.add_argument("--device", default="tpu", choices=["cpu", "tpu"])
    ap.add_argument("--files", nargs="+",
                    default=["speech0_female", "speech1_male"])
    ap.add_argument("--kernels", nargs="+", default=["exp"],
                    choices=["exp", "matern32"])
    ap.add_argument("--engine", default="ep",
                    choices=["ep", "ihgp", "giekf"])
    ap.add_argument("--itts", type=int, default=30)
    ap.add_argument("--n-samples", type=int, default=200)
    ap.add_argument("--out", default="results/noise_reduction_speech.json")
    args = ap.parse_args()
    _setup_backend(args.device)
    res = run(files=tuple(args.files), kernels=tuple(args.kernels),
              engine=args.engine, ep_itts=args.itts,
              n_samples=args.n_samples)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res["aggregate"], indent=2))


if __name__ == "__main__":
    main()
