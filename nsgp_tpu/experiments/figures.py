"""Paper-style result figures from existing artifacts (VERDICT r4 item 9).

TPU-native counterpart of the reference's figure scripts
(source_sep_results.m:60-66 via matlab2tikz, noise_reduction_spectrograms.m,
missing_data_music_results.m plots): renders PNGs under ``results/figs/``
from the committed JSON/wav/npz artifacts, so regressions are eyeballable
without MATLAB.

Figures:
- ``gap_fill_<file>.png``      — clean vs reconstructed waveform around a
  gap, per engine (missing-data artifacts are re-derived on the fly from
  the trained model at small cost, CPU-safe).
- ``spectrograms_<file>.png``  — clean / noisy / denoised / Wiener
  log-spectrograms (denoising artifacts).
- ``source_sep_<instr>.png``   — mixture + per-source estimated vs true
  waveform segments (separation wavs).
- ``aggregates.png``           — corpus SNR aggregates per engine arm from
  the missing-data JSONs.

Design notes: Okabe & Ito (2008) colorblind-safe categorical palette
(series identity, fixed order, never cycled), perceptually-uniform 'magma'
for sequential spectrogram magnitude (single light->dark job, no rainbow),
one axis per panel, thin 1.2 px lines, recessive grid, legends on every
multi-series panel.

CLI: python -m nsgp_tpu.experiments.figures [--out results/figs]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

# Okabe-Ito (2008): published CVD-validated categorical palette.
C_CLEAN = "#555555"  # reference signal: neutral recessive gray
C_EST = "#0072B2"  # primary estimate: blue
C_ALT = "#D55E00"  # comparison arm: vermillion
C_THIRD = "#009E73"  # third series: bluish green
GRID = dict(color="#dddddd", linewidth=0.6)


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.rcParams.update({
        "figure.dpi": 130, "axes.grid": True, "grid.color": "#e5e5e5",
        "grid.linewidth": 0.6, "axes.spines.top": False,
        "axes.spines.right": False, "font.size": 9,
        "axes.titlesize": 10, "legend.frameon": False,
    })
    return plt


def _spec(y, fs, nwin=512, hop=128):
    T = len(y)
    nfrm = max(1, (T - nwin) // hop + 1)
    idx = np.arange(nwin)[None, :] + hop * np.arange(nfrm)[:, None]
    S = np.abs(np.fft.rfft(y[idx] * np.hanning(nwin)[None], axis=-1)) ** 2
    S = np.maximum(S, S.max() * 1e-8)
    return 10 * np.log10(S).T, nfrm * hop / fs


def fig_gap_fill(out_dir, corpus="music", name="bamboo_flute",
                 kernel="exp", gap_index=2, half_window=800):
    """Clean vs EP/IHGP reconstructions around one reference gap."""
    import jax.numpy as jnp

    from nsgp_tpu.apps import missing_data as md
    from nsgp_tpu.experiments import protocol, train_corpus
    from nsgp_tpu.experiments.missing_data import engine_config

    plt = _mpl()
    tm, y_norm = train_corpus.load_corpus_model(corpus, name, kernel)
    params = tm.params._replace(
        lik=jnp.asarray(protocol.W_LIK_MISSING,
                        jnp.asarray(tm.params.lik).dtype))
    T = len(y_norm)
    mask = jnp.asarray(protocol.reference_gap_mask(name, T))
    y = jnp.asarray(y_norm)
    recons = {}
    for eng, label in [("ep", "EP (20 sweeps)"), ("ihgp", "IHGP (20 sweeps)")]:
        ek = engine_config(eng, 20)
        ek.pop("backend", None)  # CPU-safe render path
        r = md.fill_gaps(tm.model, params, y, mask, engine=eng,
                         n_samples=50, **ek)
        recons[label] = np.asarray(r.y_hat)

    center = protocol.GAP_POSITIONS[name][gap_index]
    sl = slice(max(0, center - half_window), min(T, center + half_window))
    t = np.arange(sl.start, sl.stop) / protocol.FS_REFERENCE * 1000.0
    fig, ax = plt.subplots(figsize=(7.2, 2.6))
    ax.plot(t, np.asarray(y_norm)[sl], color=C_CLEAN, lw=1.2, label="clean")
    for (label, yh), c in zip(recons.items(), (C_EST, C_ALT)):
        ax.plot(t, yh[sl], color=c, lw=1.2, label=label)
    gap = ~np.asarray(mask)[sl]
    ax.fill_between(t, *ax.get_ylim(), where=gap, color="#f2e8d5", zorder=0,
                    label="gap (unobserved)")
    ax.set_xlabel("time (ms)")
    ax.set_ylabel("amplitude")
    ax.set_title(f"missing-data reconstruction — {name} ({kernel}), "
                 f"321-sample gap")
    ax.legend(loc="upper right", ncol=2, fontsize=8)
    path = os.path.join(out_dir, f"gap_fill_{name}_{kernel}.png")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path


def fig_spectrograms(out_dir, name="speech2_male", kernel="exp",
                     noise_var=0.1, ep_itts=30):
    """Clean / noisy / denoised / Wiener spectrograms (ref
    noise_reduction_spectrograms.m)."""
    import jax
    import jax.numpy as jnp

    from nsgp_tpu.apps import denoise as dn
    from nsgp_tpu.experiments import train_corpus
    from nsgp_tpu.pretrain import filterbank as fb_mod

    plt = _mpl()
    tm, y_norm = train_corpus.load_corpus_model("speech", name, kernel)
    fs = int(tm.fs)
    y_clean = jnp.asarray(y_norm)
    key = jax.random.PRNGKey(0)
    y_noisy = y_clean + jnp.sqrt(noise_var) * jax.random.normal(
        key, y_clean.shape, y_clean.dtype)
    r = dn.denoise(tm.model, tm.params, y_noisy, float(noise_var),
                   engine="ep", n_samples=50, ep_itts=ep_itts,
                   ep_fraction=0.75, damping=(0.1,))
    T = len(y_norm)
    wfit = tm.fit
    S_stat = dn.stationary_spectrum(kernel, wfit.sigma2,
                                    wfit.lengthscales(kernel), wfit.omega,
                                    dtype=y_noisy.dtype)
    # headline readout: stationary-gain floor kappa = 1.0 (see denoising
    # driver defaults)
    y_hat = dn.tv_wiener(tm.model, tm.params, r.result.Eft[:T], y_noisy,
                         float(noise_var), stat_spec=S_stat, stat_floor=1.0)
    Zw = fb_mod.fft_filterbank(
        wfit.sigma2, wfit.lengthscales(kernel), wfit.omega, y_noisy,
        kernel=kernel, noise=noise_var + float(jnp.maximum(wfit.noise, 1e-6)),
    )
    y_wiener = jnp.sum(jnp.real(Zw), axis=-1)

    panels = [("clean", np.asarray(y_clean)),
              (f"noisy (v={noise_var})", np.asarray(y_noisy)),
              ("GT-NMF TV-Wiener", np.asarray(y_hat)),
              ("stationary Wiener", np.asarray(y_wiener))]
    fig, axes = plt.subplots(2, 2, figsize=(8.5, 5.2), sharex=True,
                             sharey=True)
    vmax = None
    for ax, (title, sig) in zip(axes.ravel(), panels):
        S, dur = _spec(sig, fs)
        if vmax is None:
            vmax = S.max()
        im = ax.imshow(S, origin="lower", aspect="auto",
                       extent=[0, dur, 0, fs / 2 / 1000.0],
                       vmin=vmax - 70, vmax=vmax, cmap="magma")
        ax.set_title(title)
        ax.grid(False)
    for ax in axes[-1]:
        ax.set_xlabel("time (s)")
    for ax in axes[:, 0]:
        ax.set_ylabel("freq (kHz)")
    fig.colorbar(im, ax=axes, shrink=0.85, label="power (dB)")
    path = os.path.join(out_dir, f"spectrograms_{name}_{kernel}.png")
    fig.savefig(path)
    plt.close(fig)
    return path


def fig_source_sep(out_dir, instrument="011PFNOM", window=(48000, 52000)):
    """Estimated vs true per-source waveform segments from committed wavs
    (ref source_sep_results.m:60-66)."""
    from nsgp_tpu.experiments import AUDIO_ROOT
    from nsgp_tpu.experiments.source_sep import (FS, PARTS, TEST_IND,
                                                 load_normalized)
    from nsgp_tpu.utils.audio import read_wav, resample

    plt = _mpl()
    lo, hi = TEST_IND
    test_dir = os.path.join(AUDIO_ROOT, "source_sep", "test_data")
    _, normaliser, _ = load_normalized(
        os.path.join(test_dir, f"{instrument}_mixture.wav"), fs_target=FS)
    a, b = window
    fig, axes = plt.subplots(len(PARTS), 1, figsize=(7.2, 5.4), sharex=True)
    t = np.arange(a, b) / FS * 1000.0
    for ax, p in zip(axes, PARTS):
        yp, fsp = read_wav(
            os.path.join(test_dir, f"{instrument}_{p}_part.wav"))
        yp = resample(yp, FS, fsp) / normaliser / 3.0
        true_seg = yp[lo:hi][a:b]
        est, fse = read_wav(f"results/wavs/{instrument}_{p}_est.wav")
        est_seg = est[a:b]
        # least-squares projection undoes the saved wav's peak
        # normalization honestly: silence in the true part stays silent
        scale = float(true_seg @ est_seg / (est_seg @ est_seg + 1e-12))
        ax.plot(t, true_seg, color=C_CLEAN, lw=1.0, label="true part")
        ax.plot(t, est_seg * scale, color=C_EST, lw=1.0,
                label="estimate (rescaled)")
        ax.set_ylabel(f"note {p}")
        ax.legend(loc="upper right", fontsize=7, ncol=2)
    axes[-1].set_xlabel("time (ms)")
    axes[0].set_title(f"source separation — {instrument} (IHGP mixture)")
    path = os.path.join(out_dir, f"source_sep_{instrument}.png")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path


def fig_aggregates(out_dir):
    """Per-arm corpus gap-SNR aggregates from the missing-data JSONs."""
    plt = _mpl()
    panels = []
    for corpus in ("music", "speech"):
        for path in (f"results/missing_data_{corpus}_batched.json",
                     f"results/missing_data_{corpus}.json"):
            if os.path.exists(path):
                with open(path) as f:
                    panels.append((corpus, json.load(f)["aggregate"]))
                break
    if not panels:
        return None
    fig, axes = plt.subplots(1, len(panels), figsize=(4.6 * len(panels), 3.2))
    axes = np.atleast_1d(axes)
    for ax, (corpus, agg) in zip(axes, panels):
        keys = sorted(agg.keys())
        vals = [agg[k]["mean_snr_gaps_db"] for k in keys]
        colors = [C_EST if "_ep_" in k else
                  C_ALT if "ihgp_ref" not in k and "_ihgp_" in k else
                  C_THIRD if "giekf" in k else "#999999" for k in keys]
        ypos = np.arange(len(keys))
        ax.barh(ypos, vals, color=colors, height=0.62)
        ax.set_yticks(ypos, [k.replace("_itts", "@") for k in keys],
                      fontsize=7)
        ax.set_xlabel("mean gap SNR (dB)")
        ax.set_title(f"{corpus} corpus")
        ax.invert_yaxis()
    fig.tight_layout()
    path = os.path.join(out_dir, "aggregates.png")
    fig.savefig(path)
    plt.close(fig)
    return path


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/figs")
    ap.add_argument("--skip", nargs="*", default=[],
                    choices=["gap", "spec", "sep", "agg"])
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    args = ap.parse_args()
    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    os.makedirs(args.out, exist_ok=True)
    done = []
    if "agg" not in args.skip:
        done.append(fig_aggregates(args.out))
    if "sep" not in args.skip:
        done.append(fig_source_sep(args.out))
    if "gap" not in args.skip:
        done.append(fig_gap_fill(args.out))
    if "spec" not in args.skip:
        done.append(fig_spectrograms(args.out))
    print(json.dumps({"figures": [d for d in done if d]}))


if __name__ == "__main__":
    main()
