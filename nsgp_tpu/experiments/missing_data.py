"""Missing-data experiment under the reference protocol
(ref missing_data_music.m / test_missing_data.m).

Protocol (see nsgp_tpu.experiments.protocol):
- the test signal IS the whole 16 kHz unit-variance trained signal
  (``yTest = y_norm``, missing_data_music.m:86);
- 6 gaps of 321 samples at hand-picked non-silent positions per file;
- w_lik = 1e-4; EP fraction 0.75, damping 0.1 (IHGP@20: 0.0025);
- GIEKF runs ep_itts global passes with 1 inner iteration;
- reconstruction: 200 MC samples through the link (:150-175);
- per-file score: SNR + RMSE over the concatenated gap samples (:277-278),
  corpus aggregate: mean over files with per-file SNR floored at 0
  (missing_data_music_results.m:26 ``mean(max(snr_y,0))``).

TPU note: signals are zero-padded (mask False) to one per-corpus length so
every (engine, itts, kernel) pair compiles exactly once across the corpus;
timings are split cold (first call, includes compile) / warm.

CLI: python -m nsgp_tpu.experiments.missing_data --corpus music \\
        [--kernels exp matern32] [--engines ep ihgp giekf] [--itts 1 20]
Writes results/missing_data_<corpus>.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from nsgp_tpu.apps import missing_data as md
from nsgp_tpu.experiments import protocol, train_corpus


def _pad_len(corpus: str, files) -> int:
    """One compile shape per corpus: max 16 kHz length, rounded up to 2048."""
    import wave

    from nsgp_tpu.experiments import AUDIO_ROOT

    mx = 0
    for name in files:
        with wave.open(os.path.join(AUDIO_ROOT, corpus, f"{name}.wav")) as w:
            n16 = int(np.ceil(w.getnframes() * protocol.FS_REFERENCE
                              / w.getframerate()))
        mx = max(mx, n16)
    return int(-(-mx // 2048) * 2048)


def engine_config(engine: str, itts: int, extra=None) -> dict:
    """The reference's per-engine inference settings
    (missing_data_music.m:23-26,119-129), plus TPU fast paths.

    DOCUMENTED DEVIATION — IHGP multi-sweep damping: the reference drops
    damping to 0.0025 at 20 sweeps (:25-26), but 20 x 0.0025 leaves the EP
    sites at ~5% of their fixed-point strength, so its IHGP@20 posterior is
    *under-converged* and scores below IHGP@1 (measured: 1.08 vs 1.45 dB
    gap SNR on speech0_female; grid span ruled out — identical at
    grid_lo -2/-4/-7).  A (0.1 ADF, 0.025 re-site) schedule is stable and
    closes the gap to full EP (2.08 vs EP@20's 2.18 dB); damping 0.5
    diverges, which is presumably why the reference went ultra-conservative.
    """
    import jax

    ek = {}
    if engine == "ep":
        ek = {"ep_itts": itts, "ep_fraction": 0.75, "damping": (0.1,)}
        if jax.default_backend() not in ("cpu",):
            # fused VMEM kernels for the fixed-site passes (46x the XLA
            # sequential scan at T=100k; posterior equal to ~1e-4 rel)
            ek["backend"] = "pallas"
    if engine.startswith("ihgp"):
        # Multi-sweep damping is FILE-DEPENDENT (neither arm dominates):
        # the tuned (0.1, 0.025) schedule converges the sites and tracks
        # full EP on speech and most music, but on strongly-harmonic files
        # (bamboo_flute) site convergence exposes the steady-variance
        # cavity bias (means inflate ~25%) and the reference's ultra-
        # conservative flat 0.0025 (missing_data_music.m:25-26), which
        # barely moves the sites, scores better.  The grid reports BOTH:
        # 'ihgp' = tuned, 'ihgp_ref' = reference parity.
        damping = (0.1,) if itts == 1 else (
            (0.0025,) if engine == "ihgp_ref" else (0.1, 0.025)
        )
        ek = {"ep_itts": itts, "ep_fraction": 0.75, "damping": damping,
              "grid_lo": -7.0,  # realized R = lik/ttau with lik=1e-4
              # blocked two-level steady scans for sweeps >= 2 (the
              # long-signal fast path; == one-level scan to 2e-14)
              "parallel": True, "chunk": 2048,
              # tuned arm: energy-based sweep selection (deep iteration can
              # never end below its best intermediate sweep — the
              # multi-sweep iteration is marginally stable on a couple of
              # strongly-harmonic files and f32 noise flips them);
              # 'ihgp_ref' keeps the raw reference trajectory
              "keep_best": engine != "ihgp_ref"}
        # NOTE (round 5): the corrected cavity-variance tables
        # (IHGPConfig.pf_correct) were built, measured at this grid, and
        # REVERTED: full correction NaN'd guitar and cost sax 3 dB, a 0.5
        # log-blend flipped which file destabilized — the quirk's variance
        # inflation is load-bearing for the reference's multi-sweep scheme
        # (details in the config's docstring / ROUND5_NOTES).  Multi-sweep
        # quality beyond the tuned damping is the EP engine's job: the
        # batched Pallas EP is faster than IHGP on-chip at these scales.
    if engine == "giekf":
        ek = {"g_iter": itts, "l_iter": 1}
    ek.update(extra or {})
    return ek


def run_file(
    corpus: str,
    name: str,
    kernel1: str = "exp",
    engines=("ep", "ihgp"),
    ep_itts=(1, 20),
    pad_T: int | None = None,
    n_samples: int = 200,  # ref missing_data_music.m:150 (s = 200)
    engine_extra=None,
    seen_configs: set | None = None,  # compile tracking: with a uniform
    # pad_T, only the FIRST file per (engine, itts, kernel) pays compile;
    # later files run warm-only (one call)
):
    tm, y_norm = train_corpus.load_corpus_model(corpus, name, kernel1)
    params = tm.params._replace(
        lik=jnp.asarray(protocol.W_LIK_MISSING, jnp.asarray(tm.params.lik).dtype)
    )
    T = len(y_norm)
    mask_np = protocol.reference_gap_mask(name, T)
    Tp = pad_T or T
    y = np.zeros((Tp,), np.float64)
    y[:T] = y_norm
    mask = np.zeros((Tp,), bool)
    mask[:T] = mask_np
    metric_gaps = np.zeros((Tp,), bool)
    metric_gaps[:T] = ~mask_np
    y = jnp.asarray(y)
    mask_j = jnp.asarray(mask)
    gaps_j = jnp.asarray(metric_gaps)

    rows = []
    for eng in engines:
        for itts in ep_itts:
            ek = engine_config(eng, itts, engine_extra)
            ckey = (eng, itts, kernel1, Tp)
            fresh = seen_configs is None or ckey not in seen_configs
            if seen_configs is not None:
                seen_configs.add(ckey)
            times = []
            try:
                for _ in range(2 if fresh else 1):  # cold (compile), warm
                    t0 = time.perf_counter()
                    r = md.fill_gaps(tm.model, params, y, mask_j,
                                     engine=eng.split("_")[0],
                                     n_samples=n_samples,
                                     metric_gaps=gaps_j, **ek)
                    jax.block_until_ready(r.y_hat)
                    times.append(time.perf_counter() - t0)
                rows.append({
                    "engine": eng,
                    "ep_itts": itts,
                    "rmse_gaps": float(r.rmse_gaps),
                    "snr_gaps_db": float(r.snr_gaps),
                    "seconds_cold": round(times[0], 3) if fresh else None,
                    "seconds_warm": round(times[-1], 3),
                })
            except (jax.errors.JaxRuntimeError, OSError, TimeoutError) as e:
                # TPU worker crash / transient runtime fault only (ADVICE r4:
                # programming errors must propagate, not become NaN rows):
                # record the failed row so the file completes and a resumed
                # run can fill it in, then let the caller decide
                rows.append({
                    "engine": eng, "ep_itts": itts,
                    "rmse_gaps": float("nan"),
                    "snr_gaps_db": float("nan"),
                    "seconds_cold": None, "seconds_warm": None,
                    "error": f"{type(e).__name__}: {e}"[:300],
                })
                if seen_configs is not None:
                    seen_configs.discard(ckey)
            print({"file": name, **rows[-1]}, file=sys.stderr, flush=True)
    return {"file": name, "T": T, "pad_T": Tp, "D": tm.model.D,
            "N": tm.model.N, "kernel1": kernel1,
            "w_lik": protocol.W_LIK_MISSING, "rows": rows}


# Per-engine file-batch cap: GIEKF stores dense (T, m, m) trajectories per
# file (~1.2 GB at music scale), so its batch is memory-bounded; the
# lane-batched EP kernels need BF*(D+N) <= 128 lanes (6 files at D=16,N=3);
# the means-only IHGP path takes whole corpora.
# GIEKF holds ~4 live (T, m, m) trajectory copies per file across the pass
# loop (~5 GB/file at music scale) — batch 2 fits the 16 GB chip.
BATCH_CAP = {"ep": 6, "ihgp": 16, "ihgp_ref": 16, "giekf": 2}


def run_batched(corpus="music", files=None, kernels=("exp",),
                engines=("ep", "ihgp"), ep_itts=(1, 20), n_samples=200,
                engine_extra=None):
    """Batched grid: one inference program per (kernel, engine, itts) over
    all corpus files at once (nsgp_tpu.inference.batched), replacing the
    reference's serial file loop (missing_data_music.m:43-133).

    Emits the same JSON schema as run(); per-row ``seconds_warm`` is the
    warm batch wall-clock divided by the batch size (per-file share) and
    ``batch_size``/``batch_seconds_warm`` record the batch-level numbers.
    """
    from nsgp_tpu.inference import batched as bt

    files = tuple(files) if files else protocol.CORPUS_FILES[corpus]
    pad_T = _pad_len(corpus, files)
    out = {"experiment": f"missing_data_{corpus}",
           "protocol": "reference (whole y_norm @16kHz, 6x321-sample gaps)",
           "gap_samples": 2 * protocol.GAP_HALF + 1,
           "mode": "batched", "files": []}
    t_grid = time.perf_counter()
    per_file_rows = {name: {} for name in files}
    meta = {}
    for kernel in kernels:
        # Load all artifacts once per kernel arm.
        tms, ys, masks, gaps = [], [], [], []
        for name in files:
            tm, y_norm = train_corpus.load_corpus_model(corpus, name, kernel)
            T = len(y_norm)
            mask_np = protocol.reference_gap_mask(name, T)
            y = np.zeros((pad_T,))
            y[:T] = y_norm
            m = np.zeros((pad_T,), bool)
            m[:T] = mask_np
            g = np.zeros((pad_T,), bool)
            g[:T] = ~mask_np
            tms.append(tm)
            ys.append(y)
            masks.append(m)
            gaps.append(g)
            meta[(name, kernel)] = {"T": T, "D": tm.model.D, "N": tm.model.N}
        model = tms[0].model
        lik_dt = jnp.asarray(tms[0].params.lik).dtype
        paramsB_all = bt.stack_params([
            tm.params._replace(lik=jnp.asarray(protocol.W_LIK_MISSING, lik_dt))
            for tm in tms
        ])
        yB_all = jnp.asarray(np.stack(ys))
        maskB_all = jnp.asarray(np.stack(masks))
        gapsB_all = jnp.asarray(np.stack(gaps))

        for eng in engines:
            cap = BATCH_CAP.get(eng, 8)
            for itts in ep_itts:
                ek = engine_config(eng, itts, engine_extra)
                starts = list(range(0, len(files), cap))
                times, rows_eng = [], {}
                try:
                    for s in starts:
                        # Pad the last batch to the cap size by repeating
                        # trailing files: every batch shares ONE compiled
                        # shape (a ragged final batch recompiled and its
                        # "warm" time was pure compile).
                        idx = list(range(s, min(s + cap, len(files))))
                        bsz = len(idx)
                        pad_idx = idx + [idx[-1]] * (min(cap, len(files))
                                                     - bsz)
                        ix = np.asarray(pad_idx)
                        pB = jax.tree.map(lambda x: x[ix], paramsB_all)
                        nrep = 2 if s == 0 else 1  # cold (compile) + warm
                        for _ in range(nrep):
                            t0 = time.perf_counter()
                            r = md.fill_gaps_batch(
                                model, pB, yB_all[ix], maskB_all[ix],
                                engine=eng.split("_")[0],
                                n_samples=n_samples,
                                metric_gapsB=gapsB_all[ix], **ek)
                            jax.block_until_ready(r.y_hat)
                            times.append(time.perf_counter() - t0)
                        rmse_b = np.asarray(r.rmse_gaps)
                        snr_b = np.asarray(r.snr_gaps)
                        r = None  # release device buffers (GIEKF batches
                        # hold multi-GB trajectories) before the next batch
                        for i, name in enumerate(files[s:s + bsz]):
                            rows_eng[name] = {
                                "engine": eng, "ep_itts": itts,
                                "rmse_gaps": float(rmse_b[i]),
                                "snr_gaps_db": float(snr_b[i]),
                                "seconds_cold": (round(times[0], 3)
                                                 if s == 0 else None),
                                "seconds_warm": round(times[-1] / bsz, 4),
                                "batch_size": bsz,
                                "batch_seconds_warm": round(times[-1], 3),
                            }
                except (jax.errors.JaxRuntimeError, OSError, TimeoutError) as e:
                    for name in files:
                        rows_eng.setdefault(name, {
                            "engine": eng, "ep_itts": itts,
                            "rmse_gaps": float("nan"),
                            "snr_gaps_db": float("nan"),
                            "seconds_cold": None, "seconds_warm": None,
                            "error": f"{type(e).__name__}: {e}"[:300],
                        })
                for name in files:
                    per_file_rows[name].setdefault(kernel, []).append(
                        rows_eng[name])
                    print({"file": name, "kernel": kernel, **rows_eng[name]},
                          file=sys.stderr, flush=True)
    for name in files:
        for kernel in kernels:
            out["files"].append({
                "file": name, "kernel1": kernel, "pad_T": pad_T,
                "w_lik": protocol.W_LIK_MISSING,
                **meta[(name, kernel)],
                "rows": per_file_rows[name][kernel],
            })
    out["grid_wall_seconds"] = round(time.perf_counter() - t_grid, 1)
    _aggregate(out)
    return out


def _aggregate(out):
    """Per-arm corpus aggregate (ref missing_data_music_results.m:26-37:
    per-file SNR floored at 0 before the mean)."""
    agg = {}
    for f in out["files"]:
        for row in f["rows"]:
            key = f"{f['kernel1']}_{row['engine']}_itts{row['ep_itts']}"
            bad = not (np.isfinite(row["snr_gaps_db"])
                       and np.isfinite(row["rmse_gaps"]))
            agg.setdefault(key, []).append(
                (np.nan, np.nan) if bad
                else (max(row["snr_gaps_db"], 0.0), row["rmse_gaps"])
            )
    out["aggregate"] = {
        k: {"mean_snr_gaps_db": float(np.nanmean([a for a, _ in v])),
            "mean_rmse_gaps": float(np.nanmean([b for _, b in v])),
            "n_nonfinite": int(sum(np.isnan(a) for a, _ in v))}
        for k, v in agg.items()
    }


def run(corpus="music", files=None, kernels=("exp",), engines=("ep", "ihgp"),
        ep_itts=(1, 20), n_samples=200, engine_extra=None, prior=None):
    """``prior``: a previous (possibly crash-truncated) result dict —
    (file, kernel) entries whose rows are all error-free are reused, the
    rest rerun.  Lets a shell-level retry survive TPU worker crashes."""
    files = tuple(files) if files else protocol.CORPUS_FILES[corpus]
    pad_T = _pad_len(corpus, files)
    done = {}
    for f in (prior or {}).get("files", []):
        if not any("error" in row for row in f["rows"]):
            done[(f["file"], f["kernel1"])] = f
    out = {"experiment": f"missing_data_{corpus}",
           "protocol": "reference (whole y_norm @16kHz, 6x321-sample gaps)",
           "gap_samples": 2 * protocol.GAP_HALF + 1,
           "files": []}
    seen: set = set()
    for name in files:
        for kernel in kernels:
            if (name, kernel) in done:
                out["files"].append(done[(name, kernel)])
                continue
            t0 = time.perf_counter()
            out["files"].append(run_file(
                corpus, name, kernel1=kernel, engines=engines,
                ep_itts=ep_itts, pad_T=pad_T, n_samples=n_samples,
                engine_extra=engine_extra, seen_configs=seen,
            ))
            print(f"[missing_data] {name}/{kernel}: "
                  f"{time.perf_counter() - t0:.1f}s",
                  file=sys.stderr, flush=True)
    # Aggregation (ref missing_data_music_results.m:26-37): per-file SNR
    # floored at 0 before the mean.  A row counts as non-finite if EITHER
    # metric is non-finite (ADVICE r3) — excluded via nanmean + counted.
    _aggregate(out)
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
    ap.add_argument("--files", nargs="+", default=None)
    ap.add_argument("--corpus", default="music", choices=["music", "speech"])
    ap.add_argument("--kernels", nargs="+", default=["exp"],
                    choices=["exp", "matern32"])
    ap.add_argument("--engines", nargs="+", default=["ep", "ihgp"],
                    choices=["ep", "ihgp", "ihgp_ref", "giekf"])
    ap.add_argument("--itts", nargs="+", type=int, default=[1, 20])
    ap.add_argument("--n-samples", type=int, default=200)
    ap.add_argument("--resume", action="store_true",
                    help="reuse error-free (file, kernel) entries from the "
                         "existing --out file; rerun the rest (serial mode)")
    ap.add_argument("--serial", action="store_true",
                    help="per-file serial grid (round-4 behavior) instead "
                         "of the batched multi-file default")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.out is None:
        args.out = f"results/missing_data_{args.corpus}.json"
    _setup_backend(args.device)
    if args.serial:
        prior = None
        if args.resume and os.path.exists(args.out):
            with open(args.out) as f:
                prior = json.load(f)
        res = run(corpus=args.corpus, files=args.files,
                  kernels=tuple(args.kernels), engines=tuple(args.engines),
                  ep_itts=tuple(args.itts), n_samples=args.n_samples,
                  prior=prior)
    else:
        res = run_batched(corpus=args.corpus, files=args.files,
                          kernels=tuple(args.kernels),
                          engines=tuple(args.engines),
                          ep_itts=tuple(args.itts), n_samples=args.n_samples)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res["aggregate"], indent=2))


if __name__ == "__main__":
    main()
