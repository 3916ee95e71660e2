"""Headline benchmark: GT-NMF Power-EP inference on a 100k-sample signal.

Target (BASELINE.md / BASELINE.json north star): < 10 s per EP sweep on one
TPU v5e chip — the reference (single-threaded MATLAB) records no numbers, so
the 10 s/sweep operational target is the baseline.  ``vs_baseline`` is the
speedup over that target (> 1 is better).

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline"}.
Stage progress/timings go to stderr so the run is diagnosable; an internal
watchdog (BENCH_BUDGET_S, default 520 s) guarantees the JSON line is emitted
with whatever was measured before the budget expires.

Axon-backend rules learned the hard way (round 1 bench rc=124):
- every eager op dispatch costs ~0.5 s (per-op remote compile), so ALL array
  work happens inside jit and host-side setup uses numpy;
- device arrays captured as jit closure constants are re-fetched to host at
  lowering time, which is pathologically slow over the tunnel — everything
  is passed as jit arguments (ep_infer's normal calling convention).
"""

import json
import os
import signal
import sys
import time

import numpy as np

RESULT = {
    "metric": "gtnmf_ep_sweep_100k",
    "value": None,
    "unit": "s/sweep",
    "vs_baseline": 0.0,
    "vs_reference_cpu": 0.0,  # speedup over the measured reference-equivalent
    # CPU wall-clock (BASELINE.md round-3 calibration via the line-faithful
    # numpy oracle: ~2,685 s/sweep extrapolated to T=100k, single core)
    "ihgp_s_per_sweep": None,  # secondary metric: IHGP at the same scale
    "ihgp_path": None,
    # Roofline context (VERDICT r3 item 8): sustained arithmetic rate of the
    # winning EP path and its fraction of one v5e chip's bf16 MXU peak.
    # The workload is O(T) chains of (bs x bs) block ops with bs <= 4 —
    # structurally latency/dispatch-bound, not FLOP-bound: the state-space
    # model's sequential dependency and tiny blocks cannot tile the 128x128
    # systolic array, so MFU << 1% is the *shape* of this computation, and
    # s/sweep (latency), not FLOP/s, is the merit figure.
    "gflops": None,
    "mfu_pct": None,
}
V5E_PEAK_FLOPS = 197e12  # bf16 peak, one TPU v5e chip (public spec)


def ep_sweep_flops(T: int, D: int, N: int, bs: int, n_cub: int) -> float:
    """Flop model for ONE EP sweep (filter + RTS smoother + moment match).

    Per step and channel (C = D + N blocks of size bs):
      predict     A P A' + Q         : 2 bs^3 MACs
      update      K, P - K (HP)      : ~2 bs^2 MACs
      smoother    G = Pf A' Pp^-1;
                  Pf + G (.) G'      : ~3 bs^3 MACs
    Moment match per step: the 'sq'/amp cubature sums over n_cub sigma
    points x (N + D) accumulations (~2 MACs each).
    1 MAC = 2 flops.
    """
    C = D + N
    block = (2 * bs**3 + 2 * bs**2 + 3 * bs**3) * C
    cub = 2 * n_cub * (N + D)
    return 2.0 * T * (block + cub)
BASELINE_S = 10.0  # seconds/sweep target on one chip (BASELINE.md)
REFERENCE_CPU_S = 2685.0  # measured oracle calibration (BASELINE.md)


def emit_and_exit(signum=None, frame=None):
    print(json.dumps(RESULT), flush=True)
    os._exit(0)


def log(msg, t0=None):
    dt = f" {time.perf_counter() - t0:8.2f} s" if t0 is not None else ""
    print(f"[bench] {msg}{dt}", file=sys.stderr, flush=True)


def main():
    budget = float(os.environ.get("BENCH_BUDGET_S", "520"))
    signal.signal(signal.SIGALRM, emit_and_exit)
    signal.alarm(int(budget))

    import jax
    import jax.numpy as jnp

    from nsgp_tpu.inference import ep
    from nsgp_tpu.models.gtnmf import GTNMFModel, GTNMFParams, sample_prior

    D, N, T = 16, 3, 100_000
    EP_ITTS = 3
    f32 = np.float32
    log(f"devices={jax.devices()}")

    model = GTNMFModel(D=D, N=N, kernel1="matern32", kernel2="matern52",
                       p_cubature=9)
    # Host-side (numpy) parameter construction: single transfers, no eager tax.
    rng = np.random.default_rng(0)
    params = GTNMFParams(
        lik=jnp.asarray(f32(1e-3)),
        sub_var=jnp.asarray(np.ones(D, f32)),
        sub_len=jnp.asarray(np.linspace(50.0, 300.0, D, dtype=f32)),
        omega=jnp.asarray(np.linspace(0.05, 2.8, D, dtype=f32)),
        mod_var=jnp.asarray(np.full(N, 2.0, f32)),
        mod_len=jnp.asarray(np.linspace(800.0, 2500.0, N, dtype=f32)),
        W=jnp.asarray(rng.uniform(0.1, 1.0, (D, N)).astype(f32)),
    )

    # NOTE: on the axon backend, block_until_ready can return before the
    # first (compiling) dispatch actually finishes; a tiny device->host
    # fetch is the only reliable synchronization point.
    sync = lambda x: np.asarray(jax.tree.leaves(x)[-1]).ravel()[:1]

    # Benchmark signal: modulated subband noise (D bandpassed carriers x
    # slow positive envelopes), generated ON DEVICE in one jit (vmapped FFT
    # shaping + cumsum envelopes — no eigh, cheap compile).  The round-4
    # numpy version cost 81 s of host time (VERDICT r4 weak #7); the
    # fallback is kept for backends without FFT support.
    t0 = time.perf_counter()
    omegas_np = np.linspace(0.05, 2.8, D)
    try:
        @jax.jit
        def gen_signal(key):
            omegas = jnp.asarray(omegas_np, f32)
            freqs = jnp.fft.rfftfreq(T).astype(f32) * 2 * jnp.pi
            kc, ke = jax.random.split(key)
            spec = jnp.fft.rfft(jax.random.normal(kc, (D, T), f32), axis=-1)
            spec = spec * jnp.exp(
                -0.5 * ((freqs[None] - omegas[:, None]) / 0.02) ** 2)
            carrier = jnp.fft.irfft(spec, T, axis=-1)
            c = jnp.cumsum(jax.random.normal(ke, (D, T + 2000), f32), axis=-1)
            env = jnp.abs(c[:, 2000:] - c[:, :-2000]) / 2000.0 + 0.05
            yh = jnp.sum(
                carrier / (carrier.std(axis=-1, keepdims=True) + 1e-12) * env,
                axis=0)
            return (yh / yh.std()).astype(f32)

        y = gen_signal(jax.random.PRNGKey(0))
        sync(y)
        log("signal generation (on-device jit)", t0)
    except Exception as e:
        log(f"on-device signal gen failed ({type(e).__name__}: {e}); "
            "falling back to numpy")
        freqs = np.fft.rfftfreq(T) * 2 * np.pi
        yh = np.zeros(T, np.float64)
        for d in range(D):
            spec = np.fft.rfft(rng.normal(size=T))
            spec *= np.exp(-0.5 * ((freqs - omegas_np[d]) / 0.02) ** 2)
            carrier = np.fft.irfft(spec, T)
            c = np.cumsum(rng.normal(size=T + 2000))
            env = np.abs(c[2000:] - c[:-2000]) / 2000.0 + 0.05
            yh += carrier / (carrier.std() + 1e-12) * env
        y = jax.device_put(jnp.asarray((yh / yh.std()).astype(f32)),
                           jax.devices()[0])
        sync(y)
        log("signal generation (numpy fallback) + transfer", t0)

    # Two configs: the known-good sequential path first (guarantees a
    # number), then the fused-Pallas path; report the faster one whose
    # sweep energies stay finite.
    configs = [
        ("seq", ep.EPConfig(ep_itts=EP_ITTS, parallel=False,
                            moment_chunk=8192)),
        ("pallas", ep.EPConfig(ep_itts=EP_ITTS, backend="pallas",
                               moment_chunk=8192)),
    ]
    reps = 3
    for name, cfg in configs:
        try:
            def run(y, cfg=cfg):
                res = ep.ep_infer(model, params, y, None, cfg)
                return res.Eft, res.nlZ, res.maxdiff

            t0 = time.perf_counter()
            out = run(y)
            nlZ = np.asarray(out[1])  # D2H fetch = the only true sync
            log(f"[{name}] ep_infer compile+run", t0)
            log(f"[{name}] nlZ per sweep: {nlZ.tolist()}")
            log(f"[{name}] maxdiff per sweep: {np.asarray(out[2]).tolist()}")
            if not np.all(np.isfinite(nlZ)):
                log(f"[{name}] non-finite energies; skipping")
                continue

            t0 = time.perf_counter()
            for _ in range(reps):
                out = run(y)
                sync(out[1])
            elapsed = (time.perf_counter() - t0) / reps
            per_sweep = elapsed / EP_ITTS
            log(f"[{name}] steady-state: {elapsed:.2f} s / {EP_ITTS} sweeps; "
                f"{T * EP_ITTS / elapsed:,.0f} filtered samples/s/chip")
            if RESULT["value"] is None or per_sweep < RESULT["value"]:
                RESULT["value"] = round(per_sweep, 4)
                RESULT["vs_baseline"] = round(BASELINE_S / per_sweep, 2)
                RESULT["vs_reference_cpu"] = round(REFERENCE_CPU_S / per_sweep)
                # Roofline context: bs = 4 (matern32 x cos subband blocks),
                # 77 ut9 sigma points for N = 3 (ops.cubature).
                fl = ep_sweep_flops(T, D, N, bs=4, n_cub=77)
                gflops = fl / per_sweep / 1e9
                RESULT["gflops"] = round(gflops, 2)
                RESULT["mfu_pct"] = round(100.0 * gflops * 1e9
                                          / V5E_PEAK_FLOPS, 4)
                log(f"[{name}] flop model: {fl/1e9:.3f} GFLOP/sweep -> "
                    f"{gflops:.1f} GFLOP/s sustained, "
                    f"MFU {RESULT['mfu_pct']:.4f}% of bf16 peak "
                    f"(dispatch/latency-bound by design; see RESULT note)")
        except Exception as e:  # pallas may not compile on every backend
            log(f"[{name}] FAILED: {type(e).__name__}: {e}")

    # ------------------------------------------------------------------
    # IHGP at the same scale: the engine built for T >~ 100k textures.
    # Sequential steady scan vs the blocked two-level fast path
    # (_steady_filter_blocked — never materializes (T, C, bs, bs)).
    # Extra keys ride along in the JSON line; the headline metric stays EP.
    # ------------------------------------------------------------------
    from nsgp_tpu.inference import ihgp as ihgp_mod

    IH_ITTS = 3
    ih_cfgs = [
        ("ihgp-seq", ihgp_mod.IHGPConfig(ep_itts=IH_ITTS, damping=(0.1,),
                                         moment_chunk=8192)),
        ("ihgp-blocked", ihgp_mod.IHGPConfig(ep_itts=IH_ITTS, damping=(0.1,),
                                             parallel=True, chunk=2048,
                                             moment_chunk=8192)),
    ]
    for name, cfg in ih_cfgs:
        try:
            def ih_run(y, cfg=cfg):
                res = ihgp_mod.ihgp_infer(model, params, y, None, cfg)
                return res.Eft, res.nlZ

            t0 = time.perf_counter()
            out = ih_run(y)
            nlZ = np.asarray(out[1])
            log(f"[{name}] ihgp_infer compile+run", t0)
            log(f"[{name}] nlZ per sweep: {nlZ.tolist()}")
            if not np.all(np.isfinite(nlZ)):
                log(f"[{name}] non-finite energies; skipping")
                continue
            t0 = time.perf_counter()
            for _ in range(reps):
                out = ih_run(y)
                sync(out[1])
            elapsed = (time.perf_counter() - t0) / reps
            per_sweep = elapsed / IH_ITTS
            log(f"[{name}] steady-state: {elapsed:.2f} s / {IH_ITTS} sweeps; "
                f"{T * IH_ITTS / elapsed:,.0f} filtered samples/s/chip")
            key = "ihgp_s_per_sweep"
            if RESULT.get(key) is None or per_sweep < RESULT[key]:
                RESULT[key] = round(per_sweep, 4)
                RESULT["ihgp_path"] = name
        except Exception as e:
            log(f"[{name}] FAILED: {type(e).__name__}: {e}")

    # ------------------------------------------------------------------
    # Batched multi-signal EP (VERDICT r4 item 1): B signals share the
    # fused sequential kernels with B*C channels on the lane axis
    # (inference.batched).  Metric: batched filtered samples/s/chip.
    # B is lane-capped at floor(128 / (D+N)) = 6 for the flagship model;
    # B = 4 is the second point.  (B = 16 would need 304 lanes — out of
    # the one-tile Mosaic slice limit; scaling continues across chips via
    # the data mesh axis instead.)
    # ------------------------------------------------------------------
    from nsgp_tpu.inference import batched as bt

    deadline = time.perf_counter() + budget - 60.0
    start_wall = time.perf_counter()
    for B in (6, 4):
        if time.perf_counter() > deadline - 120.0:
            log(f"[batch B={B}] skipped (budget)")
            continue
        try:
            paramsB = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (B,) + x.shape), params)
            yB = jnp.broadcast_to(y, (B, T))
            maskB = jnp.ones((B, T), bool)
            cfg = ep.EPConfig(ep_itts=EP_ITTS, backend="pallas",
                              moment_chunk=8192)

            t0 = time.perf_counter()
            rb = bt.ep_infer_batch(model, paramsB, yB, maskB, cfg)
            nlZ = np.asarray(rb.nlZ)
            log(f"[batch B={B}] compile+run", t0)
            if not np.all(np.isfinite(nlZ)):
                log(f"[batch B={B}] non-finite energies; skipping")
                continue
            t0 = time.perf_counter()
            for _ in range(reps):
                rb = bt.ep_infer_batch(model, paramsB, yB, maskB, cfg)
                sync(rb.nlZ)
            elapsed = (time.perf_counter() - t0) / reps
            thru = B * T * EP_ITTS / elapsed
            log(f"[batch B={B}] steady-state: {elapsed:.2f} s / {EP_ITTS} "
                f"sweeps x {B} signals; {thru:,.0f} filtered samples/s/chip")
            RESULT[f"batched_b{B}_samples_per_s"] = round(thru)
            RESULT[f"batched_b{B}_s_per_sweep_per_signal"] = round(
                elapsed / EP_ITTS / B, 4)
        except Exception as e:
            log(f"[batch B={B}] FAILED: {type(e).__name__}: {e}")

    emit_and_exit()


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # always emit the JSON line
        log(f"FAILED: {type(e).__name__}: {e}")
        emit_and_exit()
