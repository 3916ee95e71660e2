"""Blocked (two-level) parallel Kalman filtering / smoothing.

The one-level ``jax.lax.associative_scan`` form (nsgp_tpu.ops.pscan) must
materialize all T composition elements as (T, C, bs, bs) tensors — a
measured 32-40x TPU tile-padding blowup that OOMs at T ~ 100k — and its
log-depth tree rewrites O(T) data log T times.  The classic blocked scan
fixes both:

  pass 1: split T into nc chunks of L steps; a single L-step ``lax.scan``
          composes each chunk's total element, VECTORIZED over all nc
          chunks (per step: one batched (nc, C, bs, bs) combine — dense
          VPU/MXU work instead of tiny per-step ops);
  pass 2: compose chunk totals across the nc chunks (tiny);
  pass 3: a second L-step scan re-walks each chunk starting from its
          cross-chunk prefix and EMITS the filtered/smoothed moments,
          flattened to (T, C*bs[*bs]) (see kalman.PackedTrajectory).

Composition elements are built ON THE FLY inside the scans from the (T, C)
site arrays / flattened filtered moments, so no (T, C, bs, bs) tensor ever
exists.  Sequential depth drops from T to 2L + nc (~1200 at T = 100k,
L = 512) with ~2x the arithmetic of one sequential pass.

Element algebra = nsgp_tpu.ops.pscan (Särkkä & García-Fernández 2020
prefix-sum Kalman); results match the sequential engine to float tolerance
(tests/test_bscan.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nsgp_tpu.ops.kalman import Sites
from nsgp_tpu.ops.pscan import _filter_combine, _smoother_combine, _sym
from nsgp_tpu.ops.ssm import BlockSSM


def _chunk_sharded(x, time_axis: str):
    """Seed GSPMD with a chunk-axis sharding (no-op if axis empty).

    ``x`` has the chunk axis LEADING ((nc, L, ...)).  Each device then owns
    a contiguous run of chunks; passes 1 and 3 (the vmapped within-chunk
    scans) partition with zero communication, and the pass-2 associative
    scan over the nc chunk totals is the ONLY cross-device exchange — the
    blocked scan is exactly the algorithm whose chunk axis shards over a
    mesh 'time' axis.
    """
    if not time_axis:
        return x
    from jax.sharding import PartitionSpec as P

    spec = P(time_axis, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, spec)


def _pad_T(x, L):
    """Pad the leading time axis to a multiple of L."""
    T = x.shape[0]
    pad = (-T) % L
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
    return x, T


def _filter_identity(nc, C, bs, dtype):
    I = jnp.broadcast_to(jnp.eye(bs, dtype=dtype), (nc, C, bs, bs))
    zM = jnp.zeros((nc, C, bs, bs), dtype)
    zv = jnp.zeros((nc, C, bs), dtype)
    return (I, zv, zM, zv, zM)


def _make_filter_elem(ssm: BlockSSM, tt, tn, is_first):
    """Filtering element for a batch of steps.

    tt/tn: (nc, C) site rows; is_first: (nc, 1, 1[, 1]) mask selecting the
    global step-0 element (P0 = Pinf, no predict; ref skips the first
    predict).  Returns the pscan 5-tuple batched as (nc, C, ...).
    """
    A, Q, H, Pinf = ssm.A, ssm.Q, ssm.H, ssm.Pinf
    QH = jnp.einsum("cij,cj->ci", Q, H)
    HQH = jnp.einsum("ci,ci->c", H, QH)
    HA = jnp.einsum("ci,cij->cj", H, A)
    AH = jnp.einsum("cji,cj->ci", A, H)

    z = tt * HQH + 1.0  # (nc, C)
    Kg = QH[None] * (tt / z)[..., None]  # (nc, C, bs)
    A_el = A[None] - Kg[..., :, None] * HA[None, :, None, :]
    b_el = QH[None] * (tn / z)[..., None]
    C_el = Q[None] - Kg[..., :, None] * QH[None, :, None, :]
    eta_el = AH[None] * (tn / z)[..., None]
    J_el = (tt / z)[..., None, None] * AH[None, :, :, None] * AH[None, :, None, :]

    # Global step 0: P0 = Pinf, no prediction.
    PH0 = jnp.einsum("cij,cj->ci", Pinf, H)
    HPH0 = jnp.einsum("ci,ci->c", H, PH0)
    z0 = tt * HPH0 + 1.0
    K0 = PH0[None] * (tt / z0)[..., None]
    b0 = PH0[None] * (tn / z0)[..., None]
    C0 = Pinf[None] - K0[..., :, None] * PH0[None, :, None, :]

    m1, m2 = is_first, is_first[..., 0]
    return (
        jnp.where(m1, 0.0, A_el),
        jnp.where(m2, b0, b_el),
        _sym(jnp.where(m1, C0, C_el)),
        jnp.where(m2, 0.0, eta_el),
        _sym(jnp.where(m1, 0.0, J_el)),
    )


def blocked_filter_with_sites(ssm: BlockSSM, sites: Sites, chunk: int = 512,
                              time_axis: str = ""):
    """Parallel-in-time forward filter with fixed sites; O(2L + T/L) depth.

    Returns FLATTENED filtered moments (ms (T, C*bs), Ps (T, C*bs*bs)).
    ``time_axis``: mesh axis name to shard the chunk dimension over (see
    _chunk_sharded) — the TPU-native stand-in for multi-host time
    parallelism.
    """
    C, bs = ssm.H.shape
    dt_ = ssm.A.dtype
    L = int(chunk)
    tt, T = _pad_T(sites.ttau, L)  # zero-padded sites => inert steps
    tn, _ = _pad_T(sites.tnu, L)
    nc = tt.shape[0] // L
    tt = _chunk_sharded(tt.reshape(nc, L, C), time_axis)
    tn = _chunk_sharded(tn.reshape(nc, L, C), time_axis)
    first_chunk = (jnp.arange(nc) == 0)[:, None, None, None]

    def pass1(carry, inp):
        ttc, tnc, i = inp
        e = _make_filter_elem(
            ssm, ttc, tnc,
            first_chunk & (i == 0),
        )
        return _filter_combine(carry, e), None

    idx = jnp.arange(L)
    init = _filter_identity(nc, C, bs, dt_)
    totals, _ = jax.lax.scan(
        pass1, init, (jnp.swapaxes(tt, 0, 1), jnp.swapaxes(tn, 0, 1), idx)
    )

    # pass 2: exclusive prefix of chunk totals (nc is small).
    inc = jax.lax.associative_scan(_filter_combine, totals, axis=0)
    ident1 = _filter_identity(1, C, bs, dt_)
    prefix = jax.tree.map(
        lambda a, i: jnp.concatenate([i, a[:-1]], axis=0), inc, ident1
    )

    # pass 3: re-walk each chunk from its prefix, emit filtered moments.
    def pass3(carry, inp):
        ttc, tnc, i = inp
        e = _make_filter_elem(ssm, ttc, tnc, first_chunk & (i == 0))
        new = _filter_combine(carry, e)
        _, b, Cm, _, _ = new
        return new, (b.reshape(nc, -1), Cm.reshape(nc, -1))

    _, (ms, Ps) = jax.lax.scan(
        pass3, prefix, (jnp.swapaxes(tt, 0, 1), jnp.swapaxes(tn, 0, 1), idx)
    )
    # (L, nc, K) -> (nc, L, K) -> (nc*L, K) -> trim padding
    ms = jnp.swapaxes(ms, 0, 1).reshape(nc * L, -1)[:T]
    Ps = jnp.swapaxes(Ps, 0, 1).reshape(nc * L, -1)[:T]
    return ms, Ps


def _make_smoother_elem(ssm: BlockSSM, ms_row, Ps_row, is_last):
    """Smoothing element for a batch of steps from FLATTENED filtered
    moments.  ms_row (nc, C*bs), Ps_row (nc, C*bs*bs); is_last selects the
    global step T-1 element (E=0, g=m, L=P)."""
    C, bs = ssm.H.shape
    nc = ms_row.shape[0]
    m = ms_row.reshape(nc, C, bs)
    P = Ps_row.reshape(nc, C, bs, bs)
    A, Q = ssm.A, ssm.Q
    Pp = jnp.einsum("cij,ncjk,clk->ncil", A, P, A) + Q[None]
    Pp = _sym(Pp)
    PA = jnp.einsum("ncij,ckj->ncik", P, A)
    Et = jnp.linalg.solve(
        jnp.swapaxes(Pp + ssm.pad_eye[None], -1, -2), jnp.swapaxes(PA, -1, -2)
    )
    E = jnp.swapaxes(Et, -1, -2)
    g = m - jnp.einsum("ncij,cjk,nck->nci", E, A, m)
    Lm = _sym(P - E @ Pp @ jnp.swapaxes(E, -1, -2))

    m1, m2 = is_last, is_last[..., 0]
    return (
        jnp.where(m1, 0.0, E),
        jnp.where(m2, m, g),
        _sym(jnp.where(m1, P, Lm)),
    )


def blocked_rts_smoother(ssm: BlockSSM, ms, Ps, chunk: int = 512,
                         time_axis: str = ""):
    """Parallel-in-time RTS smoother over FLATTENED filtered moments.

    Returns flattened smoothed (ms (T, C*bs), Ps (T, C*bs*bs)).
    """
    C, bs = ssm.H.shape
    dt_ = ssm.A.dtype
    L = int(chunk)
    T = ms.shape[0]
    # Pad at the FRONT so the global last step stays last; padded rows have
    # P = pad-safe identity-ish moments and are trimmed after.
    pad = (-T) % L
    if pad:
        pz = jnp.zeros((pad, ms.shape[1]), dt_)
        # padded covariance rows = Pinf (any PSD value works; rows trimmed)
        pP = jnp.broadcast_to(ssm.Pinf.reshape(1, -1), (pad, Ps.shape[1]))
        ms_p = jnp.concatenate([pz, ms], 0)
        Ps_p = jnp.concatenate([pP, Ps], 0)
    else:
        ms_p, Ps_p = ms, Ps
    Tp = ms_p.shape[0]
    nc = Tp // L
    msc = _chunk_sharded(ms_p.reshape(nc, L, -1), time_axis)
    Psc = _chunk_sharded(Ps_p.reshape(nc, L, -1), time_axis)
    last_chunk = (jnp.arange(nc) == nc - 1)[:, None, None, None]

    def ident(n):
        I = jnp.broadcast_to(jnp.eye(bs, dtype=dt_), (n, C, bs, bs))
        return (I, jnp.zeros((n, C, bs), dt_), jnp.zeros((n, C, bs, bs), dt_))

    # Reverse scans: walk i = L-1 .. 0 (suffix compositions).
    idx = jnp.arange(L)

    def pass1(carry, inp):
        ms_r, Ps_r, i = inp
        e = _make_smoother_elem(ssm, ms_r, Ps_r, last_chunk & (i == L - 1))
        return _smoother_combine(carry, e), None

    totals, _ = jax.lax.scan(
        pass1, ident(nc),
        (jnp.swapaxes(msc, 0, 1), jnp.swapaxes(Psc, 0, 1), idx),
        reverse=True,
    )

    # suffix compositions across chunks (exclusive, from the right)
    inc = jax.lax.associative_scan(
        _smoother_combine, totals, axis=0, reverse=True
    )
    suffix = jax.tree.map(
        lambda a, i: jnp.concatenate([a[1:], i], axis=0), inc, ident(1)
    )

    def pass3(carry, inp):
        ms_r, Ps_r, i = inp
        e = _make_smoother_elem(ssm, ms_r, Ps_r, last_chunk & (i == L - 1))
        new = _smoother_combine(carry, e)
        _, g, Lm = new
        return new, (g.reshape(nc, -1), Lm.reshape(nc, -1))

    _, (sm, sP) = jax.lax.scan(
        pass3, suffix,
        (jnp.swapaxes(msc, 0, 1), jnp.swapaxes(Psc, 0, 1), idx),
        reverse=True,
    )
    sm = jnp.swapaxes(sm, 0, 1).reshape(nc * L, -1)[pad:]
    sP = jnp.swapaxes(sP, 0, 1).reshape(nc * L, -1)[pad:]
    return sm, sP


def blocked_filter_smoother(ssm: BlockSSM, sites: Sites, chunk: int = 512,
                            jitter: float = 0.0, time_axis: str = ""):
    """One full linear-Gaussian forward/backward pass, blocked-parallel."""
    del jitter  # pad_eye regularizes the smoother-gain solves
    ms, Ps = blocked_filter_with_sites(ssm, sites, chunk, time_axis)
    return blocked_rts_smoother(ssm, ms, Ps, chunk, time_axis)
