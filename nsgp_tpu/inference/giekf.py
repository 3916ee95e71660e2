"""Global iterated EKF inference for the GT-NMF model.

TPU-native re-design of gf_giekf_modulator_nmf.m / _constraints.m /
ekf_update1.m / iekf_update1.m.

Unlike the EP engines, the EKF linearizes the single *scalar* observation
h(x) = (H_z x)' W link(H_g x), which couples every channel — the posterior
covariance is dense.  We therefore materialize the dense joint model
(block-diagonal assembly with inert padded dims; state dim m = C * bs) and
run dense (m x m) recursions under ``lax.scan`` — m <= ~100, so each step is
small-matrix MXU work.

Reference semantics replicated:
- ``l_iter`` inner IEKF re-linearizations per measurement update
  (iekf_update1.m:110-117),
- ``g_iter`` outer/global passes: pass s >= 2 re-linearizes each update
  around the *smoothed* trajectory from pass s-1 (gf_giekf_modulator_nmf.m
  filter/smoother outer loop),
- energy = sum of innovation negative log-likelihoods.  The reference
  hand-rolls a 140-line sensitivity-equation gradient
  (gf_giekf_modulator_nmf.m:294-439); we get exact gradients by autodiff
  through the filter instead.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from nsgp_tpu.models.gtnmf import GTNMFModel, GTNMFParams
from nsgp_tpu.ops.moments import LINKS
from nsgp_tpu.ops.ssm import BlockSSM
from nsgp_tpu.utils.precision import f32_matmuls


class GIEKFConfig(NamedTuple):
    g_iter: int = 3  # global (filter+smoother) passes
    l_iter: int = 5  # inner IEKF iterations per update (iekf_update1 default)
    jitter: float = 1e-9
    accept_tol: float = 1e-3  # per-pass acceptance (VERDICT r4 item 8):
    # a global pass is kept only if its innovation NLL does not exceed the
    # best accepted pass's by more than accept_tol * |best| — extra passes
    # can then never degrade the posterior (the reference has no such gate
    # and its deep iteration silently drifts on hard f32 signals, e.g.
    # speech1_male finite-but-collapsed at 20 passes).  Set < 0 to disable
    # (pure reference semantics: every finite pass is kept).


class GIEKFResult(NamedTuple):
    Eft: jax.Array  # (T, C) smoothed observable means
    Varft: jax.Array  # (T, C) smoothed observable variances
    ms: jax.Array  # (T, m) smoothed dense state means
    Ps: jax.Array  # (T, m, m) smoothed dense covariances
    nll: jax.Array  # () innovation NLL of the final filter pass


def dense_model(ssm: BlockSSM):
    """Jittable dense joint (A, Q, Pinf, Hd) with inert padded dims.

    Hd is (C, m): one observable row per channel (padded dims stay zero, so
    they never enter the measurement)."""
    C, bs = ssm.A.shape[0], ssm.A.shape[-1]
    m = C * bs

    def bd(blocks):  # (C, bs, bs) -> (m, m) block diagonal
        out = jnp.zeros((m, m), blocks.dtype)
        idx = jnp.arange(C) * bs

        def place(out, c):
            return jax.lax.dynamic_update_slice(out, blocks[c], (idx[c], idx[c]))

        return jax.lax.fori_loop(0, C, lambda c, o: place(o, c), out)

    A = bd(ssm.A)
    # Identity noise on the zero-padded dims keeps every pseudo-prediction
    # covariance nonsingular (A = 0 there, so P stays exactly pad_eye on the
    # padded diagonal and 0 off it); H is zero on those dims, so they never
    # couple to the measurement — inert, like ssm.pad_eye in the blocked
    # engine.  Without this the dense RTS solve is singular.
    Q = bd(ssm.Q) + bd(ssm.pad_eye)
    Pinf = bd(ssm.Pinf) + bd(ssm.pad_eye)
    Hd = (jnp.eye(C, dtype=ssm.H.dtype)[:, :, None] * ssm.H[None]).reshape(C, m)
    return A, Q, Pinf, Hd


def _measurement(model: GTNMFModel, W: jax.Array, f: jax.Array):
    """Scalar measurement and its gradient w.r.t. the observables f (C,).

    h = z' a(g);  'amp': a = W link(g);  'sq': a = sqrt(W link(g))
    (ref funh/funhd, gf_giekf_modulator_nmf.m:444-473, link at :97-99)."""
    D = model.D
    link = LINKS[model.link]
    z, g = f[:D], f[D:]
    lg = link(g)
    Wl = W @ lg  # (D,)
    if model.variant == "sq":
        a = jnp.sqrt(jnp.maximum(Wl, 1e-12))
        da_dg = (W * jax.grad(lambda x: jnp.sum(link(x)))(g)[None, :]) / (
            2.0 * a[:, None]
        )
    else:
        a = Wl
        da_dg = W * jax.grad(lambda x: jnp.sum(link(x)))(g)[None, :]
    yhat = z @ a
    dh_dz = a  # (D,)
    dh_dg = z @ da_dg  # (N,)
    return yhat, jnp.concatenate([dh_dz, dh_dg])


def _filter(model, W, sn2, A, Q, Hd, y, mask, m0, P0, cfg, l_iter):
    """One (I)EKF forward pass starting from (m0, P0).

    Reference-exact update (iekf_update1.m:110-117): the inner loop is the
    *pseudo-iterated* form

        for it = 1..iters:  J = dh(M); S = J P J' + R; K = P J / S;
                            M = M + K (y - h(M))
        P = P - K S K'                       (final-iteration K, S)

    i.e. the innovation is re-evaluated at the moving M, the gain always
    uses the predicted P, and there is NO Jacobian correction term
    J (m_pred - M) — unlike the textbook IEKF.  The covariance update uses
    the last iteration's K and S.  The energy contribution is the plain-EKF
    innovation NLL at the predicted mean (gf_giekf_modulator_nmf.m:424,
    where the energy path does a single linearization).
    """
    eye = jnp.eye(A.shape[0], dtype=A.dtype)

    def step(carry, inp):
        mx, P, first = carry
        y_k, obs_k = inp
        mx, P = jax.lax.cond(
            first,
            lambda: (mx, P),
            lambda: (A @ mx, A @ P @ A.T + Q),
        )
        P = 0.5 * (P + P.T)

        # Plain-EKF quantities at the predicted mean (first linearization):
        # these feed the energy, and iteration 1 of the loop below.
        f0 = Hd @ mx
        yhat0, dh0 = _measurement(model, W, f0)
        J0 = dh0 @ Hd
        PJ0 = P @ J0
        S0 = J0 @ PJ0 + sn2
        nll_k = 0.5 * (jnp.log(2.0 * jnp.pi * S0) + (y_k - yhat0) ** 2 / S0)

        def iekf_body(i, state):
            M, _, _, _ = state
            f = Hd @ M
            yhat, dh = _measurement(model, W, f)
            J = dh @ Hd  # (m,)
            PJ = P @ J
            S = J @ PJ + sn2
            K = PJ / S
            return M + K * (y_k - yhat), K, S, J

        M, K, S, J = jax.lax.fori_loop(
            0, l_iter, iekf_body, (mx, PJ0 / S0, S0, J0)
        )
        # Joseph-form covariance update: algebraically equal to the
        # reference's P - K S K' (iekf_update1.m:117) at the optimal gain,
        # but PSD-preserving in f32 (P - KSK' loses definiteness over many
        # global passes on hard signals and NaNs the filter).
        ImKJ = eye - jnp.outer(K, J)
        P_upd = ImKJ @ P @ ImKJ.T + sn2 * jnp.outer(K, K)
        P_upd = 0.5 * (P_upd + P_upd.T)

        # f32 divergence guard (VERDICT r3 weak #3): on hard signals the
        # global relinearization loop can drive the linearization so far off
        # that S <= 0 or the update overflows in f32.  The reference's only
        # guard is in the energy path (gf_giekf_modulator_nmf.m:382-391
        # returns NaN to the optimizer on a non-PSD S); prediction mode has
        # none and NaNs the trajectory.  Here a bad update is REJECTED —
        # the step falls back to pure prediction, keeping the filter finite
        # and letting later (sane) measurements re-anchor the state.
        upd_ok = (
            (S0 > 0.0)
            & (S > 0.0)
            & jnp.all(jnp.isfinite(M))
            & jnp.all(jnp.isfinite(P_upd))
        )
        obs_eff = obs_k & upd_ok
        rejected = obs_k & ~upd_ok
        mx = jnp.where(obs_eff, M, mx)
        P = jnp.where(obs_eff, P_upd, P)
        nll_k = jnp.where(obs_eff, nll_k, 0.0)
        return (mx, P, jnp.zeros_like(first)), (mx, P, nll_k, rejected)

    (mT, PT, _), (ms, Ps, nll, rejected) = jax.lax.scan(
        step, (m0, P0, jnp.asarray(True)), (y, mask)
    )
    return ms, Ps, jnp.sum(nll), jnp.sum(rejected)


def _rts_dense(A, Q, ms, Ps, jitter):
    m_dim = A.shape[0]
    eye = jnp.eye(m_dim, dtype=A.dtype)

    def step(carry, inp):
        m_next, P_next = carry
        ms_k, Ps_k = inp
        Pp = A @ Ps_k @ A.T + Q + jitter * eye
        G = jnp.linalg.solve(Pp.T, (Ps_k @ A.T).T).T
        m = ms_k + G @ (m_next - A @ ms_k)
        P = Ps_k + G @ (P_next - Pp) @ G.T
        P = 0.5 * (P + P.T)
        return (m, P), (m, P)

    (_, _), (ms_r, Ps_r) = jax.lax.scan(
        step, (ms[-1], Ps[-1]), (ms[:-1], Ps[:-1]), reverse=True
    )
    return (
        jnp.concatenate([ms_r, ms[-1:]], axis=0),
        jnp.concatenate([Ps_r, Ps[-1:]], axis=0),
    )


@partial(jax.jit, static_argnums=(0, 6))
@f32_matmuls
def _giekf_pass(
    model: GTNMFModel,
    params: GTNMFParams,
    y: jax.Array,
    mask: jax.Array,
    m0: jax.Array,
    P0: jax.Array,
    config: GIEKFConfig,
):
    """One global pass: (I)EKF filter + dense RTS smoother."""
    ssm = model.build_ssm(params)
    A, Q, _, Hd = dense_model(ssm)
    msf, Psf, nll, _ = _filter(
        model, params.W, params.lik, A, Q, Hd, y, mask, m0, P0, config,
        config.l_iter,
    )
    ms, Ps = _rts_dense(A, Q, msf, Psf, config.jitter)
    good = (
        jnp.all(jnp.isfinite(ms))
        & jnp.all(jnp.isfinite(Ps))
        & jnp.isfinite(nll)
    )
    return ms, Ps, nll, good


@partial(jax.jit, static_argnums=(0,))
@f32_matmuls
def _giekf_init(model: GTNMFModel, params: GTNMFParams):
    ssm = model.build_ssm(params)
    A, _, Pinf, Hd = dense_model(ssm)
    return jnp.zeros((A.shape[0],), A.dtype), Pinf, Hd


def giekf_infer(
    model: GTNMFModel,
    params: GTNMFParams,
    y: jax.Array,
    mask: Optional[jax.Array] = None,
    config: GIEKFConfig = GIEKFConfig(),
) -> GIEKFResult:
    """Global-IEKF posterior inference (prediction mode of the reference).

    Global iteration, reference-exact (gf_giekf_modulator_nmf.m:128-131):
    the state is initialized from the prior only on the FIRST pass; pass
    s >= 2 warm-starts the filter from the smoothed (m, P) at k = 1 left
    behind by the previous smoother sweep.

    Each global pass is its OWN jit call (host-level loop): one compiled
    pass reused g_iter times instead of a g_iter-times-unrolled program —
    ~g_iter x smaller compile, and single-dispatch runtimes stay in the
    seconds range (a 20-pass fused program runs minutes in one XLA
    execution, which the TPU-tunnel runtime's watchdog can kill).
    """
    if mask is None:
        mask = ~jnp.isnan(y)
    y = jnp.nan_to_num(y)
    m0, P0, Hd = _giekf_init(model, params)

    ms = Ps = None
    nll = jnp.zeros((), m0.dtype)
    for g in range(config.g_iter):
        ms_g, Ps_g, nll_g, good = _giekf_pass(
            model, params, y, mask, m0, P0, config
        )
        # Pass-level guards: (i) divergence — keep the last finite pass's
        # posterior (pass 1 — plain IEKF from the prior — is stable in
        # practice); (ii) acceptance — reject a finite pass whose
        # innovation NLL regressed past accept_tol (see GIEKFConfig), so
        # deep iteration cannot silently degrade quality.  The next pass
        # restarts from the kept posterior either way.
        if ms is None:
            ms, Ps, nll = ms_g, Ps_g, nll_g
        else:
            if config.accept_tol >= 0.0:
                good = good & (
                    nll_g <= nll + config.accept_tol * jnp.abs(nll)
                )
            ms = jnp.where(good, ms_g, ms)
            Ps = jnp.where(good, Ps_g, Ps)
            nll = jnp.where(good, nll_g, nll)
        m0, P0 = ms[0], Ps[0]

    Eft = ms @ Hd.T  # (T, C)
    Varft = jnp.einsum("ci,tij,cj->tc", Hd, Ps, Hd)
    return GIEKFResult(Eft=Eft, Varft=Varft, ms=ms, Ps=Ps, nll=nll)


@partial(jax.jit, static_argnums=(0, 4))
@f32_matmuls
def giekf_energy(
    model: GTNMFModel,
    params: GTNMFParams,
    y: jax.Array,
    mask: Optional[jax.Array] = None,
    config: GIEKFConfig = GIEKFConfig(),
) -> jax.Array:
    """Innovation NLL (energy mode).  Exact gradients via autodiff — replaces
    the reference's hand-rolled sensitivity recursion
    (gf_giekf_modulator_nmf.m:294-439)."""
    if mask is None:
        mask = ~jnp.isnan(y)
    y = jnp.nan_to_num(y)
    ssm = model.build_ssm(params)
    A, Q, Pinf, Hd = dense_model(ssm)
    # Reference energy mode is a single plain-EKF pass (one linearization at
    # the predicted mean per step, gf_giekf_modulator_nmf.m:373-430), hence
    # l_iter = 1 here regardless of the prediction-mode setting.
    m0 = jnp.zeros((A.shape[0],), A.dtype)
    _, _, nll, n_rejected = _filter(
        model, params.W, params.lik, A, Q, Hd, y, mask, m0, Pinf, config, 1
    )
    # Reference energy semantics (gf_giekf_modulator_nmf.m:382-391): a
    # non-PSD innovation covariance makes the energy NaN, rejecting the
    # hyperparameter point outright.  The in-scan rejection guard above keeps
    # *prediction* finite, but silently dropping rejected steps from the
    # energy sum would understate it and attract learn/HMC toward pathological
    # hyper regions — so energy mode reinstates the NaN.
    return jnp.where(n_rejected > 0, jnp.nan, nll)
