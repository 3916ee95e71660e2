"""Block-structured state-space model assembly and discretization.

TPU-native re-design of the reference's dense joint-model builders
(matlab/ss_modulators_nmf.m, matlab/ss_modulators.m,
matlab/unifying_prob_tf/lti_disc.m, matlab/unifying_prob_tf/get_disc_model.m).

The reference materializes one dense joint system (blkdiag over channels,
state dim m = 2*tau1*D + tau3*N) and pays O(m^3) per Kalman step.  Because
(i) the dynamics are block-diagonal per channel and (ii) every (pseudo-)
observation row of H is supported on exactly one channel block, the joint
filter covariance is block-diagonal for all time.  We therefore never build
the dense system: channels are stacked along a leading axis as uniform padded
blocks ``(C, bs, bs)`` and all downstream algebra is batched (vmap) or
sharded (mesh axis 'channel') over C.

Channel layout (matches the reference's H-row order, gf_ep_modulator_nmf.m):
  channels 0..D-1   : subbands  (kernel1 x cosine product, block 2*tau1)
  channels D..D+N-1 : modulators (kernel2, block tau3)
Blocks smaller than bs are zero-padded; padding is inert (A=I, Q=0, Pinf=0,
H=0 on padded dims), so padded state/covariance entries remain exactly 0.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from nsgp_tpu.ops import kernels as K


class BlockSSM(NamedTuple):
    """Channel-stacked continuous/discrete state-space model.

    All arrays carry a leading channel axis C = D + N.
    """

    F: jax.Array  # (C, bs, bs) continuous-time feedback
    LQcLT: jax.Array  # (C, bs, bs) process-noise term L Qc L'
    H: jax.Array  # (C, bs)     per-channel observation row
    Pinf: jax.Array  # (C, bs, bs) stationary covariance
    A: jax.Array  # (C, bs, bs) discrete transition expm(F*dt)
    Q: jax.Array  # (C, bs, bs) discrete process noise
    pad_eye: jax.Array  # (C, bs, bs) identity on zero-padded dims (else 0):
    # added to covariances before linear solves so padded blocks stay
    # nonsingular; inert because padded rows of P/H are exactly zero.
    D: int  # number of subband channels
    N: int  # number of modulator channels

    @property
    def num_channels(self) -> int:
        return self.F.shape[0]

    @property
    def block_size(self) -> int:
        return self.F.shape[-1]


def _pad_block(M: jax.Array, bs: int) -> jax.Array:
    """Zero-pad a (t, t) block to (bs, bs)."""
    t = M.shape[0]
    return jnp.pad(M, ((0, bs - t), (0, bs - t)))


def _pad_row(h: jax.Array, bs: int) -> jax.Array:
    return jnp.pad(h, (0, bs - h.shape[0]))


def subband_block(sigma2, ell, omega, kernel: str, dtype=None):
    """Quasi-periodic subband channel: kernel x cosine product.

    Ref: ss_modulators_nmf.m:49-78 —
      F_sm = kron(F1, I2) + kron(I_tau1, [[0,-w],[w,0]])
      L_sm = kron(L1, I2),  Qc_sm = Qc1 * I2,
      H_sm = kron(H1, [1,0]),  Pinf_sm = kron(Pinf1, I2).
    Returns (F, LQcLT, H_row, Pinf) of block size 2*tau1.
    """
    ss = K.get_kernel(kernel)(sigma2, ell, dtype=dtype) if kernel != "se" else K.se_to_ss(
        sigma2, ell, dtype=dtype
    )
    tau1 = ss.F.shape[0]
    dt_ = ss.F.dtype
    I2 = jnp.eye(2, dtype=dt_)
    omega = jnp.asarray(omega, dt_)
    rot = jnp.stack(
        [
            jnp.stack([jnp.zeros((), dt_), -omega]),
            jnp.stack([omega, jnp.zeros((), dt_)]),
        ]
    )
    F = jnp.kron(ss.F, I2) + jnp.kron(jnp.eye(tau1, dtype=dt_), rot)
    LQcLT_base = ss.L @ ss.Qc @ ss.L.T  # (tau1, tau1)
    LQcLT = jnp.kron(LQcLT_base, I2)
    H = jnp.kron(ss.H[0], jnp.asarray([1.0, 0.0], dt_))
    Pinf = jnp.kron(ss.Pinf, I2)
    return F, LQcLT, H, Pinf


def modulator_block(sigma2, ell, kernel: str, dtype=None):
    """Slow-varying modulator channel.  Ref: ss_modulators_nmf.m:93-118."""
    ss = K.get_kernel(kernel)(sigma2, ell, dtype=dtype)
    LQcLT = ss.L @ ss.Qc @ ss.L.T
    return ss.F, LQcLT, ss.H[0], ss.Pinf


def lti_disc_matrix_fraction(F: jax.Array, LQcLT: jax.Array, dt: float = 1.0):
    """Exact LTI discretization by matrix-fraction decomposition.

    Ref: lti_disc.m:73-82.  A = expm(F dt); Q via the 2n x 2n exponential of
    [[F, LQcLT], [0, -F']].  Works per block; vmap over channels.
    """
    n = F.shape[0]
    A = jax.scipy.linalg.expm(F * dt)
    Phi = jnp.block([[F, LQcLT], [jnp.zeros_like(F), -F.T]])
    EPhi = jax.scipy.linalg.expm(Phi * dt)
    AB_top = EPhi[:n, n:]
    AB_bot = EPhi[n:, n:]
    Q = jnp.linalg.solve(AB_bot.T, AB_top.T).T
    return A, 0.5 * (Q + Q.T)


def lti_disc_stationary(F: jax.Array, Pinf: jax.Array, dt: float = 1.0):
    """Discretization via the stationarity identity Q = Pinf - A Pinf A'.

    Exact for stationary processes (all kernels here).  One expm instead of
    two; preferred on TPU.  Ref: gf_giekf_modulator_nmf.m:353 uses the same
    identity.
    """
    A = jax.scipy.linalg.expm(F * dt)
    Q = Pinf - A @ Pinf @ A.T
    return A, 0.5 * (Q + Q.T)


def build_modulator_ssm(
    sub_sigma2: jax.Array,  # (D,)
    sub_ell: jax.Array,  # (D,)
    sub_omega: jax.Array,  # (D,)
    mod_sigma2: jax.Array,  # (N,)
    mod_ell: jax.Array,  # (N,)
    kernel1: str = "matern32",
    kernel2: str = "matern52",
    dt: float = 1.0,
    discretization: str = "stationary",
) -> BlockSSM:
    """Build the channel-stacked GT-NMF state-space model.

    Equivalent of ss_modulators_nmf.m + lti_disc.m, but per-channel blocks
    padded to uniform size bs = max(2*tau1, tau3) and stacked on a leading
    channel axis.  The same builder covers the non-NMF per-subband modulator
    model (ss_modulators.m) with N == D.
    """
    sub_sigma2 = jnp.atleast_1d(jnp.asarray(sub_sigma2))
    dtype = sub_sigma2.dtype
    sub_ell = jnp.atleast_1d(jnp.asarray(sub_ell, dtype))
    sub_omega = jnp.atleast_1d(jnp.asarray(sub_omega, dtype))
    mod_sigma2 = jnp.atleast_1d(jnp.asarray(mod_sigma2, dtype))
    mod_ell = jnp.atleast_1d(jnp.asarray(mod_ell, dtype))
    D = sub_sigma2.shape[0]
    N = mod_sigma2.shape[0]
    tau1 = K.kernel_state_dim(kernel1)
    tau3 = K.kernel_state_dim(kernel2)
    bs = max(2 * tau1, tau3)

    def one_subband(s2, ell, om):
        F, LQcLT, H, Pinf = subband_block(s2, ell, om, kernel1, dtype=dtype)
        return _pad_block(F, bs), _pad_block(LQcLT, bs), _pad_row(H, bs), _pad_block(Pinf, bs)

    def one_modulator(s2, ell):
        F, LQcLT, H, Pinf = modulator_block(s2, ell, kernel2, dtype=dtype)
        return _pad_block(F, bs), _pad_block(LQcLT, bs), _pad_row(H, bs), _pad_block(Pinf, bs)

    Fs, LQs, Hs, Ps = jax.vmap(one_subband)(sub_sigma2, sub_ell, sub_omega)
    Fm, LQm, Hm, Pm = jax.vmap(one_modulator)(mod_sigma2, mod_ell)

    F = jnp.concatenate([Fs, Fm], axis=0)
    LQcLT = jnp.concatenate([LQs, LQm], axis=0)
    H = jnp.concatenate([Hs, Hm], axis=0)
    Pinf = jnp.concatenate([Ps, Pm], axis=0)

    if discretization == "stationary":
        A, Q = jax.vmap(lambda f, p: lti_disc_stationary(f, p, dt))(F, Pinf)
    else:
        A, Q = jax.vmap(lambda f, lq: lti_disc_matrix_fraction(f, lq, dt))(F, LQcLT)

    pad_sub = jnp.concatenate(
        [jnp.zeros(2 * tau1, F.dtype), jnp.ones(bs - 2 * tau1, F.dtype)]
    )
    pad_mod = jnp.concatenate([jnp.zeros(tau3, F.dtype), jnp.ones(bs - tau3, F.dtype)])
    pad_eye = jnp.concatenate(
        [
            jnp.tile(jnp.diag(pad_sub)[None], (D, 1, 1)),
            jnp.tile(jnp.diag(pad_mod)[None], (N, 1, 1)),
        ],
        axis=0,
    )
    return BlockSSM(
        F=F, LQcLT=LQcLT, H=H, Pinf=Pinf, A=A, Q=Q, pad_eye=pad_eye, D=D, N=N
    )


def concat_ssms(ssms: Sequence[BlockSSM]) -> BlockSSM:
    """Stack J models for joint (mixture) inference, subbands first then
    modulators, mirroring the block-diagonal assembly of
    experiments/gf_ep_mods_nmf_mixture.m:90-128.

    All models must share kernel orders (same block size); blocks are padded
    to the max block size if they differ.
    """
    bs = max(s.block_size for s in ssms)

    def pad(ssm: BlockSSM) -> BlockSSM:
        # Zero padding is inert: padded dims have Pinf=Q=0 and H=0, so the
        # filtered mean/covariance stay exactly 0 there regardless of A.
        if ssm.block_size == bs:
            return ssm
        p = bs - ssm.block_size
        pad3 = lambda M: jnp.pad(M, ((0, 0), (0, p), (0, p)))
        pe = pad3(ssm.pad_eye)
        new_diag = jnp.zeros((bs,), ssm.F.dtype).at[ssm.block_size :].set(1.0)
        pe = pe + jnp.diag(new_diag)[None]
        return BlockSSM(
            F=pad3(ssm.F), LQcLT=pad3(ssm.LQcLT), H=jnp.pad(ssm.H, ((0, 0), (0, p))),
            Pinf=pad3(ssm.Pinf), A=pad3(ssm.A), Q=pad3(ssm.Q), pad_eye=pe,
            D=ssm.D, N=ssm.N,
        )

    ssms = [pad(s) for s in ssms]
    subs = [slice(0, s.D) for s in ssms]
    mods = [slice(s.D, s.D + s.N) for s in ssms]

    def gather(field):
        arrs = [getattr(s, field) for s in ssms]
        return jnp.concatenate(
            [a[sl] for a, sl in zip(arrs, subs)] + [a[sl] for a, sl in zip(arrs, mods)],
            axis=0,
        )

    return BlockSSM(
        F=gather("F"), LQcLT=gather("LQcLT"), H=gather("H"), Pinf=gather("Pinf"),
        A=gather("A"), Q=gather("Q"), pad_eye=gather("pad_eye"),
        D=sum(s.D for s in ssms), N=sum(s.N for s in ssms),
    )


# ---------------------------------------------------------------------------
# Dense materialization (tests / parity checks only)
# ---------------------------------------------------------------------------


def dense(ssm: BlockSSM):
    """Materialize the dense joint (F, H, Pinf, A, Q), dropping padded dims.

    Only for small-model tests against the reference's blkdiag construction.
    """
    import numpy as np

    blocks_F, blocks_A, blocks_Q, blocks_P, rows_H = [], [], [], [], []
    Fh = np.asarray(jax.device_get(ssm.F))
    Ah = np.asarray(jax.device_get(ssm.A))
    Qh = np.asarray(jax.device_get(ssm.Q))
    Ph = np.asarray(jax.device_get(ssm.Pinf))
    Hh = np.asarray(jax.device_get(ssm.H))
    C = Fh.shape[0]
    sizes = []
    for c in range(C):
        nz = np.where(
            (np.abs(Fh[c]).sum(0) + np.abs(Fh[c]).sum(1) + np.abs(Ph[c]).sum(0)) > 0
        )[0]
        t = (nz.max() + 1) if nz.size else 1
        sizes.append(int(t))
        blocks_F.append(Fh[c][:t, :t])
        blocks_A.append(Ah[c][:t, :t])
        blocks_Q.append(Qh[c][:t, :t])
        blocks_P.append(Ph[c][:t, :t])
        rows_H.append(Hh[c][:t])
    m = sum(sizes)
    Fd = np.zeros((m, m)); Ad = np.zeros((m, m)); Qd = np.zeros((m, m))
    Pd = np.zeros((m, m)); Hd = np.zeros((C, m))
    off = 0
    for c in range(C):
        t = sizes[c]
        Fd[off : off + t, off : off + t] = blocks_F[c]
        Ad[off : off + t, off : off + t] = blocks_A[c]
        Qd[off : off + t, off : off + t] = blocks_Q[c]
        Pd[off : off + t, off : off + t] = blocks_P[c]
        Hd[c, off : off + t] = rows_H[c]
        off += t
    return Fd, Hd, Pd, Ad, Qd
