"""Block SSM assembly vs the reference's dense blkdiag/kron construction."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.scipy.linalg import expm as jexpm
from scipy.linalg import expm

from nsgp_tpu.ops import kernels as K
from nsgp_tpu.ops import ssm as S


def dense_reference_model(sub_var, sub_len, omega, mod_var, mod_len, k1, k2):
    """Literal dense construction following ss_modulators_nmf.m:49-133."""
    D, N = len(sub_var), len(mod_var)
    F1s, P1s, Qc1s, H1s = [], [], [], []
    for d in range(D):
        ss = K.get_kernel(k1)(float(sub_var[d]), float(sub_len[d]), dtype=jnp.float64)
        F1s.append(np.asarray(ss.F))
        P1s.append(np.asarray(ss.Pinf))
        Qc1s.append(np.asarray(ss.Qc))
        H1s.append(np.asarray(ss.H))
    tau1 = F1s[0].shape[0]
    I2 = np.eye(2)
    blocks_F, blocks_P, rows_H = [], [], []
    for d in range(D):
        rot = np.array([[0.0, -omega[d]], [omega[d], 0.0]])
        Fd = np.kron(F1s[d], I2) + np.kron(np.eye(tau1), rot)
        blocks_F.append(Fd)
        blocks_P.append(np.kron(P1s[d], I2))
        rows_H.append(np.kron(H1s[d][0], np.array([1.0, 0.0])))
    for n in range(N):
        ss = K.get_kernel(k2)(float(mod_var[n]), float(mod_len[n]), dtype=jnp.float64)
        blocks_F.append(np.asarray(ss.F))
        blocks_P.append(np.asarray(ss.Pinf))
        rows_H.append(np.asarray(ss.H)[0])
    m = sum(b.shape[0] for b in blocks_F)
    Fd = np.zeros((m, m))
    Pd = np.zeros((m, m))
    Hd = np.zeros((D + N, m))
    off = 0
    for c, (bF, bP, rH) in enumerate(zip(blocks_F, blocks_P, rows_H)):
        t = bF.shape[0]
        Fd[off : off + t, off : off + t] = bF
        Pd[off : off + t, off : off + t] = bP
        Hd[c, off : off + t] = rH
        off += t
    Ad = expm(Fd)
    Qd = Pd - Ad @ Pd @ Ad.T
    return Fd, Hd, Pd, Ad, Qd


@pytest.mark.parametrize("k1,k2", [("matern32", "matern52"), ("exp", "matern32")])
def test_block_assembly_matches_dense(k1, k2):
    rng = np.random.default_rng(1)
    D, N = 4, 2
    sub_var = 0.01 * np.ones(D)
    sub_len = 150 + 400 * rng.random(D)
    omega = np.linspace(np.pi / 3, np.pi / 50, D)
    mod_var = 5 + 5 * rng.random(N)
    mod_len = np.linspace(200, 1500, N)

    ssm = S.build_modulator_ssm(
        jnp.asarray(sub_var), jnp.asarray(sub_len), jnp.asarray(omega),
        jnp.asarray(mod_var), jnp.asarray(mod_len), kernel1=k1, kernel2=k2,
    )
    Fd, Hd, Pd, Ad, Qd = S.dense(ssm)
    Fr, Hr, Pr, Ar, Qr = dense_reference_model(
        sub_var, sub_len, omega, mod_var, mod_len, k1, k2
    )
    np.testing.assert_allclose(Fd, Fr, atol=1e-10)
    np.testing.assert_allclose(Hd, Hr, atol=1e-12)
    np.testing.assert_allclose(Pd, Pr, atol=1e-10)
    np.testing.assert_allclose(Ad, Ar, atol=1e-10)
    np.testing.assert_allclose(Qd, Qr, atol=1e-9)


def test_discretization_methods_agree():
    ssm = S.build_modulator_ssm(
        jnp.asarray([0.5]), jnp.asarray([30.0]), jnp.asarray([0.3]),
        jnp.asarray([2.0]), jnp.asarray([200.0]),
    )
    ssm2 = S.build_modulator_ssm(
        jnp.asarray([0.5]), jnp.asarray([30.0]), jnp.asarray([0.3]),
        jnp.asarray([2.0]), jnp.asarray([200.0]),
        discretization="matrix_fraction",
    )
    np.testing.assert_allclose(np.asarray(ssm.A), np.asarray(ssm2.A), atol=1e-10)
    np.testing.assert_allclose(np.asarray(ssm.Q), np.asarray(ssm2.Q), atol=1e-8)


def test_subband_transition_is_damped_rotation():
    """A_subband = expm(F1) (x) R(omega): check the expected structure."""
    om = 0.21
    ss = S.build_modulator_ssm(
        jnp.asarray([1.0]), jnp.asarray([50.0]), jnp.asarray([om]),
        jnp.asarray([1.0]), jnp.asarray([100.0]), kernel1="exp",
    )
    A0 = np.asarray(ss.A[0])[:2, :2]
    lam = np.exp(-1.0 / 50.0)
    R = lam * np.array([[np.cos(om), -np.sin(om)], [np.sin(om), np.cos(om)]])
    np.testing.assert_allclose(A0, R, atol=1e-12)


def test_concat_ssms_source_sep_stacking():
    mk = lambda d, n: S.build_modulator_ssm(
        jnp.ones(d) * 0.1, jnp.ones(d) * 100.0, jnp.linspace(0.1, 0.5, d),
        jnp.ones(n), jnp.ones(n) * 300.0,
    )
    a, b = mk(3, 2), mk(2, 1)
    j = S.concat_ssms([a, b])
    assert j.D == 5 and j.N == 3 and j.num_channels == 8
    # subbands first (a's then b's), then modulators
    np.testing.assert_allclose(np.asarray(j.A[:3]), np.asarray(a.A[:3]))
    np.testing.assert_allclose(np.asarray(j.A[3:5]), np.asarray(b.A[:2]))
    np.testing.assert_allclose(np.asarray(j.A[5:7]), np.asarray(a.A[3:]))
    np.testing.assert_allclose(np.asarray(j.A[7:]), np.asarray(b.A[2:]))
