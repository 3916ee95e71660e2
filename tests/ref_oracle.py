"""Line-faithful numpy oracle of the reference MATLAB inference path.

PARITY ORACLE (VERDICT round-2 item 1): Octave is unavailable in this
environment, so this module is a hand-port of the reference implementation's
inference path to numpy, kept deliberately close to the MATLAB control flow
(dense joint state, double loops, the exact branch structure) so that the
TPU-native JAX engines can be tested for posterior parity against the
*reference algorithm itself* rather than against a self-generated golden.

It is a TEST ORACLE, not part of the framework: slow on purpose, f64-only,
single-threaded, no JAX.  Every function cites the reference file:line it
mirrors.  Reviewers should diff this module against the cited MATLAB sources.

Ported files:
  - matlab/unifying_prob_tf/cf_exp_to_ss.m:92-146
  - matlab/unifying_prob_tf/cf_matern32_to_ss.m:92-126
  - matlab/unifying_prob_tf/cf_matern52_to_ss.m:95-123
  - matlab/unifying_prob_tf/lti_disc.m:60-82
  - matlab/ss_modulators_nmf.m (F/L/Qc/H/Pinf path only; derivative outputs
    are not used by inference and are omitted)
  - matlab/ss_modulators.m (identical structure with N == D)
  - matlab/symmetric-cubature-rules/{sym_set,ut7_ws,ut9_ws,utp_ws}.m
  - matlab/likModulatorPower.m:22-100, matlab/likModulatorNMFPower.m:25-87
  - matlab/gf_ep_modulator_nmf.m (prediction mode :92-352, energy mode
    :355-533); gf_ep_modulator.m differs only in the likelihood call and the
    unconditional first prediction step (a no-op at the stationary init).

Known reference quirk preserved: ut9_ws.m:78-79 contains a double negative
(`- -8*ndownk(n,3)*(A111+A222)`) that flips the sign of that A0 term.  The
term is ndownk(n,3)-weighted and therefore VANISHES for n <= 2 — both toy
parity configs use N = 2 modulators, so the quirk is inert there.  The port
keeps the reference behavior behind ``ut9_ref_bug=True`` (default) and can
produce the corrected rule with ``ut9_ref_bug=False``.
"""

from __future__ import annotations

import math

import numpy as np
from scipy.linalg import cho_factor, cho_solve, cholesky, expm

# ---------------------------------------------------------------------------
# Kernel -> state space conversions
# ---------------------------------------------------------------------------


def cf_exp_to_ss(magnSigma2, lengthScale):
    """OU kernel. Ref cf_exp_to_ss.m:92-146."""
    F = np.array([[-1.0 / lengthScale]])
    L = np.array([[1.0]])
    Qc = np.array([[2.0 * magnSigma2 / lengthScale]])
    H = np.array([[1.0]])
    Pinf = np.array([[magnSigma2]])
    return F, L, Qc, H, Pinf


def cf_matern32_to_ss(magnSigma2, lengthScale):
    """Matern 3/2. Ref cf_matern32_to_ss.m:92-126."""
    lam = math.sqrt(3.0) / lengthScale
    F = np.array([[0.0, 1.0], [-lam**2, -2.0 * lam]])
    L = np.array([[0.0], [1.0]])
    Qc = np.array([[12.0 * math.sqrt(3.0) / lengthScale**3 * magnSigma2]])
    H = np.array([[1.0, 0.0]])
    Pinf = np.array(
        [[magnSigma2, 0.0], [0.0, 3.0 * magnSigma2 / lengthScale**2]]
    )
    return F, L, Qc, H, Pinf


def cf_matern52_to_ss(magnSigma2, lengthScale):
    """Matern 5/2. Ref cf_matern52_to_ss.m:95-123."""
    lam = math.sqrt(5.0) / lengthScale
    F = np.array(
        [
            [0.0, 1.0, 0.0],
            [0.0, 0.0, 1.0],
            [-lam**3, -3.0 * lam**2, -3.0 * lam],
        ]
    )
    L = np.array([[0.0], [0.0], [1.0]])
    Qc = np.array([[magnSigma2 * 400.0 * math.sqrt(5.0) / 3.0 / lengthScale**5]])
    H = np.array([[1.0, 0.0, 0.0]])
    kappa = 5.0 / 3.0 * magnSigma2 / lengthScale**2
    Pinf = np.array(
        [
            [magnSigma2, 0.0, -kappa],
            [0.0, kappa, 0.0],
            [-kappa, 0.0, 25.0 * magnSigma2 / lengthScale**4],
        ]
    )
    return F, L, Qc, H, Pinf


_KERNELS = {
    "exp": cf_exp_to_ss,
    "matern32": cf_matern32_to_ss,
    "matern52": cf_matern52_to_ss,
}


def _blkdiag(*mats):
    mats = [np.atleast_2d(np.asarray(m, float)) for m in mats if np.size(m)]
    if not mats:
        return np.zeros((0, 0))
    r = sum(m.shape[0] for m in mats)
    c = sum(m.shape[1] for m in mats)
    out = np.zeros((r, c))
    i = j = 0
    for m in mats:
        out[i : i + m.shape[0], j : j + m.shape[1]] = m
        i += m.shape[0]
        j += m.shape[1]
    return out


def ss_modulators_nmf(w_subband, w_modulator, kernel1, kernel2):
    """Joint dense SDE for D subbands (kernel1 x cosine) + N modulators.

    Ref ss_modulators_nmf.m:1-137 (F/L/Qc/H/Pinf path; the dF/dQc/dPinf
    outputs are unused by inference and omitted).  ss_modulators.m:1-134 is
    the same construction with N == D, so this function covers both.
    """
    w_subband = np.asarray(w_subband, float).ravel()
    w_modulator = np.asarray(w_modulator, float).ravel()
    D = len(w_subband) // 3
    N = len(w_modulator) // 2
    sig1, len1, omega = w_subband[:D], w_subband[D : 2 * D], w_subband[2 * D :]
    sig2, len2 = w_modulator[:N], w_modulator[N:]
    cf1 = _KERNELS[kernel1]
    cf2 = _KERNELS[kernel2]
    tau1 = cf1(1.0, 1.0)[0].shape[0]
    tau2 = 2  # cosine kernel: real + imaginary (ss_modulators_nmf.m:17)

    # periodic subband (ss_modulators_nmf.m:23-78)
    F1 = np.zeros((0, 0))
    L1 = np.zeros((0, 1))
    Qc1 = np.zeros((0, 0))
    H1 = np.zeros((0, 0))
    Pinf1 = np.zeros((0, 0))
    for d in range(D):
        F1d, L1d, Qc1d, H1d, Pinf1d = cf1(sig1[d], len1[d])
        F1 = _blkdiag(F1, F1d)
        L1 = np.vstack([L1, L1d])  # vertcat (ss_modulators_nmf.m:35)
        Qc1 = _blkdiag(Qc1, Qc1d)
        H1 = _blkdiag(H1, H1d)
        Pinf1 = _blkdiag(Pinf1, Pinf1d)

    # cosine product (ss_modulators_nmf.m:50-78)
    F_cos_kron = np.zeros((0, 0))
    L_sm = np.zeros((0, 0))
    Qc_sm = np.zeros((0, 0))
    I2 = np.eye(tau2)
    for d in range(D):
        F_cos_d = np.array([[0.0, -omega[d]], [omega[d], 0.0]])
        F_cos_kron = _blkdiag(F_cos_kron, np.kron(np.eye(tau1), F_cos_d))
        L1_d = L1[d * tau1 : (d + 1) * tau1]  # (tau1, 1)
        L_sm = _blkdiag(L_sm, np.kron(L1_d, I2))
        Qc_sm = _blkdiag(Qc_sm, np.kron(Qc1[d : d + 1, d : d + 1], I2))
    F_sm = np.kron(F1, I2) + F_cos_kron
    H_sm = np.kron(H1, np.array([[1.0, 0.0]]))
    Pinf_sm = np.kron(Pinf1, I2)

    # slow-varying modulators (ss_modulators_nmf.m:93-118)
    F2 = np.zeros((0, 0))
    L2 = np.zeros((0, 0))
    Qc2 = np.zeros((0, 0))
    H2 = np.zeros((0, 0))
    Pinf2 = np.zeros((0, 0))
    for n in range(N):
        F2d, L2d, Qc2d, H2d, Pinf2d = cf2(sig2[n], len2[n])
        F2 = _blkdiag(F2, F2d)
        L2 = _blkdiag(L2, L2d)
        Qc2 = _blkdiag(Qc2, Qc2d)
        H2 = _blkdiag(H2, H2d)
        Pinf2 = _blkdiag(Pinf2, Pinf2d)

    # combine (ss_modulators_nmf.m:126-132)
    F = _blkdiag(F_sm, F2)
    L = _blkdiag(L_sm, L2)
    Qc = _blkdiag(Qc_sm, Qc2)
    H = _blkdiag(H_sm, H2)
    Pinf = _blkdiag(Pinf_sm, Pinf2)
    return F, L, Qc, H, Pinf


def lti_disc(F, L, Qc, dt=1.0):
    """Matrix-fraction LTI discretization. Ref lti_disc.m:60-82."""
    F = np.asarray(F, float)
    n = F.shape[0]
    A = expm(F * dt)
    Phi = np.block([[F, L @ Qc @ L.T], [np.zeros((n, n)), -F.T]])
    AB = expm(Phi * dt) @ np.vstack([np.zeros((n, n)), np.eye(n)])
    Q = AB[:n] @ np.linalg.inv(AB[n:])
    return A, Q


# ---------------------------------------------------------------------------
# Symmetric cubature (McNamee-Stenger)
# ---------------------------------------------------------------------------


def sym_set(n, gen):
    """Fully-symmetric point set. Ref sym_set.m:1-40 (recursive port)."""
    if len(gen) == 0:
        return np.zeros((n, 1))
    cols = []
    for i in range(1, n + 1):
        u = np.zeros(n)
        u[i - 1] = gen[0]
        if len(gen) > 1:
            if abs(gen[0] - gen[1]) < np.finfo(float).eps:
                V = sym_set(n - i, gen[1:])
                for j in range(V.shape[1]):
                    uu = u.copy()
                    uu[i:] = V[:, j]
                    cols.append(uu)
                    cols.append(-uu)
            else:
                V = sym_set(n - 1, gen[1:])
                for j in range(V.shape[1]):
                    uu = u.copy()
                    uu[np.arange(n) != i - 1] = V[:, j]
                    cols.append(uu)
                    cols.append(-uu)
        else:
            cols.append(u.copy())
            cols.append(-u)
    return np.array(cols).T if cols else np.zeros((n, 0))


def _ndownk(n, k):
    return math.prod(range(n - k + 1, n + 1)) / math.factorial(k)


def ut7_ws(n):
    """7th-order rule. Ref ut7_ws.m:1-50."""
    I222, I22, I24, I2, I6, I4, I0 = 1.0, 1.0, 3.0, 1.0, 15.0, 3.0, 1.0
    r = np.roots([I2**2 - I0 * I4, 0.0, -(I2 * I4 - I0 * I6), 0.0, I4**2 - I2 * I6])
    r = np.real(r[np.real(r) > 0])
    u, v = r[0], r[1]
    u2, u4, u6 = u * u, u**4, u**6
    v2, v4, v6 = v * v, v**4, v**6
    A111 = I222 / 8.0 / u6
    M = np.array([[u4, v4], [u6, v6]])
    b = np.array([I22, I24]) - 8.0 * (n - 2) * np.array([u4, u6]) * A111
    A11, A22 = 0.25 * np.linalg.solve(M, b)
    M2 = np.array([[u2, v2], [u4, v4]])
    b2 = np.array([I2, I4]) - 8.0 * (n - 1) * (n - 2) / 2.0 * np.array([u2, u4]) * A111
    t = -2.0 * (n - 1) * np.array([A11, A22]) + 0.5 * np.linalg.solve(M2, b2)
    A1, A2 = t
    A0 = (
        I0
        - 2 * n * (A1 + A2)
        - 4 * n * (n - 1) / 2 * (A11 + A22)
        - 8 * n * (n - 1) * (n - 2) / 6 * A111
    )
    sets = [
        (A0, sym_set(n, [])),
        (A1, sym_set(n, [u])),
        (A2, sym_set(n, [v])),
        (A11, sym_set(n, [u, u])),
        (A22, sym_set(n, [v, v])),
        (A111, sym_set(n, [u, u, u])),
    ]
    SX = np.hstack([s for _, s in sets])
    W = np.concatenate([np.full(s.shape[1], a) for a, s in sets])
    return W, SX


def ut9_ws(n, ref_bug=True):
    """9th-order rule. Ref ut9_ws.m:1-102.

    ``ref_bug=True`` keeps the reference's double-negative on the
    8*ndownk(n,3) term of A0 (ut9_ws.m:78-79); the term is zero for n <= 2.
    """
    I2222, I224, I222, I44, I26, I24, I22 = 1.0, 3.0, 1.0, 9.0, 15.0, 3.0, 1.0
    I8, I6, I4, I2, I0 = 105.0, 15.0, 3.0, 1.0, 1.0
    r = np.roots(
        [I4**2 - I2 * I6, 0.0, -(I4 * I6 - I2 * I8), 0.0, I6**2 - I4 * I8]
    )
    r = np.real(r[np.real(r) > 0])
    u, v = r[0], r[1]
    u2, u4, u6, u8 = u * u, u**4, u**6, u**8
    v2, v4, v6, v8 = v * v, v**4, v**6, v**8

    A1111 = I2222 / 16.0 / u8
    M = np.array([[u6, v6], [u8, v8]])
    A111, A222 = (1.0 / 8.0) * np.linalg.solve(
        M, np.array([I222, I224]) - 16.0 * (n - 3) * A1111 * np.array([u6, u8])
    )
    A12 = (I26 - I44) / (4.0 * u2 * v2 * (u2 - v2) ** 2)
    t = -2.0 * (n - 2) * np.array([A111, A222]) + 0.25 * np.linalg.solve(
        M,
        np.array([I24, I26])
        - 4.0 * np.array([u4 * v2 + u2 * v4, u6 * v2 + u2 * v6]) * A12
        - 16.0 * _ndownk(n - 2, 2) * np.array([u6, u8]) * A1111,
    )
    A11, A22 = t
    M2 = np.array([[u2, v2], [u4, v4]])
    t = (
        -2.0 * (n - 1) * np.array([A11 + A12, A22 + A12])
        - 4.0 * _ndownk(n - 1, 2) * np.array([A111, A222])
        + 0.5
        * np.linalg.solve(
            M2,
            np.array([I2, I4]) - 16.0 * _ndownk(n - 1, 3) * np.array([u2, u4]) * A1111,
        )
    )
    A1, A2 = t
    third_sign = +1.0 if ref_bug else -1.0  # ref: `- -8*...` == +8*...
    A0 = (
        I0
        - 2 * n * (A1 + A2)
        - 4 * _ndownk(n, 2) * (A11 + 2 * A12 + A22)
        + third_sign * 8 * _ndownk(n, 3) * (A111 + A222)
        - 16 * _ndownk(n, 4) * A1111
    )
    sets = [
        (A0, sym_set(n, [])),
        (A1, sym_set(n, [u])),
        (A2, sym_set(n, [v])),
        (A11, sym_set(n, [u, u])),
        (A12, sym_set(n, [u, v])),
        (A22, sym_set(n, [v, v])),
        (A111, sym_set(n, [u, u, u])),
        (A222, sym_set(n, [v, v, v])),
        (A1111, sym_set(n, [u, u, u, u])),
    ]
    sets = [(a, s) for a, s in sets if s.shape[1] > 0]
    SX = np.hstack([s for _, s in sets])
    W = np.concatenate([np.full(s.shape[1], a) for a, s in sets])
    return W, SX


def utp_ws(p, n, ut9_ref_bug=True):
    """Cubature dispatch. Ref utp_ws.m:1-15 (p in {7, 9} used by the demos)."""
    if p == 7:
        return ut7_ws(n)
    if p == 9:
        return ut9_ws(n, ref_bug=ut9_ref_bug)
    raise NotImplementedError("parity configs use p in {7, 9}")


# ---------------------------------------------------------------------------
# Likelihood moment functions
# ---------------------------------------------------------------------------


def _softplus(x):
    return np.logaddexp(0.0, x)


def _normpdf(y, m, s):
    return np.exp(-0.5 * ((y - m) / s) ** 2) / (np.sqrt(2.0 * np.pi) * s)


def lik_modulator_nmf_power(sn2, y, mu, s2, W, p, ep_fraction, link=_softplus,
                            ut9_ref_bug=True):
    """lZ, dlZ, d2lZ for the NMF modulator likelihood.

    Ref likModulatorNMFPower.m:25-87 ('infEP' branch).  mu/s2 are the
    (D+N,) cavity moments, W is (D, N).
    """
    jitter = 1e-10  # likModulatorNMFPower.m:28
    D, N = W.shape
    mu_z, mu_g = mu[:D], mu[D:]
    s2_z, s2_g = s2[:D], s2[D:]
    wn, xn_unscaled = utp_ws(p, N, ut9_ref_bug)  # (S,), (N, S)
    xn = (mu_g[:, None] + np.sqrt(s2_g)[:, None] * xn_unscaled).T  # (S, N)

    link_xn_W = link(xn) @ W.T  # (S, D)
    sn2_link = sn2 / ep_fraction + link_xn_W**2 @ s2_z  # (S,)
    link_xn_mu_z = link_xn_W @ mu_z  # (S,)
    xn_mu_g_s2_g = (xn - mu_g) / s2_g  # (S, N)

    normy_xn = _normpdf(y, link_xn_mu_z, np.sqrt(sn2_link))  # (S,)
    Z = max(float(wn @ normy_xn), jitter)
    Zinv = 1.0 / Z
    lZ = math.log(Z)

    dlZ = np.empty(D + N)
    d2lZ = np.empty(D + N)
    d1 = link_xn_W * ((y - link_xn_mu_z) / sn2_link * normy_xn)[:, None]
    dlZ[:D] = Zinv * (wn @ d1)
    d2 = xn_mu_g_s2_g * normy_xn[:, None]
    dlZ[D:] = Zinv * (wn @ d2)
    dd1 = (
        link_xn_W**2
        * (((y - link_xn_mu_z) / sn2_link) ** 2 - 1.0 / sn2_link)[:, None]
        * normy_xn[:, None]
    )
    d2lZ[:D] = -dlZ[:D] ** 2 + Zinv * (wn @ dd1)
    dd2 = (xn_mu_g_s2_g**2 - 1.0 / s2_g) * normy_xn[:, None]
    d2lZ[D:] = -dlZ[D:] ** 2 + Zinv * (wn @ dd2)
    return lZ, dlZ, d2lZ


def lik_modulator_power(sn2, y, mu, s2, p, ep_fraction, link=_softplus,
                        ut9_ref_bug=True):
    """Per-subband modulator likelihood (W = I implied).

    Ref likModulatorPower.m:22-100.  Differs from the NMF version only in
    link(xn) replacing link(xn) @ W' and the jitter floor (1e-8 vs 1e-10).
    """
    jitter = 1e-8  # likModulatorPower.m:25
    D = len(mu) // 2
    mu_z, mu_g = mu[:D], mu[D:]
    s2_z, s2_g = s2[:D], s2[D:]
    wn, xn_unscaled = utp_ws(p, D, ut9_ref_bug)
    xn = (mu_g[:, None] + np.sqrt(s2_g)[:, None] * xn_unscaled).T  # (S, D)

    link_xn = link(xn)  # (S, D)
    sn2_link = sn2 / ep_fraction + link_xn**2 @ s2_z
    link_xn_mu_z = link_xn @ mu_z
    xn_mu_g_s2_g = (xn - mu_g) / s2_g

    normy_xn = _normpdf(y, link_xn_mu_z, np.sqrt(sn2_link))
    Z = max(float(wn @ normy_xn), jitter)
    Zinv = 1.0 / Z
    lZ = math.log(Z)

    dlZ = np.empty(2 * D)
    d2lZ = np.empty(2 * D)
    d1 = link_xn * ((y - link_xn_mu_z) / sn2_link * normy_xn)[:, None]
    dlZ[:D] = Zinv * (wn @ d1)
    d2 = xn_mu_g_s2_g * normy_xn[:, None]
    dlZ[D:] = Zinv * (wn @ d2)
    dd1 = (
        link_xn**2
        * (((y - link_xn_mu_z) / sn2_link) ** 2 - 1.0 / sn2_link)[:, None]
        * normy_xn[:, None]
    )
    d2lZ[:D] = -dlZ[:D] ** 2 + Zinv * (wn @ dd1)
    dd2 = (xn_mu_g_s2_g**2 - 1.0 / s2_g) * normy_xn[:, None]
    d2lZ[D:] = -dlZ[D:] ** 2 + Zinv * (wn @ dd2)
    return lZ, dlZ, d2lZ


# ---------------------------------------------------------------------------
# Power-EP engine (gf_ep_modulator_nmf.m)
# ---------------------------------------------------------------------------


def _chol_lower_jittered(M, rng):
    """chol with the reference's random-jitter retry.

    Ref gf_ep_modulator_nmf.m:216-223.  Returns (L, retried).
    """
    try:
        return cholesky(M, lower=True), False
    except np.linalg.LinAlgError:
        pass
    jitter = math.sqrt(1e-4) * np.diag(rng.random(M.shape[0]))
    return cholesky(M + jitter, lower=True), True


def gf_ep_modulator_nmf_predict(
    ssm, mom, y, C, ep_fraction, ep_damping, ep_itts, seed=0
):
    """Prediction mode of the Power-EP engine.

    Ref gf_ep_modulator_nmf.m:92-352 with xt == x (the demos' call).  ``ssm``
    is the (F, L, Qc, H, Pinf) tuple from ss_modulators_nmf; ``mom`` is a
    closure (mu, s2, frac, k) -> (lZ, dlZ, d2lZ); C = D + N observable dims.

    Returns dict with Eft/Varft (T, C), nlZ (ep_itts,), lZ (T,), sites, and
    the jittered-Cholesky retry count (expected 0 at toy scale).
    """
    F, L_mat, Qc, H, Pinf = ssm
    y = np.asarray(y, float).ravel()
    T = len(y)
    d = F.shape[0]
    rng = np.random.default_rng(seed)

    MS = np.zeros((d, T))
    PS = np.zeros((d, d, T))
    ttau = np.zeros((C, T))
    tnu = np.zeros((C, T))
    lZ = np.zeros(T)
    nlZ = np.zeros(ep_itts)
    n_jitter = 0

    A, Q = lti_disc(F, L_mat, Qc, 1.0)
    ep_damp = ep_damping[0]

    for itt in range(1, ep_itts + 1):
        m = np.zeros(d)
        P = Pinf.copy()

        # ### Forward filter (ref :126-184)
        for k in range(T):
            if k > 0:
                m = A @ m
                P = A @ P @ A.T + Q
            if not np.isnan(y[k]):
                fmu = H @ m
                Wm = P @ H.T  # (d, C)
                HPH = np.diag(H @ P @ H.T).copy()

                if itt == 1 or k == T - 1:  # ref :141
                    lZ[k], dlZ, d2lZ = mom(fmu, HPH, 1.0, k)
                    ttau[:, k] = (1 - ep_damp) * ttau[:, k] + ep_damp * (
                        -d2lZ / (1 + d2lZ * HPH)
                    )
                    tnu[:, k] = (1 - ep_damp) * tnu[:, k] + ep_damp * (
                        (dlZ - fmu * d2lZ) / (1 + d2lZ * HPH)
                    )
                    ttau[:, k] = np.maximum(ttau[:, k], 0.0)

                ii = ttau[:, k] == 0.0  # ref :159
                if ii.any():
                    z = ttau[ii, k] * HPH[ii] + 1.0
                    K = Wm[:, ii] * (ttau[ii, k] / z)
                    v = ttau[ii, k] * fmu[ii] - tnu[ii, k]
                    m = m - Wm[:, ii] @ (v / z)
                    P = P - K @ Wm[:, ii].T
                if (~ii).any():
                    K = Wm[:, ~ii] / (HPH[~ii] + 1.0 / ttau[~ii, k])
                    v = tnu[~ii, k] / ttau[~ii, k] - fmu[~ii]
                    m = m + K @ v
                    P = P - K @ H[~ii, :] @ P
            MS[:, k] = m
            PS[:, :, k] = P

        if itt == 1:
            nlZ[0] = -lZ.sum()

        # ### Backward smoother + EP (ref :200-274)
        if itt < ep_itts:
            ep_damp = ep_damping[itt]  # ref :202-204 (MATLAB itt+1)
        for k in range(T - 2, -1, -1):
            PSk = PS[:, :, k]
            PSkp = A @ PSk @ A.T + Q
            Lc, retried = _chol_lower_jittered(PSkp, rng)
            n_jitter += retried
            # G = PSk*A'/L'/L  (ref :226)
            G = cho_solve((Lc, True), (PSk @ A.T).T).T
            m = MS[:, k] + G @ (m - A @ MS[:, k])
            P = PSk + G @ (P - PSkp) @ G.T
            MS[:, k] = m
            PS[:, :, k] = P

            if itt < ep_itts and not np.isnan(y[k]):
                m_marg = H @ m
                v_marg = np.diag(H @ P @ H.T).copy()
                v_cav = 1.0 / (1.0 / v_marg - ep_fraction * ttau[:, k])
                m_cav = v_cav * (m_marg / v_marg - ep_fraction * tnu[:, k])
                upd = v_cav > 0
                lZ[k], dlZ, d2lZ = mom(m_cav, v_cav, ep_fraction, k)
                den = 1 + d2lZ * v_cav
                ttau_new = (1 - ep_damp * ep_fraction) * ttau[:, k] + ep_damp * (
                    -d2lZ / den
                )
                tnu_new = (1 - ep_damp * ep_fraction) * tnu[:, k] + ep_damp * (
                    (dlZ - m_cav * d2lZ) / den
                )
                ttau[upd, k] = ttau_new[upd]
                tnu[upd, k] = tnu_new[upd]
                ttau[:, k] = np.maximum(ttau[:, k], 0.0)

        if itt < ep_itts:
            nlZ[itt] = -lZ.sum()

    Eft = (H @ MS).T  # (T, C)
    Varft = np.stack([np.diag(H @ PS[:, :, k] @ H.T) for k in range(T)])
    return {
        "Eft": Eft,
        "Varft": Varft,
        "nlZ": nlZ,
        "lZ": lZ.copy(),
        "ttau": ttau.T,
        "tnu": tnu.T,
        "n_jitter": n_jitter,
    }


def gf_ep_modulator_nmf_energy(
    ssm, mom, y, C, ep_fraction, ep_damping, ep_itts, seed=0
):
    """Energy mode (xt == []): nlml = -sum lZ.

    Ref gf_ep_modulator_nmf.m:355-533.  Note the reference's gating: the
    forward pass runs iff itt == 1 or itt < ep_itts, the backward iff
    itt < ep_itts — the final iteration of a multi-sweep run is a no-op.
    """
    F, L_mat, Qc, H, Pinf = ssm
    y = np.asarray(y, float).ravel()
    T = len(y)
    d = F.shape[0]
    rng = np.random.default_rng(seed)

    ttau = np.zeros((C, T))
    tnu = np.zeros((C, T))
    lZ = np.zeros(T)
    MS = np.zeros((d, T))
    PS = np.zeros((d, d, T)) if ep_itts > 1 else None

    A, Q = lti_disc(F, L_mat, Qc, 1.0)
    ep_damp = ep_damping[0]

    for itt in range(1, ep_itts + 1):
        m = np.zeros(d)
        P = Pinf.copy()
        if itt == 1 or itt < ep_itts:  # ref :396
            for k in range(T):
                if k > 0:
                    m = A @ m
                    P = A @ P @ A.T + Q
                if not np.isnan(y[k]):
                    fmu = H @ m
                    Wm = P @ H.T
                    fs2 = np.diag(H @ P @ H.T).copy()
                    if itt == 1 or k == T - 1:  # ref :413
                        lZ[k], dlZ, d2lZ = mom(fmu, fs2, 1.0, k)
                        ttau[:, k] = (1 - ep_damp) * ttau[:, k] + ep_damp * (
                            -d2lZ / (1 + d2lZ * fs2)
                        )
                        tnu[:, k] = (1 - ep_damp) * tnu[:, k] + ep_damp * (
                            (dlZ - fmu * d2lZ) / (1 + d2lZ * fs2)
                        )
                    ttau[:, k] = np.maximum(ttau[:, k], 0.0)
                    if ttau[:, k].min() == 0.0:  # ref :428 (all-channel split)
                        z = ttau[:, k] * fs2 + 1.0
                        K = Wm * (ttau[:, k] / z)
                        v = ttau[:, k] * fmu - tnu[:, k]
                        m = m - Wm @ (v / z)
                        P = P - K @ Wm.T
                    else:
                        K = Wm / (fs2 + 1.0 / ttau[:, k])
                        v = tnu[:, k] / ttau[:, k] - fmu
                        m = m + K @ v
                        P = P - K @ H @ P
                if itt < ep_itts:
                    MS[:, k] = m
                    PS[:, :, k] = P

        if itt < ep_itts:
            ep_damp = ep_damping[itt]
            for k in range(T - 2, -1, -1):
                PSk = PS[:, :, k]
                PSkp = A @ PSk @ A.T + Q
                Lc, _ = _chol_lower_jittered(PSkp, rng)
                G = cho_solve((Lc, True), (PSk @ A.T).T).T
                m = MS[:, k] + G @ (m - A @ MS[:, k])
                P = PSk + G @ (P - PSkp) @ G.T
                MS[:, k] = m
                PS[:, :, k] = P
                if not np.isnan(y[k]):
                    m_marg = H @ m
                    v_marg = np.diag(H @ P @ H.T).copy()
                    v_cav = 1.0 / (1.0 / v_marg - ep_fraction * ttau[:, k])
                    m_cav = v_cav * (m_marg / v_marg - ep_fraction * tnu[:, k])
                    upd = v_cav > 0
                    lZ[k], dlZ, d2lZ = mom(m_cav, v_cav, ep_fraction, k)
                    den = 1 + d2lZ * v_cav
                    ttau_new = (1 - ep_damp * ep_fraction) * ttau[:, k] + ep_damp * (
                        -d2lZ / den
                    )
                    tnu_new = (1 - ep_damp * ep_fraction) * tnu[:, k] + ep_damp * (
                        (dlZ - m_cav * d2lZ) / den
                    )
                    ttau[upd, k] = ttau_new[upd]
                    tnu[upd, k] = tnu_new[upd]

    return -lZ.sum()


# ---------------------------------------------------------------------------
# Prior sampling (demo_toy_modulators_nmf.m:40-53)
# ---------------------------------------------------------------------------


def sample_prior(ssm, W, T, rng, link=_softplus):
    """State-space prior sample + GT-NMF observation (amp variant).

    Ref demo_toy_modulators_nmf.m:43-53: z_k = A z_{k-1} + chol(Q)' r,
    y_k = (H_z z)' W link(H_g z).  Uses proper lower-Cholesky factors (the
    demo's `chol(P,'lower')'` transposes are an RNG-stream detail we do not
    reproduce — we only need a valid draw from the prior).
    """
    F, L_mat, Qc, H, Pinf = ssm
    D = W.shape[0]
    A, Q = lti_disc(F, L_mat, Qc, 1.0)
    d = F.shape[0]
    # eigh-based sqrt: Q has singular blocks (cosine dims carry no noise)
    lam, V = np.linalg.eigh(Q)
    sqQ = V @ np.diag(np.sqrt(np.maximum(lam, 0.0))) @ V.T
    lamP, VP = np.linalg.eigh(Pinf)
    sqP = VP @ np.diag(np.sqrt(np.maximum(lamP, 0.0))) @ VP.T

    z = sqP @ rng.standard_normal(d)
    ys = np.empty(T)
    f = np.empty((T, H.shape[0]))
    for k in range(T):
        if k > 0:
            z = A @ z + sqQ @ rng.standard_normal(d)
        obs = H @ z
        f[k] = obs
        ys[k] = obs[:D] @ (W @ link(obs[D:]))
    return ys, f


# ---------------------------------------------------------------------------
# Global iterated EKF engine (gf_giekf_modulator_nmf.m)
# ---------------------------------------------------------------------------


def _dsoftplus(x):
    return np.exp(x) / (np.exp(x) + 1.0)


def _funh(x, H, D, W, link=_softplus):
    """Scalar measurement h(x). Ref gf_giekf_modulator_nmf.m:444-449."""
    z = H[:D] @ x
    g = H[D:] @ x
    return z @ (W @ link(g))


def _funhd(x, H, D, W, link=_softplus, dlink=_dsoftplus):
    """dh/dx (1, m). Ref gf_giekf_modulator_nmf.m:452-459: the nonzero
    columns are the observable dims; equivalent closed form used here."""
    z = H[:D] @ x
    g = H[D:] @ x
    a = W @ link(g)  # (D,)
    dg = (z @ W) * dlink(g)  # (N,)
    return a @ H[:D] + dg @ H[D:]


def iekf_update1(m, P, y, sn2, H, D, W, iters):
    """Pseudo-iterated EKF update. Ref iekf_update1.m:110-117:
    the inner loop moves M with gain from the predicted P and innovation
    y - h(M) (no Jacobian correction term); P uses the final K, S."""
    M = m.copy()
    K = None
    S = None
    for _ in range(iters):
        JH = _funhd(M, H, D, W)
        MU = _funh(M, H, D, W)
        S = sn2 + JH @ P @ JH
        K = P @ JH / S
        M = M + K * (y - MU)
    P = P - np.outer(K, K) * S
    return M, P


def gf_giekf_modulator_nmf_predict(ssm, W, sn2, y, g_iter, l_iter, seed=0):
    """Prediction mode of the global-IEKF engine.

    Ref gf_giekf_modulator_nmf.m:106-230: global pass itt >= 2 warm-starts
    the filter from the smoothed (m, P) at k = 1 (the `if itt==1` guard on
    the init at :128-131); each step runs iekf_update1 with l_iter inner
    iterations; standard RTS smoother with jittered-Cholesky retry.
    """
    F, L_mat, Qc, H, Pinf = ssm
    y = np.asarray(y, float).ravel()
    T = len(y)
    d = F.shape[0]
    D = W.shape[0]
    rng = np.random.default_rng(seed)
    A, Q = lti_disc(F, L_mat, Qc, 1.0)

    MS = np.zeros((d, T))
    PS = np.zeros((d, d, T))
    m = np.zeros(d)
    P = Pinf.copy()
    for itt in range(1, g_iter + 1):
        # itt == 1: prior init; itt >= 2: continue from smoothed k=1 state
        for k in range(T):
            if k > 0:
                m = A @ m
                P = A @ P @ A.T + Q
            if not np.isnan(y[k]):
                m, P = iekf_update1(m, P, y[k], sn2, H, D, W, l_iter)
            MS[:, k] = m
            PS[:, :, k] = P
        for k in range(T - 2, -1, -1):
            PSk = PS[:, :, k]
            PSkp = A @ PSk @ A.T + Q
            Lc, _ = _chol_lower_jittered(PSkp, rng)
            G = cho_solve((Lc, True), (PSk @ A.T).T).T
            m = MS[:, k] + G @ (m - A @ MS[:, k])
            P = PSk + G @ (P - PSkp) @ G.T
            MS[:, k] = m
            PS[:, :, k] = P

    Eft = (H @ MS).T
    Varft = np.stack([np.diag(H @ PS[:, :, k] @ H.T) for k in range(T)])
    return {"Eft": Eft, "Varft": Varft}


def gf_giekf_modulator_nmf_energy(ssm, W, sn2, y):
    """Energy mode: single plain-EKF pass innovation NLL.

    Ref gf_giekf_modulator_nmf.m:296-439 (gradient recursion omitted —
    the JAX engine gets gradients by autodiff).  Uses the stationarity
    identity Q = Pinf - A Pinf A' exactly as the reference (:353-354) and
    predicts at every step including k = 1 (a no-op at the prior init).
    """
    F, L_mat, Qc, H, Pinf = ssm
    y = np.asarray(y, float).ravel()
    d = F.shape[0]
    D = W.shape[0]
    A = expm(F * 1.0)
    Q = Pinf - A @ Pinf @ A.T
    m = np.zeros(d)
    P = Pinf.copy()
    edata = 0.0
    for k in range(len(y)):
        m = A @ m
        P = A @ P @ A.T + Q
        if np.isnan(y[k]):
            continue
        mu = _funh(m, H, D, W)
        JH = _funhd(m, H, D, W)
        S = sn2 + JH @ P @ JH
        K = P @ JH / S
        v = y[k] - mu
        edata += 0.5 * math.log(2 * math.pi) + 0.5 * math.log(S) + 0.5 * v * v / S
        m = m + K * v
        P = P - np.outer(K, K) * S
    return edata


# ---------------------------------------------------------------------------
# Infinite-horizon EP engine (ihgp_ep_modulator_nmf.m)
# ---------------------------------------------------------------------------


def _catmull_rom_matrix(x_grid, x_query):
    """Cubic (Keys a=-0.5 / Catmull-Rom) interpolation matrix on a grid.

    Equivalent of apxGrid('interp', {ro}, r, 3) for the log-uniform DARE
    noise grid (apxGrid.m:99,187 usage in ihgp_ep_modulator_nmf.m:130-133).
    Interpolates in continuous index space of ``x_grid`` (log-uniform).
    """
    x_grid = np.asarray(x_grid, float)
    x_query = np.asarray(x_query, float)
    n = len(x_grid)
    # continuous index of each query point
    pos = np.interp(x_query, x_grid, np.arange(n))
    i0 = np.clip(np.floor(pos).astype(int), 0, n - 2)
    t = pos - i0
    Wm = np.zeros((len(x_query), n))
    for q in range(len(x_query)):
        i = i0[q]
        tt = t[q]
        w = np.array(
            [
                -0.5 * tt**3 + tt**2 - 0.5 * tt,
                1.5 * tt**3 - 2.5 * tt**2 + 1.0,
                -1.5 * tt**3 + 2.0 * tt**2 + 0.5 * tt,
                0.5 * tt**3 - 0.5 * tt**2,
            ]
        )
        idx = np.clip(np.array([i - 1, i, i + 1, i + 2]), 0, n - 1)
        for j, wi in zip(idx, w):
            Wm[q, j] += wi
    return Wm


def _ihgp_tables(ssm, ilist, n_coarse=32, n_fine=200, lo=-2.0, hi=4.0):
    """DARE bank + smoother tables per channel.

    Ref ihgp_ep_modulator_nmf.m:104-191.  Preserved quirks:
      - filtered covariance P = PP - K*ro*K' (:162; NOT the standard
        PP - K*S*K' — the noise, not the innovation variance, weights KK'),
      - QQ eigen-clipped to PSD before the smoother DARE (:177),
      - failed grid points dropped (here: replaced by nearest converged).
    Returns dict: r (fine grid), PP[n] (G, bs, bs), PS[n], Gn[n].
    """
    from scipy.linalg import solve_discrete_are, solve_discrete_lyapunov

    F, L_mat, Qc, H, Pinf = ssm
    A, Q = lti_disc(F, L_mat, Qc, 1.0)
    ro = np.logspace(lo, hi, n_coarse)
    r = np.logspace(lo, hi, n_fine)
    U = _catmull_rom_matrix(np.log10(ro), np.log10(r))
    C = H.shape[0]
    out = {"r": r, "PP": [], "PS": [], "G": []}
    for n in range(C):
        ii = slice(ilist[n], ilist[n + 1])
        Ab, Qb, hb = A[ii, ii], Q[ii, ii], H[n, ii]
        bs = Ab.shape[0]
        PPo = np.zeros((n_coarse, bs, bs))
        PSo = np.zeros((n_coarse, bs, bs))
        Go = np.zeros((n_coarse, bs, bs))
        ok = np.zeros(n_coarse, bool)
        for j, roj in enumerate(ro):
            try:
                PP = solve_discrete_are(
                    Ab.T, hb[:, None], Qb, np.array([[roj]])
                )
            except Exception:
                continue
            S = hb @ PP @ hb + roj
            K = PP @ hb / S
            P = PP - np.outer(K, K) * roj  # ref :162 quirk
            APAQ = Ab @ P @ Ab.T + Qb
            try:
                Lc = cholesky(APAQ, lower=True)
                G = cho_solve((Lc, True), (P @ Ab.T).T).T
            except np.linalg.LinAlgError:
                lam, V = np.linalg.eigh(APAQ)
                keep = lam > 0
                APAQ2 = (V[:, keep] * lam[keep]) @ V[:, keep].T
                G = P @ Ab.T @ np.linalg.pinv(APAQ2)
            QQ = P - G @ PP @ G.T
            QQ = 0.5 * (QQ + QQ.T)
            lam, V = np.linalg.eigh(QQ)
            keep = lam > 0
            QQ = (V[:, keep] * lam[keep]) @ V[:, keep].T
            try:
                PS2 = solve_discrete_lyapunov(G, QQ)
            except Exception:
                continue
            PPo[j], PSo[j], Go[j] = PP, PS2, G
            ok[j] = True
        # replace failed grid points with the nearest converged one
        good_idx = np.where(ok)[0]
        assert good_idx.size > 0, "all DAREs failed for a channel"
        for j in range(n_coarse):
            if not ok[j]:
                src = good_idx[np.argmin(np.abs(good_idx - j))]
                PPo[j], PSo[j], Go[j] = PPo[src], PSo[src], Go[src]
        out["PP"].append(np.einsum("gj,jab->gab", U, PPo))
        out["PS"].append(np.einsum("gj,jab->gab", U, PSo))
        out["G"].append(np.einsum("gj,jab->gab", U, Go))
    return out


def ihgp_ep_modulator_nmf_predict(
    ssm, mom, y, C, block_sizes, ep_fraction, ep_damping, ep_itts
):
    """Prediction mode of the infinite-horizon EP engine.

    Ref ihgp_ep_modulator_nmf.m:92-530.  Preserved behaviors:
      - lookup of the predictive PP at step k by nearest |r - R(n, k-1)| in
        LINEAR r (:235-241), R = 1/ttau, R = inf when ttau hit the zero
        bound (:285-289), PP = Pinf at k = 1 (:243-244),
      - moment match at the predicted mean H A m with the PP marginal
        (:248-254), first sweep + last step only (:251),
      - stationary recursion m = (A - K H A) m + K (tnu/ttau) per channel,
        runtime filtered covariance P = PP - K R K' (:293-302),
      - steady smoother: mean-only recursion with [PS, G] looked up at
        R(:, k) (:373-442); EP re-site at the smoothed cavity with the PS
        marginal; backward pass skips k = T,
      - missing y: MATLAB max() ignores NaN, so the NaN moment derivatives
        collapse to ttau = 0 => pure prediction; lZ gets log(Z_floor).
    Returns Eft/Varft (per-step PS lookup; the reference tiles the k = 1
    lookup, a strict subset of this), nlZ trace, sites.
    """
    F, L_mat, Qc, H, Pinf = ssm
    y = np.asarray(y, float).ravel()
    T = len(y)
    d = F.shape[0]
    A, Q = lti_disc(F, L_mat, Qc, 1.0)
    ilist = np.concatenate([[0], np.cumsum(block_sizes)]).astype(int)
    tab = _ihgp_tables(ssm, ilist)
    r = tab["r"]

    MS = np.zeros((d, T))
    ttau = np.zeros((C, T))
    tnu = np.zeros((C, T))
    R = np.full((C, T), np.inf)
    nlZ = np.zeros(ep_itts)
    Varft = np.zeros((T, C))

    ep_damp = ep_damping[0]
    m = np.zeros(d)
    for itt in range(1, ep_itts + 1):
        lZ_acc = 0.0
        # ### forward filter (ref :231-305)
        m = np.zeros(d)
        for k in range(T):
            # look-up PP by R(n, k-1); Pinf at the first step
            PP = np.zeros((d, d))
            hPh = np.zeros(C)
            if k == 0:
                PP = Pinf.copy()
            else:
                for n in range(C):
                    ii = slice(ilist[n], ilist[n + 1])
                    ind = int(np.argmin(np.abs(r - R[n, k - 1])))
                    if np.isinf(R[n, k - 1]):
                        ind = len(r) - 1
                    PP[ii, ii] = tab["PP"][n][ind]
            for n in range(C):
                ii = slice(ilist[n], ilist[n + 1])
                hPh[n] = H[n, ii] @ PP[ii, ii] @ H[n, ii]

            fmu = H @ (A @ m)
            if itt == 1 or k == T - 1:
                if np.isnan(y[k]):
                    # MATLAB: Z = max(NaN, jitter) = jitter; derivative
                    # updates produce NaN -> max(NaN, 0) = 0 site precision.
                    lZ_acc += math.log(1e-10)
                    ttau[:, k] = 0.0
                    tnu[:, k] = 0.0
                    R[:, k] = np.inf
                else:
                    lZ_k, dlZ, d2lZ = mom(fmu, hPh, 1.0, k)
                    lZ_acc += lZ_k
                    ttau[:, k] = (1 - ep_damp) * ttau[:, k] + ep_damp * (
                        -d2lZ / (1 + d2lZ * hPh)
                    )
                    tnu[:, k] = (1 - ep_damp) * tnu[:, k] + ep_damp * (
                        (dlZ - fmu * d2lZ) / (1 + d2lZ * hPh)
                    )
                    R[:, k] = 1.0 / ttau[:, k]
            ttau[:, k] = np.maximum(ttau[:, k], 0.0)

            for n in range(C):
                ii = slice(ilist[n], ilist[n + 1])
                if ttau[n, k] == 0.0:
                    R[n, k] = np.inf
                    m[ii] = A[ii, ii] @ m[ii]
                else:
                    K = PP[ii, ii] @ H[n, ii] / (hPh[n] + R[n, k])
                    AKHA = A[ii, ii] - np.outer(K, H[n, ii] @ A[ii, ii])
                    m[ii] = AKHA @ m[ii] + K * (tnu[n, k] / ttau[n, k])
            MS[:, k] = m
        if itt == 1:
            nlZ[0] = -lZ_acc
            # NOTE: the reference resets its lZ accumulator only at the TOP
            # of each iteration, so nlZ(2) duplicates nlZ(1) (:223,:277).

        # ### steady smoother + EP (ref :373-442)
        if itt < ep_itts:
            ep_damp = ep_damping[itt]
        m = MS[:, -1]
        # per-step lookups at R(:, k)
        for k in range(T - 1, -1, -1):
            G = np.zeros((d, d))
            P = np.zeros((d, d))
            for n in range(C):
                ii = slice(ilist[n], ilist[n + 1])
                ind = int(np.argmin(np.abs(r - R[n, k])))
                if np.isinf(R[n, k]):
                    ind = len(r) - 1
                P[ii, ii] = tab["PS"][n][ind]
                G[ii, ii] = tab["G"][n][ind]
            Varft[k] = np.array(
                [
                    H[n, ilist[n] : ilist[n + 1]]
                    @ P[ilist[n] : ilist[n + 1], ilist[n] : ilist[n + 1]]
                    @ H[n, ilist[n] : ilist[n + 1]]
                    for n in range(C)
                ]
            )
            if k == T - 1:
                continue  # backward loop runs k = T-1..1 (MATLAB)
            m = MS[:, k] + G @ (m - A @ MS[:, k])
            MS[:, k] = m

            if itt < ep_itts and not np.isnan(y[k]):
                m_marg = H @ m
                v_marg = Varft[k].copy()
                v_cav = 1.0 / (1.0 / v_marg - ep_fraction * ttau[:, k])
                m_cav = v_cav * (m_marg / v_marg - ep_fraction * tnu[:, k])
                upd = v_cav > 0
                lZ_k, dlZ, d2lZ = mom(m_cav, v_cav, ep_fraction, k)
                if itt > 1:
                    lZ_acc += lZ_k
                den = 1 + d2lZ * v_cav
                tt_new = (1 - ep_damp * ep_fraction) * ttau[:, k] + ep_damp * (
                    -d2lZ / den
                )
                tn_new = (1 - ep_damp * ep_fraction) * tnu[:, k] + ep_damp * (
                    (dlZ - m_cav * d2lZ) / den
                )
                ttau[upd, k] = tt_new[upd]
                tnu[upd, k] = tn_new[upd]
                R[upd, k] = 1.0 / ttau[upd, k]
        if itt < ep_itts:
            nlZ[itt] = -lZ_acc

    Eft = (H @ MS).T
    return {
        "Eft": Eft,
        "Varft": Varft,
        "nlZ": nlZ,
        "ttau": ttau.T,
        "tnu": tnu.T,
        "tables": tab,
    }
