"""GT-NMF model family: parameters, transforms, assembly, prior sampling.

The Gaussian Time-Frequency + NMF model of Wilkinson et al. (ICML 2019):
D quasi-periodic subband GPs amplitude-modulated by N (<= D) softplus-linked
modulator GPs mixed through nonnegative weights W (D x N).

Parameter vector layout matches the reference exactly
(gf_ep_modulator_nmf.m:72-75, demo_toy_modulators_nmf.m:89):

    w = log([lik; var_f (D); len_f (D); omega (D); var_s (N); len_s (N); W(:)])

with W flattened column-major (MATLAB order).  The non-NMF per-subband
modulator model (ss_modulators.m / gf_ep_modulator.m) is the special case
N == D, W = I_D (see ``per_subband_params``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nsgp_tpu.ops import ssm as ssm_mod
from nsgp_tpu.ops.moments import MomentParams


class GTNMFParams(NamedTuple):
    """Natural-scale (positive) model hyperparameters, as a JAX pytree."""

    lik: jax.Array  # () observation noise variance sn2
    sub_var: jax.Array  # (D,) subband marginal variances
    sub_len: jax.Array  # (D,) subband lengthscales
    omega: jax.Array  # (D,) subband center frequencies (rad/sample)
    mod_var: jax.Array  # (N,) modulator variances
    mod_len: jax.Array  # (N,) modulator lengthscales
    W: jax.Array  # (D, N) nonnegative NMF weights

    @property
    def D(self) -> int:
        return self.sub_var.shape[0]

    @property
    def N(self) -> int:
        return self.mod_var.shape[0]

    def to_flat_log(self) -> jax.Array:
        """Pack to the reference's flat log-parameter vector ``w``."""
        return jnp.concatenate(
            [
                jnp.log(jnp.atleast_1d(self.lik)),
                jnp.log(self.sub_var),
                jnp.log(self.sub_len),
                jnp.log(self.omega),
                jnp.log(self.mod_var),
                jnp.log(self.mod_len),
                jnp.log(self.W.T.reshape(-1)),  # column-major like MATLAB W(:)
            ]
        )

    @staticmethod
    def from_flat_log(w: jax.Array, D: int, N: int, num_lik: int = 1) -> "GTNMFParams":
        """Unpack the reference layout (gf_ep_modulator_nmf.m:72-75)."""
        lik = jnp.exp(w[0]) if num_lik == 1 else jnp.exp(w[:num_lik])
        o = num_lik
        ew = jnp.exp(w)
        return GTNMFParams(
            lik=lik,
            sub_var=ew[o : o + D],
            sub_len=ew[o + D : o + 2 * D],
            omega=ew[o + 2 * D : o + 3 * D],
            mod_var=ew[o + 3 * D : o + 3 * D + N],
            mod_len=ew[o + 3 * D + N : o + 3 * D + 2 * N],
            W=ew[o + 3 * D + 2 * N :].reshape(N, D).T,  # undo column-major
        )


class GTNMFModel(NamedTuple):
    """Static model specification (hashable; safe as a jit static arg)."""

    D: int
    N: int
    kernel1: str = "matern32"  # subband kernel
    kernel2: str = "matern52"  # modulator kernel
    link: str = "softplus"
    variant: str = "amp"  # 'amp' | 'sq' (spectrogram/paper variant)
    p_cubature: int = 9
    cubature_method: str = "symmetric"
    use_pep_const: bool = False
    z_floor: float = 1e-10  # likModulatorNMFPower.m:28; the per-subband
    # likelihood (likModulatorPower.m:25) uses 1e-8

    def moment_params(self) -> MomentParams:
        return MomentParams(
            D=self.D,
            N=self.N,
            p_cubature=self.p_cubature,
            link=self.link,
            variant=self.variant,
            method=self.cubature_method,
            use_pep_const=self.use_pep_const,
            z_floor=self.z_floor,
        )

    def build_ssm(self, params: GTNMFParams, dt: float = 1.0) -> ssm_mod.BlockSSM:
        return ssm_mod.build_modulator_ssm(
            params.sub_var,
            params.sub_len,
            params.omega,
            params.mod_var,
            params.mod_len,
            kernel1=self.kernel1,
            kernel2=self.kernel2,
            dt=dt,
        )


def per_subband_params(
    lik, sub_var, sub_len, omega, mod_var, mod_len
) -> GTNMFParams:
    """The non-NMF model (one modulator per subband, ss_modulators.m):
    equivalent to NMF with N = D and W = I."""
    D = jnp.atleast_1d(sub_var).shape[0]
    return GTNMFParams(
        lik=jnp.asarray(lik),
        sub_var=jnp.atleast_1d(sub_var),
        sub_len=jnp.atleast_1d(sub_len),
        omega=jnp.atleast_1d(omega),
        mod_var=jnp.atleast_1d(mod_var),
        mod_len=jnp.atleast_1d(mod_len),
        W=jnp.eye(D, dtype=jnp.atleast_1d(sub_var).dtype),
    )


# ---------------------------------------------------------------------------
# Prior sampling (toy demos / synthetic experiments)
# ---------------------------------------------------------------------------


def _psd_sqrt(M):
    """Symmetric PSD square root via eigh (safe for padded singular blocks)."""
    lam, V = jnp.linalg.eigh(M)
    lam = jnp.clip(lam, 0.0)
    return V @ (jnp.sqrt(lam)[..., :, None] * jnp.swapaxes(V, -1, -2))


def sample_prior(
    key: jax.Array, model: GTNMFModel, params: GTNMFParams, T: int, dt: float = 1.0
):
    """Sample latents and observations from the generative model.

    Ref demo_toy_modulators_nmf.m:40-53: z_k = A z_{k-1} + Q^{1/2} xi,
    y_k = z_sub' W link(g).  Returns (y (T,), subbands (T, D),
    modulator_latents (T, N)).
    """
    from nsgp_tpu.ops.moments import LINKS

    ssm = model.build_ssm(params, dt)
    C, bs = ssm.num_channels, ssm.block_size
    sqrtP = _psd_sqrt(ssm.Pinf)
    sqrtQ = _psd_sqrt(ssm.Q)
    k0, k1 = jax.random.split(key)
    x0 = jnp.einsum("cij,cj->ci", sqrtP, jax.random.normal(k0, (C, bs), ssm.A.dtype))
    eps = jax.random.normal(k1, (T - 1, C, bs), ssm.A.dtype)

    def step(x, e):
        x = jnp.einsum("cij,cj->ci", ssm.A, x) + jnp.einsum("cij,cj->ci", sqrtQ, e)
        return x, x

    _, xs = jax.lax.scan(step, x0, eps)
    xs = jnp.concatenate([x0[None], xs], axis=0)  # (T, C, bs)
    f = jnp.einsum("ci,tci->tc", ssm.H, xs)  # (T, C) observable latents
    sub = f[:, : model.D]
    g = f[:, model.D :]
    link = LINKS[model.link]
    amps = link(g) @ params.W.T  # (T, D)
    if model.variant == "sq":
        amps = jnp.sqrt(amps)
    y = jnp.einsum("td,td->t", sub, amps)
    return y, sub, g
