"""Hyperparameter learning: constrained optimization of engine energies.

Replaces the reference's fminunc + finite differences (train_model.m:222-246)
with first-order optimization on *exact* autodiff gradients of the EP / IHGP
/ GIEKF energies — a capability the reference lacks for the EP engines (they
return zero gradients, gf_ep_modulator_nmf.m:528).

Constraint handling mirrors the reference's scaled-sigmoid reparameterization
(sigmoid.m / inv_sigmoid.m / unpack_params.m / *_constraints.m engines):
each parameter group can be
  - 'log'      : positive, optimized as log(x)           (default)
  - (lo, hi)   : box-constrained via  x = lo + (hi-lo) * sigmoid(u)
  - 'fixed'    : excluded from optimization (the reference's tune_hypers
                 mask, demo_toy_modulators_nmf_constraints.m:26-40)
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from nsgp_tpu.models.gtnmf import GTNMFModel, GTNMFParams

GROUPS = ("lik", "sub_var", "sub_len", "omega", "mod_var", "mod_len", "W")


def _fwd(spec, u):
    if isinstance(spec, tuple):
        lo, hi = spec
        return lo + (hi - lo) * jax.nn.sigmoid(u)
    return jnp.exp(u)  # 'log'


def _inv(spec, x):
    if isinstance(spec, tuple):
        lo, hi = spec
        p = jnp.clip((x - lo) / (hi - lo), 1e-6, 1.0 - 1e-6)
        return jnp.log(p) - jnp.log1p(-p)
    return jnp.log(x)


class Transform(NamedTuple):
    """Bijective map between GTNMFParams and an unconstrained pytree."""

    specs: dict  # group -> 'log' | 'fixed' | (lo, hi)

    def to_unconstrained(self, params: GTNMFParams) -> dict:
        out = {}
        for g in GROUPS:
            spec = self.specs.get(g, "log")
            if spec == "fixed":
                continue
            out[g] = _inv(spec, getattr(params, g))
        return out

    def to_params(self, u: dict, ref: GTNMFParams) -> GTNMFParams:
        kw = {}
        for g in GROUPS:
            spec = self.specs.get(g, "log")
            if spec == "fixed" or g not in u:
                kw[g] = getattr(ref, g)
            else:
                kw[g] = _fwd(spec, u[g])
        return GTNMFParams(**kw)


def make_energy_fn(model: GTNMFModel, y, mask=None, engine: str = "ep",
                   **cfg_kwargs) -> Callable[[GTNMFParams], jax.Array]:
    if engine == "ep":
        from nsgp_tpu.inference import ep

        cfg = ep.EPConfig(**cfg_kwargs) if cfg_kwargs else ep.EPConfig(ep_itts=1)
        return lambda p: ep.ep_energy(model, p, y, mask, cfg)
    if engine == "ihgp":
        from nsgp_tpu.inference import ihgp

        cfg = ihgp.IHGPConfig(**cfg_kwargs) if cfg_kwargs else ihgp.IHGPConfig()
        return lambda p: ihgp.ihgp_energy(model, p, y, mask, cfg)
    if engine == "giekf":
        from nsgp_tpu.inference import giekf

        cfg = giekf.GIEKFConfig(**cfg_kwargs) if cfg_kwargs else giekf.GIEKFConfig()
        return lambda p: giekf.giekf_energy(model, p, y, mask, cfg)
    raise ValueError(f"unknown engine {engine!r}")


class FitResult(NamedTuple):
    params: GTNMFParams
    energies: jax.Array  # (steps,) energy trace
    final_energy: jax.Array


def fit_hyperparams(
    model: GTNMFModel,
    init_params: GTNMFParams,
    y,
    mask=None,
    engine: str = "ep",
    specs: Optional[dict] = None,
    steps: int = 100,
    learning_rate: float = 3e-2,
    optimizer=None,
    **cfg_kwargs,
) -> FitResult:
    """Optimize the marginal-likelihood energy over (transformed) hypers.

    Equivalent of the reference's fminunc stage, with exact gradients.  The
    whole optimization loop is one jitted lax.scan.
    """
    import optax

    tf = Transform(specs or {})
    energy = make_energy_fn(model, y, mask, engine, **cfg_kwargs)
    u0 = tf.to_unconstrained(init_params)
    opt = optimizer if optimizer is not None else optax.adam(learning_rate)

    def loss(u):
        return energy(tf.to_params(u, init_params))

    @jax.jit
    def run(u0):
        state = opt.init(u0)

        def body(carry, _):
            u, s = carry
            val, g = jax.value_and_grad(loss)(u)
            upd, s = opt.update(g, s, u, value=val, grad=g, value_fn=loss)
            return (optax.apply_updates(u, upd), s), val

        (u, _), vals = jax.lax.scan(body, (u0, state), None, length=steps)
        return u, vals

    u, energies = run(u0)
    params = tf.to_params(u, init_params)
    return FitResult(params=params, energies=energies,
                     final_energy=energies[-1])
