"""HMC and mean-field VI over hyperparameters, with chain-parallel sharding.

New capability layer (nothing comparable in the reference, whose only
hyperlearning is fminunc with finite differences): the EP/IHGP/GIEKF energy
is the negative log-likelihood; sampling runs in the unconstrained space of
nsgp_tpu.inference.learn.Transform with the log-|Jacobian| correction.

Chains are independent and vmapped; on a mesh they shard over a 'chain'
axis (pure data parallelism — each chain's filter/smoother runs on its own
devices; see nsgp_tpu.parallel.mesh).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.flatten_util
import jax.numpy as jnp

from nsgp_tpu.inference.learn import Transform
from nsgp_tpu.models.gtnmf import GTNMFParams


class HMCConfig(NamedTuple):
    n_samples: int = 100
    n_warmup: int = 100
    n_leapfrog: int = 16
    init_step_size: float = 0.02
    target_accept: float = 0.8


class HMCResult(NamedTuple):
    samples: jax.Array  # (chains, n_samples, dim) unconstrained draws
    accept_rate: jax.Array  # (chains,)
    step_size: jax.Array  # (chains,) adapted step sizes
    unravel: Callable  # dim-vector -> unconstrained pytree


def _log_jacobian(tf: Transform, u: dict) -> jax.Array:
    """log |d constrained / d unconstrained| summed over parameters."""
    total = jnp.zeros(())
    for g, uu in u.items():
        spec = tf.specs.get(g, "log")
        if isinstance(spec, tuple):
            lo, hi = spec
            s = jax.nn.sigmoid(uu)
            total = total + jnp.sum(jnp.log(hi - lo) + jnp.log(s) + jnp.log1p(-s))
        else:
            total = total + jnp.sum(uu)  # d exp(u)/du = exp(u)
    return total


def make_log_post(energy_fn, tf: Transform, ref: GTNMFParams,
                  log_prior: Optional[Callable] = None):
    """Unnormalized log posterior over the unconstrained pytree."""

    def log_post(u):
        params = tf.to_params(u, ref)
        lp = -energy_fn(params) + _log_jacobian(tf, u)
        if log_prior is not None:
            lp = lp + log_prior(params)
        return lp

    return log_post


def hmc_sample(
    key: jax.Array,
    log_post: Callable,
    u_init: dict,
    config: HMCConfig = HMCConfig(),
    n_chains: int = 4,
    jitter_init: float = 0.05,
) -> HMCResult:
    """Vanilla HMC with dual-averaging step-size adaptation, vmapped chains."""
    flat0, unravel = jax.flatten_util.ravel_pytree(u_init)
    dim = flat0.shape[0]

    def logp(q):
        return log_post(unravel(q))

    grad_logp = jax.grad(logp)

    def leapfrog(q, p, eps):
        p = p + 0.5 * eps * grad_logp(q)

        def body(i, qp):
            q, p = qp
            q = q + eps * p
            p = p + eps * grad_logp(q)
            return q, p

        q, p = jax.lax.fori_loop(0, config.n_leapfrog - 1, body, (q, p))
        q = q + eps * p
        p = p + 0.5 * eps * grad_logp(q)
        return q, p

    def hmc_step(carry, key):
        q, log_eps, h_bar, log_eps_bar, t = carry
        eps = jnp.exp(log_eps)
        kp, ka = jax.random.split(key)
        p0 = jax.random.normal(kp, (dim,), q.dtype)
        q1, p1 = leapfrog(q, p0, eps)
        dH = (logp(q1) - 0.5 * p1 @ p1) - (logp(q) - 0.5 * p0 @ p0)
        accept_p = jnp.minimum(1.0, jnp.exp(dH))
        accept_p = jnp.where(jnp.isfinite(accept_p), accept_p, 0.0)
        accept = jax.random.uniform(ka, ()) < accept_p
        q = jnp.where(accept, q1, q)

        # dual averaging (Nesterov) toward target accept rate, warmup only
        warm = t < config.n_warmup
        tt = t + 1.0
        h_bar_new = (1.0 - 1.0 / (tt + 10.0)) * h_bar + (
            config.target_accept - accept_p
        ) / (tt + 10.0)
        log_eps_new = jnp.log(config.init_step_size) - jnp.sqrt(tt) / 0.05 * h_bar_new
        w = tt ** (-0.75)
        log_eps_bar_new = w * log_eps_new + (1.0 - w) * log_eps_bar
        log_eps = jnp.where(warm, log_eps_new, log_eps_bar)
        h_bar = jnp.where(warm, h_bar_new, h_bar)
        log_eps_bar = jnp.where(warm, log_eps_bar_new, log_eps_bar)
        return (q, log_eps, h_bar, log_eps_bar, tt), (q, accept_p)

    def one_chain(key):
        k0, ks = jax.random.split(key)
        q0 = flat0 + jitter_init * jax.random.normal(k0, (dim,), flat0.dtype)
        keys = jax.random.split(ks, config.n_warmup + config.n_samples)
        init = (
            q0,
            jnp.log(jnp.asarray(config.init_step_size, flat0.dtype)),
            jnp.zeros((), flat0.dtype),
            jnp.log(jnp.asarray(config.init_step_size, flat0.dtype)),
            jnp.zeros((), flat0.dtype),
        )
        (qT, log_eps, *_), (qs, accs) = jax.lax.scan(hmc_step, init, keys)
        return (
            qs[config.n_warmup :],
            jnp.mean(accs[config.n_warmup :]),
            jnp.exp(log_eps),
        )

    keys = jax.random.split(key, n_chains)
    samples, acc, eps = jax.vmap(one_chain)(keys)
    return HMCResult(samples=samples, accept_rate=acc, step_size=eps,
                     unravel=unravel)


# ---------------------------------------------------------------------------
# Mean-field VI (reparameterized Gaussian over unconstrained params)
# ---------------------------------------------------------------------------


class VIResult(NamedTuple):
    mean: jax.Array  # (dim,)
    log_std: jax.Array  # (dim,)
    elbo_trace: jax.Array
    unravel: Callable


def vi_fit(
    key: jax.Array,
    log_post: Callable,
    u_init: dict,
    steps: int = 300,
    n_mc: int = 4,
    learning_rate: float = 1e-2,
) -> VIResult:
    """Mean-field Gaussian VI with reparameterized ELBO gradients."""
    import optax

    flat0, unravel = jax.flatten_util.ravel_pytree(u_init)
    dim = flat0.shape[0]

    def elbo(var_params, key):
        mu, log_std = var_params
        eps = jax.random.normal(key, (n_mc, dim), mu.dtype)
        qs = mu[None] + jnp.exp(log_std)[None] * eps
        lps = jax.vmap(lambda q: log_post(unravel(q)))(qs)
        entropy = jnp.sum(log_std) + 0.5 * dim * (1.0 + jnp.log(2 * jnp.pi))
        return jnp.mean(lps) + entropy

    opt = optax.adam(learning_rate)
    vp0 = (flat0, jnp.full((dim,), -2.0, flat0.dtype))

    @jax.jit
    def run(vp0, key):
        state = opt.init(vp0)

        def body(carry, key):
            vp, s = carry
            val, g = jax.value_and_grad(lambda v: -elbo(v, key))(vp)
            upd, s = opt.update(g, s)
            return (optax.apply_updates(vp, upd), s), -val

        keys = jax.random.split(key, steps)
        (vp, _), trace = jax.lax.scan(body, (vp0, state), keys)
        return vp, trace

    (mu, log_std), trace = run(vp0, key)
    return VIResult(mean=mu, log_std=log_std, elbo_trace=trace, unravel=unravel)
