"""Generate the seeded golden posterior fixture (tests/golden/ep_toy.npz).

Equivalent of the reference's de-facto correctness goldens — the seeded toy
demos (demo_toy_modulators_nmf.m:13-14,177-178, rng seeds 123/100/12345).
The fixture pins the f64 sequential-EP posterior on a fixed prior sample;
tests/test_golden.py asserts every engine/path reproduces it.

Run from the repo root: python scripts/make_golden.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from nsgp_tpu.inference import ep
from nsgp_tpu.models.gtnmf import GTNMFModel, GTNMFParams, sample_prior

SEED = 123  # mirrors demo_toy_modulators_nmf.m's fixed rng seed
D, N, T = 6, 2, 2000


def toy():
    model = GTNMFModel(D=D, N=N, kernel1="matern32", kernel2="matern52",
                       p_cubature=9)
    params = GTNMFParams(
        lik=jnp.asarray(1e-3),
        sub_var=jnp.ones((D,)),
        sub_len=jnp.linspace(40.0, 120.0, D),
        omega=jnp.linspace(0.1, 2.2, D),
        mod_var=jnp.full((N,), 2.0),
        mod_len=jnp.linspace(200.0, 400.0, N),
        W=jax.random.uniform(jax.random.PRNGKey(SEED), (D, N),
                             minval=0.1, maxval=1.0),
    )
    y, sub, g = sample_prior(jax.random.PRNGKey(SEED + 1), model, params, T=T)
    return model, params, y


def main():
    model, params, y = toy()
    cfg = ep.EPConfig(ep_itts=5, parallel=False)
    res = ep.ep_infer(model, params, y, None, cfg)
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "golden", "ep_toy.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(
        out,
        y=np.asarray(y),
        Eft=np.asarray(res.Eft),
        Varft=np.asarray(res.Varft),
        nlZ=np.asarray(res.nlZ),
        maxdiff=np.asarray(res.maxdiff),
    )
    print("wrote", out)
    print("nlZ:", np.asarray(res.nlZ))
    print("maxdiff:", np.asarray(res.maxdiff))


if __name__ == "__main__":
    main()
