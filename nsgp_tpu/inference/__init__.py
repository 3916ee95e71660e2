"""Inference engines: Power-EP, infinite-horizon EP, global iterated EKF,
plus batched multi-signal variants of all three (inference.batched)."""

from nsgp_tpu.inference import (  # noqa: F401
    batched, ep, giekf, hmc, ihgp, learn,
)
