"""Inference engines: Power-EP, infinite-horizon EP, global iterated EKF."""

from nsgp_tpu.inference import ep, giekf, hmc, ihgp, learn  # noqa: F401
