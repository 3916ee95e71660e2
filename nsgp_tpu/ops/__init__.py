"""Numerics substrate: kernels->SS, discretization, Kalman, scans, cubature."""

from nsgp_tpu.ops import cubature, dare, kalman, kernels, moments, pscan, ssm  # noqa: F401
