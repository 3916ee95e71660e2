"""Matmul-precision control for the inference engines.

TPU matmul/einsum units default to bfloat16 inputs for f32 arrays
("default" precision).  The Kalman/EP covariance algebra is numerically
intolerant of bf16 rounding: measured on a v5e chip, the 100k-sample EP
benchmark produced NaN sweep energies under default precision while the
identical f32 program on CPU was clean.  The block matrices here are tiny
(bs <= 8), so full-f32 multiplies cost nothing — every engine entry point
traces its body under ``jax.default_matmul_precision("float32")``.
"""

from __future__ import annotations

import functools

import jax


def f32_matmuls(fn):
    """Decorator: trace ``fn`` with float32 (full-precision) matmuls."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped
