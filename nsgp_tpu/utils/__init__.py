"""Utilities: audio IO, metrics."""

from nsgp_tpu.utils import audio, metrics  # noqa: F401
