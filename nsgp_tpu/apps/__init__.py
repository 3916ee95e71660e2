"""Applications: missing-data inpainting, denoising, source separation."""

from nsgp_tpu.apps import denoise, missing_data, source_sep  # noqa: F401
