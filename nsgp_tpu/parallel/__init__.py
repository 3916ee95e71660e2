"""Device-mesh parallelism (data / channel / chain axes)."""

from nsgp_tpu.parallel import mesh  # noqa: F401
