"""Model families: GT-NMF (NMF-modulated spectral mixture GPs), mixtures."""

from nsgp_tpu.models import gtnmf, mixture  # noqa: F401
