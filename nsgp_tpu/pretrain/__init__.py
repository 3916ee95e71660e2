"""Initialization / pre-training pipeline (probSTFT fit, filterbank, GPPAD,
NMF, SE-GP fits)."""

from nsgp_tpu.pretrain import filterbank, gppad, nmf, pipeline, segp, spectral  # noqa: F401
