"""nsgp_tpu — TPU-native framework for nonstationary spectral-mixture GP audio
analysis (the GT-NMF model family of Wilkinson et al., ICML 2019).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
AaltoML/nonstationary-audio-gp (pure-MATLAB reference):

- ``ops``       : kernels -> state space, discretization, Kalman/RTS (sequential
                  scan + parallel associative scan), cubature rules, moment
                  matching, batched DARE, interpolation.
- ``models``    : GT-NMF model family (per-subband modulators, NMF modulators,
                  mixtures for source separation), parameter transforms.
- ``inference`` : Power-EP, infinite-horizon (IHGP) EP, global iterated EKF,
                  HMC/NUTS and VI over hyperparameters.
- ``pretrain``  : initialization pipeline (probabilistic STFT fitting, steady
                  state Kalman filterbank, GPPAD amplitude demodulation, NMF,
                  SE-GP spectral fits).
- ``apps``      : missing-data synthesis, denoising, source separation.
- ``parallel``  : device meshes, shard_map'd engines, multi-host scaling.
- ``utils``     : audio IO, metrics, misc.

Design notes (TPU-first, not a MATLAB port):

The reference builds one dense joint state-space model (state dim m ~ 40-100)
and runs O(T * m^3) dense Kalman recursions (``gf_ep_modulator_nmf.m``).  But
F/A/Q/Pinf are block-diagonal per channel and every EP pseudo-observation has
an H row supported on a single channel block, so the joint covariance stays
block-diagonal for all time.  This package therefore keeps the state as
stacked per-channel blocks ``(C, bs, bs)`` and batches all filter algebra over
the channel axis (vmap / mesh sharding) — O(T * C * bs^3) with bs <= 8 —
while the cross-channel coupling enters only through the scalar-likelihood
moment matching, which is a small per-step (D+N)-vector exchange.

Time parallelism: EP sweeps with fixed sites are linear-Gaussian and run as
``jax.lax.associative_scan`` parallel filters/smoothers; moment matching is
vectorized over all T sites at once.  Only the very first ADF sweep is
inherently sequential (sites feed back into the filter) and runs as a
``lax.scan``.
"""

__version__ = "0.1.0"

from nsgp_tpu import ops, models, inference, pretrain, apps, parallel, utils  # noqa: F401
