"""End-to-end pre-training pipeline on REAL reference audio.

This is the L1 -> L4 artery: train_gtnmf_fixed_params (the equivalent of
experiments/train_GTFNMF_fixed_params.m:19-60, the pipeline the paper's
experiment drivers actually call) must run on an actual speech wav and
produce a usable model: finite params, positive variances, and an EP energy
better than a perturbed-parameter baseline.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from nsgp_tpu.inference import ep
from nsgp_tpu.pretrain import pipeline
from nsgp_tpu.utils.audio import read_wav

SPEECH = "/root/reference/audio/speech/speech0_female.wav"


@pytest.fixture(scope="module")
def trained():
    if not os.path.exists(SPEECH):
        pytest.skip("reference audio not available")
    y, fs = read_wav(SPEECH)
    y = jnp.asarray(y[: fs // 2])  # 0.5 s
    tm = pipeline.train_gtnmf_fixed_params(
        y, D=8, N=2, kernel1="exp", kernel2="matern52", fs=float(fs),
        filterbank_kwargs=dict(num_levels=2, steps_per_level=150),
    )
    return y / jnp.std(y), tm


def test_pipeline_produces_finite_params(trained):
    _, tm = trained
    for name, val in tm.params._asdict().items():
        arr = np.asarray(val)
        assert np.all(np.isfinite(arr)), (name, arr)
    assert np.all(np.asarray(tm.params.sub_var) > 0)
    assert np.all(np.asarray(tm.params.mod_var) > 0)
    assert np.all(np.asarray(tm.params.mod_len) > 0)
    assert np.all(np.asarray(tm.params.W) >= 0)
    # envelopes positive, components normalized to mean ~1
    assert np.all(np.asarray(tm.envelopes) > 0)
    np.testing.assert_allclose(np.asarray(tm.H).mean(0), 1.0, rtol=1e-3)


def test_pipeline_energy_beats_perturbed_init(trained):
    """EP energy at the trained params must beat the same params with the
    spectral fit scrambled (random center frequencies / lengthscales) —
    i.e., the pipeline extracts real signal structure (the reference's
    training pipeline exists precisely to do this)."""
    y, tm = trained
    yseg = y[:4000]
    cfg = ep.EPConfig(ep_itts=1)
    e_trained = float(ep.ep_energy(tm.model, tm.params, yseg, None, cfg))
    rng = np.random.default_rng(0)
    bad = tm.params._replace(
        omega=jnp.asarray(rng.uniform(0.05, 3.0, tm.model.D)),
        sub_len=jnp.full((tm.model.D,), 10.0),
    )
    e_bad = float(ep.ep_energy(tm.model, bad, yseg, None, cfg))
    assert np.isfinite(e_trained)
    assert e_trained < e_bad, (e_trained, e_bad)


def test_pipeline_artifact_roundtrip(trained, tmp_path):
    _, tm = trained
    path = str(tmp_path / "trained_speech0.npz")
    pipeline.save_trained(path, tm)
    model2, params2 = pipeline.load_trained(path)
    assert model2 == tm.model
    for a, b in zip(tm.params, params2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7)
