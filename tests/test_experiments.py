"""Experiment drivers: structure + sanity on reduced configs.

Full-scale runs live in results/ (committed artifacts produced by the
module CLIs); these tests keep the drivers importable and correct.
"""

import os

import numpy as np
import pytest


def test_synthetic_driver_structure_and_sanity():
    from nsgp_tpu.experiments import synthetic

    res = synthetic.run(T=800, seed=0, ep_itts=3, engines=("ep", "giekf"))
    for eng in ("ep", "giekf"):
        row = res[eng]
        assert set(row) >= {"rmse_sig", "rmse_sub", "rmse_mod", "seconds"}
        assert np.isfinite(row["rmse_sig"])
        # reconstruction must beat the trivial zero predictor
        assert row["rmse_sig"] < res["config"]["y_std"]
    # Engines must agree: signal reconstructions within 3x of each other
    # (since the reference-exact GIEKF rewrite it often *beats* EP here)
    # (at this tiny T the IEKF is markedly sharper than 3 EP sweeps:
    # measured ratio ~5 at T=800, near 1 at T=3000)
    ratio = res["ep"]["rmse_sig"] / res["giekf"]["rmse_sig"]
    assert 1 / 10.0 < ratio < 10.0, ratio


def test_missing_data_driver_reference_protocol(tmp_path, monkeypatch):
    """End-to-end reference protocol on a synthetic 'piano' wav: resample
    path, whole-signal pretrain artifact, reference gap table, padded-shape
    inference, cold/warm timing split."""
    import nsgp_tpu.experiments as exps
    from nsgp_tpu.experiments import missing_data, protocol, train_corpus
    from nsgp_tpu.utils.audio import write_wav

    root = tmp_path / "audio"
    (root / "music").mkdir(parents=True)
    fs = 16000
    t = np.arange(int(0.8 * fs)) / fs
    y = (np.sin(2 * np.pi * 440 * t) * (1.0 + 0.5 * np.sin(2 * np.pi * 2 * t))
         + 0.05 * np.random.default_rng(0).standard_normal(t.shape))
    write_wav(str(root / "music" / "piano.wav"), 0.5 * y / np.abs(y).max(), fs)
    monkeypatch.setattr(exps, "AUDIO_ROOT", str(root))
    monkeypatch.setattr(train_corpus, "AUDIO_ROOT", str(root))

    out_dir = str(tmp_path / "trained")
    train_corpus.run(
        corpus="music", kernels=("exp",), D=4, N=2, out_dir=out_dir,
        files=("piano",),
        pretrain_kwargs=dict(num_levels=2, steps_per_level=80),
    )
    real_load = train_corpus.load_corpus_model
    monkeypatch.setattr(
        train_corpus, "load_corpus_model",
        lambda corpus, name, kernel: real_load(corpus, name, kernel, out_dir),
    )
    res = missing_data.run_file(
        "music", "piano", kernel1="exp", engines=("ep",), ep_itts=(2,),
        pad_T=13312, n_samples=20,
    )
    # T(16 kHz) of the synthetic file, and only in-range gaps scored
    assert res["T"] == int(0.8 * fs)
    assert res["w_lik"] == protocol.W_LIK_MISSING
    row = res["rows"][0]
    assert np.isfinite(row["rmse_gaps"])
    assert np.isfinite(row["snr_gaps_db"])
    assert row["seconds_warm"] <= row["seconds_cold"]


def test_textures_ihgp_driver_on_real_texture():
    from nsgp_tpu.experiments import textures_ihgp

    path = os.path.join("/root/reference/audio/textures", "stim312_wind.wav")
    if not os.path.exists(path):
        pytest.skip("reference audio not available")
    res = textures_ihgp.run_file(
        path, D=6, N=2, train_seconds=0.2, seconds=0.3, tile=2, n_gaps=4,
        ep_itts=2,
        pretrain_kwargs=dict(num_levels=2, steps_per_level=100),
    )
    assert res["T"] == 2 * int(0.3 * res["fs"])
    assert np.isfinite(res["snr_gaps_db"])
    assert np.all(np.isfinite(res["nlZ_per_sweep"]))


def test_committed_artifacts_parse():
    """Any committed results/ artifact must be valid JSON with an
    'experiment' or per-engine structure."""
    import json

    root = os.path.join(os.path.dirname(os.path.dirname(__file__)), "results")
    if not os.path.isdir(root):
        pytest.skip("no results committed yet")
    for name in os.listdir(root):
        if name.endswith(".json"):
            with open(os.path.join(root, name)) as f:
                json.load(f)
