"""Application-level tests: gap filling, denoising, source separation,
hyperlearning, HMC/VI (tiny configs — these exercise wiring + sanity)."""

import jax
import jax.numpy as jnp
import numpy as np

from nsgp_tpu.apps import denoise, missing_data, source_sep
from nsgp_tpu.inference import ep, hmc, learn
from nsgp_tpu.models import mixture
from nsgp_tpu.models.gtnmf import GTNMFModel, GTNMFParams, sample_prior


def _toy(D=3, N=2, seed=0):
    model = GTNMFModel(D=D, N=N, kernel1="matern32", kernel2="matern52",
                       p_cubature=5)
    key = jax.random.PRNGKey(seed)
    params = GTNMFParams(
        lik=jnp.asarray(0.03),
        sub_var=jnp.linspace(0.5, 1.5, D),
        sub_len=jnp.linspace(30.0, 90.0, D),
        omega=jnp.linspace(0.3, 1.4, D),
        mod_var=jnp.full((N,), 1.5),
        mod_len=jnp.linspace(250.0, 450.0, N),
        W=jax.random.uniform(key, (D, N), minval=0.2, maxval=1.0),
    )
    return model, params


def test_gap_filling_beats_zero_baseline():
    model, params = _toy()
    y, _, _ = sample_prior(jax.random.PRNGKey(1), model, params, T=500)
    mask = missing_data.make_gap_mask(500, [(100, 30), (300, 40)])
    res = missing_data.fill_gaps(model, params, y, mask, engine="ep",
                                 ep_itts=3)
    gap = ~np.asarray(mask)
    rmse_zero = np.sqrt(np.mean(np.asarray(y)[gap] ** 2))
    assert float(res.rmse_gaps) < rmse_zero, (float(res.rmse_gaps), rmse_zero)
    assert np.isfinite(float(res.snr_gaps))


def test_denoising_improves_snr():
    model, params = _toy(seed=2)
    y, _, _ = sample_prior(jax.random.PRNGKey(3), model, params, T=500)
    noise_var = 0.3
    yn = y + jnp.sqrt(noise_var) * jax.random.normal(jax.random.PRNGKey(4),
                                                     y.shape, y.dtype)
    res = denoise.denoise(model, params, yn, noise_var, y_clean=y,
                          engine="ep", ep_itts=3)
    assert float(res.snr_out) > float(res.snr_in), (
        float(res.snr_out), float(res.snr_in))


def test_mixture_join_and_separation_shapes():
    m1, p1 = _toy(D=2, N=1, seed=5)
    m2, p2 = _toy(D=2, N=1, seed=6)
    jm, jp, sl = mixture.join_models([m1, m2], [p1, p2])
    assert jm.D == 4 and jm.N == 2
    assert jp.W.shape == (4, 2)
    # block-diagonal W
    np.testing.assert_allclose(np.asarray(jp.W[:2, 1]), 0.0)
    np.testing.assert_allclose(np.asarray(jp.W[2:, 0]), 0.0)

    y1, _, _ = sample_prior(jax.random.PRNGKey(7), m1, p1, T=400)
    y2, _, _ = sample_prior(jax.random.PRNGKey(8), m2, p2, T=400)
    ymix = y1 + y2
    res = source_sep.separate([m1, m2], [p1, p2], ymix, engine="ep",
                              true_sources=jnp.stack([y1, y2], -1),
                              ep_itts=3)
    assert res.sources.shape == (400, 2)
    # separated sum should track the mixture
    tot = np.asarray(res.sources).sum(-1)
    r = np.corrcoef(tot, np.asarray(ymix))[0, 1]
    assert r > 0.9, r


def test_fit_hyperparams_decreases_energy():
    model, params = _toy(D=2, N=1, seed=9)
    y, _, _ = sample_prior(jax.random.PRNGKey(10), model, params, T=300)
    # perturb the params, then fit lik + mod_var only (rest fixed)
    p0 = params._replace(lik=jnp.asarray(0.5), mod_var=params.mod_var * 3.0)
    res = learn.fit_hyperparams(
        model, p0, y, engine="ep",
        specs={"sub_var": "fixed", "sub_len": "fixed", "omega": "fixed",
               "mod_len": "fixed", "W": "fixed", "lik": (1e-4, 1.0)},
        steps=30, learning_rate=0.1, ep_itts=1,
    )
    assert float(res.energies[-1]) < float(res.energies[0]), res.energies
    # constrained lik stays in its box
    assert 1e-4 <= float(res.params.lik) <= 1.0


def test_hmc_and_vi_run_and_are_finite():
    model, params = _toy(D=2, N=1, seed=11)
    y, _, _ = sample_prior(jax.random.PRNGKey(12), model, params, T=200)
    tf = learn.Transform({"sub_var": "fixed", "sub_len": "fixed",
                          "omega": "fixed", "W": "fixed",
                          "mod_len": "fixed"})
    energy = learn.make_energy_fn(model, y, engine="ep", ep_itts=1)
    log_post = hmc.make_log_post(energy, tf, params)
    u0 = tf.to_unconstrained(params)

    res = hmc.hmc_sample(jax.random.PRNGKey(13), log_post, u0,
                         hmc.HMCConfig(n_samples=5, n_warmup=5, n_leapfrog=3),
                         n_chains=2)
    assert res.samples.shape[0] == 2 and res.samples.shape[1] == 5
    assert np.all(np.isfinite(np.asarray(res.samples)))

    vi = hmc.vi_fit(jax.random.PRNGKey(14), log_post, u0, steps=20, n_mc=2)
    assert np.all(np.isfinite(np.asarray(vi.mean)))
    assert np.all(np.isfinite(np.asarray(vi.elbo_trace[-1])))


def test_transform_box_constraints_roundtrip_and_bounds():
    """Scaled-sigmoid box constraints (the reference's sigmoid.m /
    unpack_params.m semantics): roundtrip exactness and optimization stays
    inside the box."""
    from nsgp_tpu.models.gtnmf import sample_prior as _sp

    model, params = _toy()
    y, _, _ = _sp(jax.random.PRNGKey(2), model, params, T=300)
    specs = {"omega": (0.05, 3.0), "sub_len": (5.0, 500.0), "W": "fixed"}
    tf = learn.Transform(specs)
    u = tf.to_unconstrained(params)
    back = tf.to_params(u, params)
    for g in ("omega", "sub_len", "mod_var"):
        np.testing.assert_allclose(
            np.asarray(getattr(back, g)), np.asarray(getattr(params, g)),
            rtol=1e-6,
        )
    res = learn.fit_hyperparams(
        model, params, y, engine="ep", specs=specs, steps=10,
        learning_rate=0.2, ep_itts=1,
    )
    assert np.all(np.asarray(res.params.omega) > 0.05)
    assert np.all(np.asarray(res.params.omega) < 3.0)
    assert np.all(np.asarray(res.params.sub_len) > 5.0)
    np.testing.assert_allclose(np.asarray(res.params.W), np.asarray(params.W))
    assert np.isfinite(float(res.final_energy))


def test_tv_wiener_passthrough_and_suppression():
    """tv_wiener sanity: with huge envelopes and tiny noise the gain is ~1
    (COLA reconstruction returns the input); with zero envelopes the gain
    is ~0 (output suppressed)."""
    import jax

    from nsgp_tpu.models.gtnmf import GTNMFModel

    D, N, T = 3, 2, 4000
    model = GTNMFModel(D=D, N=N, kernel1="exp", kernel2="matern52",
                       variant="sq", p_cubature=5)
    from nsgp_tpu.models.gtnmf import GTNMFParams
    params = GTNMFParams(
        lik=jnp.asarray(1e-4),
        sub_var=jnp.full((D,), 0.06),
        sub_len=jnp.asarray([200.0, 150.0, 100.0]),
        omega=jnp.asarray([0.3, 0.9, 1.6]),
        mod_var=jnp.ones((N,)),
        mod_len=jnp.asarray([200.0, 300.0]),
        W=jnp.full((D, N), 0.5),
    )
    key = jax.random.PRNGKey(0)
    y = jax.random.normal(key, (T,))
    # huge envelopes: Eft g-channels large -> a2 huge -> G ~ 1
    Eft_hi = jnp.concatenate(
        [jnp.zeros((T, D)), jnp.full((T, N), 30.0)], axis=1
    )
    out_hi = denoise.tv_wiener(model, params, Eft_hi, y, noise_var=1e-8)
    # interior samples reconstruct the input through the COLA chain
    err = jnp.max(jnp.abs(out_hi[512:-512] - y[512:-512]))
    assert float(err) < 1e-3, float(err)
    # zero envelopes (softplus(-30) ~ 0): G ~ 0 -> output suppressed
    Eft_lo = jnp.concatenate(
        [jnp.zeros((T, D)), jnp.full((T, N), -30.0)], axis=1
    )
    out_lo = denoise.tv_wiener(model, params, Eft_lo, y, noise_var=1.0)
    assert float(jnp.max(jnp.abs(out_lo[512:-512]))) < 1e-3 * float(
        jnp.max(jnp.abs(y))
    )
