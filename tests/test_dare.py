"""DARE solver robustness: convergence detection and grid-point fallback.

The reference catches failed LAPACK dare() calls and drops those grid
points (ihgp_ep_modulator_nmf.m:114-128); our doubling iteration cannot
raise inside jit, so dare_residual flags failures and build_tables patches
them with the nearest converged grid point.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nsgp_tpu.ops import dare


def test_residual_small_for_solvable_dare():
    A = jnp.asarray([[0.95, 0.1], [0.0, 0.9]])
    h = jnp.asarray([1.0, 0.0])
    Q = jnp.asarray([[0.1, 0.0], [0.0, 0.2]])
    for r in [1e-3, 1.0, 1e3]:
        P = dare.dare_filter(A, h, Q, jnp.asarray(r))
        res = float(dare.dare_residual(P, A, h, Q, jnp.asarray(r)))
        assert res < 1e-8, (r, res)
        # P must be PSD
        assert np.all(np.linalg.eigvalsh(np.asarray(P)) > -1e-12)


def test_residual_flags_undetectable_unstable_channel():
    """Unstable A with h = 0 (undetectable): no stabilizing solution exists;
    the doubling iterate diverges and the residual must flag it."""
    A = jnp.asarray([[1.05]])
    h = jnp.asarray([0.0])
    Q = jnp.asarray([[1.0]])
    P = dare.dare_filter(A, h, Q, jnp.asarray(1.0))
    res = float(dare.dare_residual(P, A, h, Q, jnp.asarray(1.0)))
    assert not np.isfinite(res) or res > 1.0, res


def test_build_tables_patches_failed_grid_points():
    """A model containing one undetectable-unstable channel must still
    produce finite steady-state tables (patched from Pinf fallback), and
    healthy channels must be unaffected."""
    from nsgp_tpu.inference import ihgp
    from nsgp_tpu.models.gtnmf import GTNMFModel, GTNMFParams

    model = GTNMFModel(D=2, N=1, kernel1="matern32", kernel2="matern52")
    params = GTNMFParams(
        lik=jnp.asarray(0.05),
        sub_var=jnp.asarray([1.0, 1.0]),
        sub_len=jnp.asarray([40.0, 60.0]),
        omega=jnp.asarray([0.3, 1.0]),
        mod_var=jnp.asarray([1.5]),
        mod_len=jnp.asarray([300.0]),
        W=jnp.ones((2, 1)),
    )
    ssm = model.build_ssm(params)
    # Sabotage channel 0: unstable transition, undetectable observation.
    A = ssm.A.at[0].set(1.05 * jnp.eye(ssm.block_size))
    H = ssm.H.at[0].set(0.0)
    ssm_bad = ssm._replace(A=A, H=H)

    cfg = ihgp.IHGPConfig()
    tb_ref = ihgp.build_tables(ssm, cfg)
    tb_bad = ihgp.build_tables(ssm_bad, cfg)

    for field in ("Ph", "Gn", "hPph", "hPSh"):
        arr = np.asarray(getattr(tb_bad, field))
        assert np.all(np.isfinite(arr)), field
        # healthy channels (1, 2) unchanged
        np.testing.assert_allclose(
            arr[1:], np.asarray(getattr(tb_ref, field))[1:], rtol=1e-9
        )
