"""Multi-seed learning sweep (parallel/sweep.py): one program, S independent runs.

The sweep is the framework's statistical-evaluation counterpart of the reference
driver's single-seed learn() loop (run_gp_mpc.py:86-137); these tests check the
semantics on tiny shapes (CPU): per-seed independence, prior-baseline row,
dataset accumulation, and that the per-seed GP pytrees really differ.
"""

import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.control.gpmpc import GPMPC
from gpmpc_tpu.envs.drone import DroneFigureEightEnv, EnvParams
from gpmpc_tpu.models.symbolic import symbolic_attitude
from gpmpc_tpu.parallel.sweep import seed_sweep
import pytest

PRIOR = {
    "a": 12.1432, "b": 1.8118, "c": -72.08, "d": -7.5755,
    "e": 39.8653, "f": -72.08, "h": -7.5755, "l": 39.8653,
}
Q = [8, 0.1, 8, 0.1, 8, 0.1, 0.5, 0.5, 0.5, 0.001, 0.001, 0.001]
R = [3, 3, 3, 0.1]


def _setup(horizon=6, n_epochs=2, samples=10):
    env_params = EnvParams.default()._replace(n_steps=64, traj_amplitude=0.1)
    env = DroneFigureEightEnv(env_params)
    model = symbolic_attitude(dt=0.02, params=PRIOR)
    cap = n_epochs * samples
    ctrl = GPMPC(
        model, env.trajectory, PRIOR, horizon=horizon, q_mpc=Q, r_mpc=R,
        sparse_gp=True, max_gp_samples=8, seed=0, max_gp_points=cap,
        sqp_iters=3, qp_iters=5,
    )
    return env_params, model, ctrl


def test_seed_sweep_shapes_and_baseline():
    n_seeds, n_epochs, n_steps, samples = 3, 2, 24, 10
    env_params, model, ctrl = _setup(n_epochs=n_epochs, samples=samples)
    res = seed_sweep(
        model, ctrl.cfg, env_params, ctrl.consts, PRIOR,
        n_seeds=n_seeds, n_epochs=n_epochs, n_steps=n_steps,
        samples_per_epoch=samples, max_inducing=8,
        gp_iters=10, gp_lr=0.05, master_seed=7,
    )
    assert res.costs.shape == (n_epochs + 1, n_seeds)
    assert np.all(np.isfinite(np.asarray(res.costs)))
    assert np.all(np.asarray(res.costs) >= 0.0)  # cumulative squared error
    np.testing.assert_array_equal(
        np.asarray(res.n_points), np.arange(n_epochs + 1) * samples
    )
    # Final GP ensembles: per-seed leaves, all marked trained, and genuinely
    # different across seeds (independent data -> different hyperposteriors).
    assert res.gp.Z.shape == (n_seeds, 3, n_epochs * samples, 3)
    assert bool(jnp.all(res.gp.trained))
    alpha = np.asarray(res.gp.alpha_s)
    assert not np.allclose(alpha[0], alpha[1])


@pytest.mark.slow
def test_seed_sweep_seeds_differ_and_reproduce():
    env_params, model, ctrl = _setup()
    kwargs = dict(
        n_seeds=2, n_epochs=1, n_steps=20, samples_per_epoch=8,
        max_inducing=8, gp_iters=5, gp_lr=0.05,
    )
    res_a = seed_sweep(model, ctrl.cfg, env_params, ctrl.consts, PRIOR,
                       master_seed=1, **kwargs)
    res_b = seed_sweep(model, ctrl.cfg, env_params, ctrl.consts, PRIOR,
                       master_seed=1, **kwargs)
    res_c = seed_sweep(model, ctrl.cfg, env_params, ctrl.consts, PRIOR,
                       master_seed=2, **kwargs)
    # Same master seed -> bit-identical sweep; different master seed -> different.
    np.testing.assert_array_equal(np.asarray(res_a.costs), np.asarray(res_b.costs))
    assert not np.array_equal(np.asarray(res_a.costs), np.asarray(res_c.costs))
    # Within a sweep the two seeds see different data and different eval episodes.
    assert not np.allclose(np.asarray(res_a.costs[:, 0]), np.asarray(res_a.costs[:, 1]))


@pytest.mark.slow
def test_seed_sweep_sharded_matches_unsharded():
    from gpmpc_tpu.parallel.mesh import make_mesh

    env_params, model, ctrl = _setup()
    kwargs = dict(
        n_seeds=8, n_epochs=1, n_steps=16, samples_per_epoch=8,
        max_inducing=8, gp_iters=5, gp_lr=0.05, master_seed=3,
    )
    res = seed_sweep(model, ctrl.cfg, env_params, ctrl.consts, PRIOR, **kwargs)
    res_m = seed_sweep(model, ctrl.cfg, env_params, ctrl.consts, PRIOR,
                       mesh=make_mesh(8), **kwargs)
    np.testing.assert_allclose(
        np.asarray(res_m.costs), np.asarray(res.costs), rtol=1e-5, atol=1e-6
    )
