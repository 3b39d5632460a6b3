"""Checkpoint/resume and profiling utilities."""

import numpy as np
import jax.numpy as jnp

from gpmpc_tpu.utils.checkpoint import ExperimentCheckpoint, load_pytree, save_pytree
from gpmpc_tpu.utils.profiling import PhaseTimer, SolveCounter


def test_pytree_roundtrip(tmp_path):
    tree = {
        "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "nested": {"b": jnp.ones(4, jnp.int32)},
    }
    save_pytree(tmp_path / "ck", tree, metadata={"epoch": 3})
    like = {"a": jnp.zeros((2, 3), jnp.float32), "nested": {"b": jnp.zeros(4, jnp.int32)}}
    loaded = load_pytree(tmp_path / "ck", like)
    np.testing.assert_array_equal(np.asarray(loaded["a"]), np.asarray(tree["a"]))
    np.testing.assert_array_equal(np.asarray(loaded["nested"]["b"]), np.asarray(tree["nested"]["b"]))


def test_experiment_checkpoint_roundtrip(tmp_path):
    from gpmpc_tpu.control.gpmpc import GPMPC
    from gpmpc_tpu.envs.drone import DroneFigureEightEnv, EnvParams
    from gpmpc_tpu.models.symbolic import symbolic_attitude

    prior = {"a": 12.0, "b": 1.8, "c": -72.0, "d": -7.5, "e": 39.0, "f": -72.0, "h": -7.5, "l": 39.0}
    env = DroneFigureEightEnv(EnvParams.default()._replace(n_steps=32, traj_amplitude=0.1))
    model = symbolic_attitude(dt=0.02, params=prior)
    kw = dict(
        horizon=5, q_mpc=[1] * 12, r_mpc=[1] * 4, sparse_gp=True, max_gp_samples=4,
        max_gp_points=16, sqp_iters=2, qp_iters=4,
    )
    ctrl = GPMPC(model, env.trajectory, prior, **kw)
    rng = np.random.default_rng(0)
    xi = rng.normal(0, 0.3, (8, 7)).astype(np.float32)
    ti = rng.normal(0, 0.3, (8, 3)).astype(np.float32)
    ctrl.train_gp(xi, ti, lr=0.05, iterations=10)

    ck = ExperimentCheckpoint(tmp_path)
    rng_save = np.random.default_rng(42)
    rng_save.integers(100, size=7)  # advance the state
    runs = {0: {"obs": np.zeros((5, 12)), "action": np.zeros((4, 4)),
                "inference_time_data": [0.1, 0.2]}}
    ck.save(epoch=2, ctrl=ctrl, x_train=xi, y_train=ti, rng=rng_save,
            train_runs=runs, test_runs=runs)
    assert ck.latest_epoch() == 2

    ctrl2 = GPMPC(model, env.trajectory, prior, **kw)
    rng_load = np.random.default_rng(0)
    x_r, y_r, tr, te = ck.restore(2, ctrl2, rng=rng_load)
    np.testing.assert_array_equal(x_r, xi)
    # RNG state restored bit-exactly: next draws match
    np.testing.assert_array_equal(
        rng_load.integers(1000, size=5), rng_save.integers(1000, size=5)
    )
    # runs restored
    assert 0 in tr and tr[0]["obs"].shape == (5, 12)
    assert te[0]["inference_time_data"] == [0.1, 0.2]
    # restored controller must produce the identical action
    obs = np.asarray(env.trajectory[0])
    ctrl.reset()
    ctrl2.reset()
    np.testing.assert_allclose(ctrl.select_action(obs), ctrl2.select_action(obs), atol=1e-7)


def test_phase_timer_and_counter():
    pt = PhaseTimer()
    for _ in range(3):
        with pt.phase("solve"):
            pass
    st = pt.stats("solve")
    assert st["n"] == 2  # first sample dropped
    assert "solve" in pt.table()

    sc = SolveCounter()
    with sc.window(100):
        pass
    assert sc.solves == 100 and sc.solves_per_sec > 0
