"""Quaternion observation adapters and high-fidelity plant structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpmpc_tpu.envs import drone
from gpmpc_tpu.envs.drone import EnvParams
from gpmpc_tpu.utils.observations import (
    ang_vel_to_rpy_rates,
    euler_to_quat,
    flatten_obs,
    quat_to_euler,
)


def test_quat_euler_round_trip():
    rng = np.random.default_rng(0)
    rpy = rng.uniform(-1.0, 1.0, (50, 3))  # away from gimbal lock
    rpy[:, 1] *= 0.9
    back = np.asarray(quat_to_euler(euler_to_quat(jnp.asarray(rpy))))
    np.testing.assert_allclose(back, rpy, atol=1e-5)


def test_quat_to_euler_matches_scipy():
    scipy = pytest.importorskip("scipy")
    from scipy.spatial.transform import Rotation as R

    rng = np.random.default_rng(1)
    q = rng.normal(size=(20, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    ours = np.asarray(quat_to_euler(jnp.asarray(q)))
    # ≙ the reference's R.from_quat(quat).as_euler("xyz") (run_gp_mpc.py:35)
    theirs = R.from_quat(q).as_euler("xyz")
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_rpy_rates_identity_at_level_attitude():
    # At zero roll/pitch, body rates ARE the Euler rates.
    w = jnp.asarray([0.3, -0.2, 0.1])
    out = np.asarray(ang_vel_to_rpy_rates(w, jnp.zeros(3)))
    np.testing.assert_allclose(out, np.asarray(w), atol=1e-7)


def test_flatten_obs_layout():
    obs = {
        "pos": jnp.asarray([1.0, 2.0, 3.0]),
        "quat": euler_to_quat(jnp.asarray([0.1, -0.2, 0.3])),
        "vel": jnp.asarray([4.0, 5.0, 6.0]),
        "ang_vel": jnp.asarray([0.0, 0.0, 0.0]),
    }
    x = np.asarray(flatten_obs(obs))
    assert x.shape == (12,)
    np.testing.assert_allclose(x[[0, 2, 4]], [1.0, 2.0, 3.0], atol=1e-6)  # pos
    np.testing.assert_allclose(x[[1, 3, 5]], [4.0, 5.0, 6.0], atol=1e-6)  # vel
    np.testing.assert_allclose(x[6:9], [0.1, -0.2, 0.3], atol=1e-5)  # rpy


def _rollout_states(p: EnvParams, n=30, u=(0.45, 0.05, 0.0, 0.0), seed=3):
    state, obs = drone.env_reset(p, jax.random.PRNGKey(seed))
    action = jnp.asarray(u, jnp.float32)
    xs = []
    for _ in range(n):
        state, obs, *_ = drone.env_step(p, state, action)
        xs.append(np.asarray(obs))
    return np.asarray(xs)


def test_default_plant_has_structural_mismatch():
    """Lag + drag + delay make the default plant visibly different from the
    pure-ODE model class (the prior can fit the ideal plant exactly — the
    whole point of the fidelity upgrade is that it cannot fit this one)."""
    ideal = _rollout_states(EnvParams.ideal())
    real = _rollout_states(EnvParams.default())
    # Same commands, same coefficients -> ideal and high-fidelity diverge.
    assert np.abs(ideal - real)[:, [1, 3, 5]].max() > 0.05


def test_ideal_plant_matches_model_class():
    """EnvParams.ideal() must integrate exactly the symbolic model's ODE."""
    from gpmpc_tpu.models import quadrotor

    p = EnvParams.ideal(init_noise=0.0)
    state, obs = drone.env_reset(p, jax.random.PRNGKey(0))
    u = jnp.asarray([0.4, 0.02, -0.01, 0.0], jnp.float32)
    state, obs2, *_ = drone.env_step(p, state, u)

    fc = lambda x_, u_: quadrotor.continuous_dynamics(x_, u_, params=quadrotor.TRUE_PARAMS)
    x = obs
    sub = p.dt / p.sim_substeps
    for _ in range(p.sim_substeps):
        x = quadrotor.rk4(fc, x, u, sub)
    np.testing.assert_allclose(np.asarray(obs2), np.asarray(x), atol=1e-6)


def test_actuation_delay_defers_command_effect():
    """With delay_steps=1, the first step must integrate under the hover trim,
    not the newly issued command."""
    p_nodelay = EnvParams.ideal(init_noise=0.0)
    p_delay = EnvParams.ideal(init_noise=0.0, delay_steps=1)
    u = jnp.asarray([0.59, 0.3, 0.0, 0.0], jnp.float32)

    s0, _ = drone.env_reset(p_nodelay, jax.random.PRNGKey(0))
    _, x_nodelay, *_ = drone.env_step(p_nodelay, s0, u)
    s0d, _ = drone.env_reset(p_delay, jax.random.PRNGKey(0))
    s1d, x_delay, *_ = drone.env_step(p_delay, s0d, u)

    assert not np.allclose(np.asarray(x_nodelay), np.asarray(x_delay))
    # After the queue drains, the delayed plant sees the command too.
    _, x_delay2, *_ = drone.env_step(p_delay, s1d, u)
    assert np.abs(np.asarray(x_delay2)[6] - np.asarray(x_nodelay)[6]) < np.abs(
        np.asarray(x_delay)[6] - np.asarray(x_nodelay)[6]
    ) + 1e-9 or np.asarray(x_delay2)[9] != 0


def test_process_noise_is_optional_and_reproducible():
    p = EnvParams.ideal(init_noise=0.0, noise_std=0.5)
    u = jnp.asarray([0.4, 0.0, 0.0, 0.0], jnp.float32)
    s, _ = drone.env_reset(p, jax.random.PRNGKey(7))
    _, x1, *_ = drone.env_step(p, s, u)
    s2, _ = drone.env_reset(p, jax.random.PRNGKey(7))
    _, x2, *_ = drone.env_step(p, s2, u)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))  # same key
    p0 = EnvParams.ideal(init_noise=0.0)
    s3, _ = drone.env_reset(p0, jax.random.PRNGKey(7))
    _, x3, *_ = drone.env_step(p0, s3, u)
    assert not np.allclose(np.asarray(x1), np.asarray(x3))  # noise does act
