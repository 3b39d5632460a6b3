"""Tests for the quadrotor dynamics, symbolic-model layer, trajectory, and env."""

import jax
import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.models import quadrotor
from gpmpc_tpu.models.quadrotor import GRAVITY, PRIOR_PARAMS, TRUE_PARAMS, U_EQ
from gpmpc_tpu.models.symbolic import symbolic_attitude
from gpmpc_tpu.models.trajectory import figure_eight_trajectory
from gpmpc_tpu.envs.drone import DroneFigureEightEnv, EnvParams, env_reset, env_step


def test_equilibrium_hover_true_params():
    """At hover attitude, vertical acceleration = thrust map - g."""
    x = jnp.zeros(12)
    u = jnp.array([0.3234, 0.0, 0.0, 0.0])
    f = quadrotor.continuous_dynamics(x, u, TRUE_PARAMS)
    dd_z = TRUE_PARAMS.a * 0.3234 + TRUE_PARAMS.b - GRAVITY
    np.testing.assert_allclose(float(f[5]), dd_z, rtol=1e-6)
    # position/attitude rows mirror velocity states exactly
    assert float(f[0]) == 0.0 and float(f[6]) == 0.0


def test_prior_params_hover_deficit():
    """The prior fit underestimates hover thrust — the residual the GP must learn."""
    acc = PRIOR_PARAMS.a * float(U_EQ[0]) + PRIOR_PARAMS.b
    assert acc < GRAVITY - 3.0  # ~5.74 vs 9.81


def test_jacobian_structure():
    """AD Jacobian of f matches hand-derived entries at the origin."""
    model = symbolic_attitude(dt=0.02)
    x = jnp.zeros(12)
    u = U_EQ
    dfdx, dfdu = model.df_func(x, u)
    dfdx = np.asarray(dfdx)
    dfdu = np.asarray(dfdu)
    p = model.params
    # d(dd_phi)/d(phi) = c, /d(d_phi) = d; d(dd_theta)/d(theta) = f, /d(d_theta) = h
    np.testing.assert_allclose(dfdx[9, 6], p.c, rtol=1e-5)
    np.testing.assert_allclose(dfdx[9, 9], p.d, rtol=1e-5)
    np.testing.assert_allclose(dfdx[10, 7], p.f, rtol=1e-5)
    np.testing.assert_allclose(dfdx[10, 10], p.h, rtol=1e-5)
    # At origin: d(dd_x)/d(theta) = acc, d(dd_y)/d(phi) = -acc
    acc = p.a * float(U_EQ[0]) + p.b
    np.testing.assert_allclose(dfdx[1, 7], acc, rtol=1e-5)
    np.testing.assert_allclose(dfdx[3, 6], -acc, rtol=1e-5)
    # d(dd_z)/d(T) = a at hover attitude
    np.testing.assert_allclose(dfdu[5, 0], p.a, rtol=1e-5)
    np.testing.assert_allclose(dfdu[9, 1], p.e, rtol=1e-5)
    np.testing.assert_allclose(dfdu[10, 2], p.l, rtol=1e-5)


def test_rk4_against_fine_euler():
    """RK4 with dt=0.02 tracks a fine-grained Euler integration."""
    model = symbolic_attitude(dt=0.02)
    x = jnp.asarray(np.linspace(-0.1, 0.1, 12), jnp.float64)
    u = jnp.array([0.35, 0.05, -0.05, 0.0], jnp.float64)
    x_rk4 = model.fd_func(x, u)
    xe = x
    n = 2000
    for _ in range(n):
        xe = xe + (0.02 / n) * model.fc_func(xe, u)
    np.testing.assert_allclose(np.asarray(x_rk4), np.asarray(xe), atol=1e-5)


def test_trajectory_periodic_and_consistent():
    traj = figure_eight_trajectory(n_steps=300, dt=0.02)
    assert traj.shape == (300, 12)
    t = np.asarray(traj)
    # velocity rows are the time derivative of position rows (finite-diff check)
    dx_fd = (np.roll(t[:, 0], -1) - np.roll(t[:, 0], 1)) / (2 * 0.02)
    np.testing.assert_allclose(dx_fd, t[:, 1], atol=2e-3)
    # wraparound continuity
    np.testing.assert_allclose(t[0, [0, 2, 4]], [0.0, 0.0, 1.0], atol=1e-6)


def test_env_reset_step_shapes_and_determinism():
    p = EnvParams.default()
    s1, obs1 = env_reset(p, jax.random.PRNGKey(7))
    s2, obs2 = env_reset(p, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(obs1), np.asarray(obs2))
    action = jnp.array([0.47, 0.0, 0.0, 0.0])
    s1b, obs, reward, term, trunc = env_step(p, s1, action)
    assert obs.shape == (12,)
    assert not bool(term)
    # thrust above hover -> climbs, once it clears the actuation delay + rotor
    # lag of the high-fidelity default plant (a few control periods)
    s = s1b
    for _ in range(4):
        s, obs, *_ = env_step(p, s, action)
    assert float(obs[5]) > float(obs1[5])


def test_env_wrapper_api():
    env = DroneFigureEightEnv()
    obs, _ = env.reset(seed=0)
    assert obs.shape == (12,)
    obs, r, term, trunc, _ = env.step(np.array([0.47, 0, 0, 0]))
    assert np.isfinite(r)
    assert env.trajectory.shape == (300, 12)


def test_env_step_dynamic_matches_static():
    from gpmpc_tpu.envs.drone import env_step_dynamic, params_to_array

    p = EnvParams.default()
    s, obs = env_reset(p, jax.random.PRNGKey(3))
    a = jnp.array([0.45, 0.02, -0.02, 0.0])
    s1, o1, r1, t1, _ = env_step(p, s, a)
    s2, o2, r2, t2, _ = env_step_dynamic(p, params_to_array(p.params), s, a)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)
    np.testing.assert_allclose(float(r1), float(r2), atol=1e-6)


def test_domain_randomized_batch():
    from gpmpc_tpu.envs.drone import env_step_dynamic, randomize_params

    p = EnvParams.default()
    B = 5
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    params_b = jax.vmap(lambda k: randomize_params(k, p.params, scale=0.1))(keys)
    assert params_b.shape == (B, 8)
    # distinct plants
    assert np.std(np.asarray(params_b)[:, 0]) > 0
    states, obs0 = jax.vmap(lambda k: env_reset(p, k))(keys)
    a = jnp.tile(jnp.array([0.45, 0.0, 0.0, 0.0])[None], (B, 1))
    _, obs, _, term, _ = jax.vmap(lambda pa, s, aa: env_step_dynamic(p, pa, s, aa))(
        params_b, states, a
    )
    assert np.all(np.isfinite(np.asarray(obs)))
    # different params -> different vertical acceleration responses
    dz = np.asarray(obs)[:, 5]
    assert np.std(dz) > 1e-4
