"""Cartpole model family: the solver stack is model-agnostic (nx=4, nu=1).

Drives the SAME `control/mpc.py` + `ops/sqp.py` path the quadrotor uses with a
completely different model — different state/input dimensions, different
bounds, zero input reference — and checks it stabilizes the unstable upright
equilibrium.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.control import mpc as mpc_mod
from gpmpc_tpu.models import cartpole
from gpmpc_tpu.ops.sqp import SqpConfig

Q = [5.0, 0.1, 20.0, 0.5]
R = [0.05]
T = 50  # 1 s lookahead: short horizons let the cart drift into its box bound
DT = 0.02


def make_setup():
    model = cartpole.symbolic_cartpole(dt=DT)
    traj = cartpole.upright_reference(64)
    consts = mpc_mod.make_consts(
        model, traj, Q, R, horizon=T,
        bounds=(cartpole.state_bounds(), cartpole.input_bounds()),
    )
    cfg = SqpConfig(sqp_iters=8, qp_iters=12)
    return model, consts, cfg


def test_cartpole_mpc_stabilizes_upright():
    model, consts, cfg = make_setup()
    state = mpc_mod.init_state(T, cartpole.NX, cartpole.NU)
    # U_warm defaults to zeros for non-quadrotor models (no hover trim).
    assert np.allclose(np.asarray(state.U_warm), 0.0)

    x = jnp.asarray([0.3, 0.0, 0.25, 0.0], jnp.float32)  # off-center, tilted
    step = jax.jit(lambda s, o: mpc_mod.select_action(model, cfg, consts, s, o))
    for _ in range(150):
        u, state, info = step(state, x)
        x = model.fd_func(x, u)  # nominal plant = exact model
    xf = np.asarray(x)
    assert np.all(np.isfinite(xf))
    assert abs(xf[cartpole.IDX_THETA]) < 0.01, xf  # pole upright
    assert abs(xf[cartpole.IDX_X]) < 0.06, xf  # cart back near origin
    assert float(info.qp_gap) < 1e-4


def test_cartpole_batched_matches_single():
    model, consts, cfg = make_setup()
    B = 4
    rng = np.random.default_rng(0)
    obs = jnp.asarray(
        rng.normal(0, 0.1, (B, cartpole.NX)).astype(np.float32)
    )
    states = jax.vmap(lambda _: mpc_mod.init_state(T, cartpole.NX, cartpole.NU))(
        jnp.arange(B)
    )
    step = lambda s, o: mpc_mod.select_action(model, cfg, consts, s, o)  # noqa: E731
    u_b, _, _ = jax.vmap(step)(states, obs)
    u_1, _, _ = step(mpc_mod.init_state(T, cartpole.NX, cartpole.NU), obs[2])
    np.testing.assert_allclose(np.asarray(u_b[2]), np.asarray(u_1), atol=1e-5)


def test_cartpole_respects_input_bounds():
    model, consts, cfg = make_setup()
    state = mpc_mod.init_state(T, cartpole.NX, cartpole.NU)
    x = jnp.asarray([0.0, 0.0, 0.6, 0.0], jnp.float32)  # large tilt -> saturates
    u, _, _ = mpc_mod.select_action(model, cfg, consts, state, x)
    lo, hi = cartpole.input_bounds()
    assert float(u[0]) <= float(hi[0]) + 1e-5
    assert float(u[0]) >= float(lo[0]) - 1e-5


def test_cartpole_lanes_backend_matches_xla():
    """nu=1 through the full lane-packed GP-MPC step (the lane-wise Cholesky
    is n-generic since round 3): lanes backend vs vmapped XLA parity."""
    from gpmpc_tpu.control import gpmpc as gpmpc_mod
    from gpmpc_tpu.control.gpmpc import GPMPC
    from gpmpc_tpu.envs import cartpole_env

    envp = cartpole_env.EnvParams.default()._replace(
        n_steps=64, traj_period_steps=300
    )
    traj = cartpole_env.make_trajectory(envp)
    model = cartpole.symbolic_cartpole(dt=DT)
    ctrl = GPMPC(
        model, traj, None, horizon=8, q_mpc=[5.0, 0.1, 20.0, 0.5], r_mpc=[0.05],
        sparse_gp=True, max_gp_samples=8, seed=0, max_gp_points=32,
        sqp_iters=2, qp_iters=6,
        bounds=(cartpole.state_bounds(), cartpole.input_bounds()),
    )
    rng = np.random.default_rng(0)
    ctrl.train_gp(
        rng.normal(0, 0.2, (16, ctrl.spec.z_dim)).astype(np.float32),
        rng.normal(0, 0.2, (16, ctrl.spec.num_gps)).astype(np.float32),
        lr=0.05, iterations=10,
    )
    B = 3
    obs = jnp.asarray(
        np.asarray(traj[:B]) + 0.02 * rng.normal(size=(B, cartpole.NX)), jnp.float32
    )
    states = jax.vmap(lambda _: mpc_mod.init_state(8, cartpole.NX, cartpole.NU))(
        jnp.arange(B)
    )
    u_x, st_x, _ = jax.vmap(
        lambda s, o: gpmpc_mod.select_action(
            model, ctrl.cfg, ctrl.consts, ctrl.gp_model, s, o
        )
    )(states, obs)
    u_l, st_l, _ = gpmpc_mod.batched_select_action_lanes(
        model, ctrl.cfg, ctrl.consts, ctrl.gp_model, states, obs, interpret=True
    )
    np.testing.assert_allclose(np.asarray(u_l), np.asarray(u_x), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(st_l.X_warm), np.asarray(st_x.X_warm), atol=5e-3
    )
