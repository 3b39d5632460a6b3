"""Controller tests: nominal MPC tracking, GP-MPC learning loop, tightening."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpmpc_tpu.control import gpmpc as gpmpc_mod
from gpmpc_tpu.control import mpc as mpc_mod
from gpmpc_tpu.control.gpmpc import GPMPC, propagate_constraint_limits
from gpmpc_tpu.control.mpc import MPC
from gpmpc_tpu.envs.drone import DroneFigureEightEnv, EnvParams
from gpmpc_tpu.models.quadrotor import TRUE_PARAMS, input_bounds
from gpmpc_tpu.models.symbolic import symbolic_attitude

PRIOR = {
    "a": 12.1432, "b": 1.8118, "c": -72.08, "d": -7.5755,
    "e": 39.8653, "f": -72.08, "h": -7.5755, "l": 39.8653,
}
Q = [8, 0.1, 8, 0.1, 8, 0.1, 0.5, 0.5, 0.5, 0.001, 0.001, 0.001]
R = [3, 3, 3, 0.1]


@pytest.fixture(scope="module")
def env():
    # Default 300-step (6 s) period: shorter periods demand accelerations beyond
    # the plant's authority. Tests only run the first few dozen steps.
    return DroneFigureEightEnv()


def rollout(env, ctrl, n=30, seed=0):
    obs, _ = env.reset(seed=seed)
    ctrl.reset()
    errs = []
    traj = np.asarray(env.trajectory)
    for i in range(n):
        u = ctrl.select_action(obs)
        obs, _, term, _, _ = env.step(u)
        ref = traj[(i + 1) % traj.shape[0]]
        errs.append(np.sqrt((obs[0] - ref[0]) ** 2 + (obs[2] - ref[2]) ** 2 + (obs[4] - ref[4]) ** 2))
        assert not term
    return np.asarray(errs)


def test_true_model_mpc_tracks_tightly():
    """Solver-quality oracle: with a perfect model of an ideal (pure-ODE) plant,
    tracking must be tight. Uses EnvParams.ideal() — the default plant carries
    structural mismatch (lag/drag/delay) that no 12-state model can cancel."""
    ideal_env = DroneFigureEightEnv(EnvParams.ideal())
    model = symbolic_attitude(dt=0.02, params=TRUE_PARAMS)
    ctrl = MPC(model, ideal_env.trajectory, Q, R, horizon=15, sqp_iters=6, qp_iters=8)
    errs = rollout(ideal_env, ctrl, n=30)
    assert errs[-10:].mean() < 0.05, f"tracking error too high: {errs[-10:].mean()}"


def test_mpc_respects_input_bounds(env):
    model = symbolic_attitude(dt=0.02, params=PRIOR)
    ctrl = MPC(model, env.trajectory, Q, R, horizon=10, sqp_iters=6, qp_iters=10)
    obs, _ = env.reset(seed=1)
    ctrl.reset()
    lu, uu = np.asarray(input_bounds()[0]), np.asarray(input_bounds()[1])
    for _ in range(5):
        u = ctrl.select_action(obs)
        assert np.all(u >= lu - 1e-4) and np.all(u <= uu + 1e-4), u
        obs, _, _, _, _ = env.step(u)


def test_gpmpc_improves_over_prior(env):
    """The core learning-loop contract: GP residual training improves tracking."""
    model = symbolic_attitude(dt=0.02, params=PRIOR)
    ctrl = GPMPC(
        model, env.trajectory, PRIOR, horizon=15, q_mpc=Q, r_mpc=R,
        sparse_gp=True, max_gp_samples=20, seed=1, sqp_iters=6, qp_iters=8,
        max_gp_points=64,
    )
    n = 60
    errs_prior = rollout(env, ctrl.prior_ctrl, n=n)

    obs, _ = env.reset(seed=0)
    ctrl.prior_ctrl.reset()
    X, U = [np.asarray(obs)], []
    for _ in range(n):
        u = ctrl.prior_ctrl.select_action(obs)
        obs, _, _, _, _ = env.step(u)
        X.append(np.asarray(obs))
        U.append(u)
    xi, ti = ctrl.preprocess_data(np.asarray(X[:-1]), np.asarray(U), np.asarray(X[1:]))
    assert xi.shape == (n, 7) and ti.shape == (n, 3)
    # the acc residual must reflect the engineered hover-thrust deficit (~4 m/s^2)
    assert 2.0 < ti[:, 0].mean() < 6.0

    ctrl.train_gp(xi, ti, lr=0.05, iterations=150)
    errs_gp = rollout(env, ctrl, n=n)
    # steady-state window shows the learned-residual benefit most clearly
    assert errs_gp[-20:].mean() < 0.6 * errs_prior[-20:].mean(), (
        errs_gp[-20:].mean(), errs_prior[-20:].mean(),
    )


def test_tightening_zero_until_trained_and_positive_after(env):
    model = symbolic_attitude(dt=0.02, params=PRIOR)
    ctrl = GPMPC(
        model, env.trajectory, PRIOR, horizon=8, q_mpc=Q, r_mpc=R,
        sparse_gp=True, max_gp_samples=10, seed=0, max_gp_points=32,
        sqp_iters=3, qp_iters=6,
    )
    state = mpc_mod.init_state(8, 12, 4)
    # untrained GP model: variance path must still be finite
    t_x, t_u = propagate_constraint_limits(ctrl.consts, ctrl.gp_model, state.X_warm, state.U_warm)
    assert np.all(np.isfinite(np.asarray(t_x))) and np.all(np.isfinite(np.asarray(t_u)))

    rng = np.random.default_rng(0)
    xi = rng.normal(0, 0.3, (20, 7)).astype(np.float32)
    ti = rng.normal(0, 0.5, (20, 3)).astype(np.float32)
    ctrl.train_gp(xi, ti, lr=0.05, iterations=50)
    t_x, t_u = propagate_constraint_limits(ctrl.consts, ctrl.gp_model, state.X_warm, state.U_warm)
    t_x, t_u = np.asarray(t_x), np.asarray(t_u)
    assert np.all(t_x >= 0) and np.all(t_u >= 0)
    # stage 0 state tightening is zero (cov starts at zero); later stages grow
    np.testing.assert_allclose(t_x[0], 0.0, atol=1e-7)
    assert t_x[1:].max() > 0
    # monotone-ish growth of the max tightening along the horizon
    assert t_x[-1].max() >= t_x[1].max()


def test_select_action_deterministic(env):
    model = symbolic_attitude(dt=0.02, params=PRIOR)
    ctrl = GPMPC(
        model, env.trajectory, PRIOR, horizon=6, q_mpc=Q, r_mpc=R,
        sparse_gp=False, seed=0, max_gp_points=16, sqp_iters=3, qp_iters=5,
    )
    obs = np.asarray(env.trajectory[0])
    ctrl.reset()
    u1 = ctrl.select_action(obs)
    ctrl.reset()
    u2 = ctrl.select_action(obs)
    np.testing.assert_array_equal(u1, u2)


def test_long_horizon_parallel_scan_controller():
    """BASELINE config "2x horizon": T=50 with the O(log T) associative-scan
    Riccati backend tracks the figure-eight (ideal plant: solver-quality test)."""
    ideal_env = DroneFigureEightEnv(EnvParams.ideal())
    model = symbolic_attitude(dt=0.02, params=TRUE_PARAMS)
    ctrl = MPC(model, ideal_env.trajectory, Q, R, horizon=50, sqp_iters=4, qp_iters=8,
               parallel_scan=True)
    errs = rollout(ideal_env, ctrl, n=25)
    assert np.all(np.isfinite(errs))
    assert errs[-5:].mean() < 0.06, errs[-5:]


def test_gpmpc_ard_option(env):
    """ARD lengthscales thread through training, dynamics, and tightening."""
    model = symbolic_attitude(dt=0.02, params=PRIOR)
    ctrl = GPMPC(
        model, env.trajectory, PRIOR, horizon=6, q_mpc=Q, r_mpc=R,
        sparse_gp=True, max_gp_samples=8, seed=0, max_gp_points=32,
        sqp_iters=2, qp_iters=5, ard_gp=True,
    )
    rng = np.random.default_rng(1)
    ctrl.train_gp(rng.normal(0, 0.3, (16, 7)).astype(np.float32),
                  rng.normal(0, 0.3, (16, 3)).astype(np.float32), lr=0.05, iterations=20)
    assert ctrl.gp_model.hypers.raw_lengthscale.shape == (3, 3)  # (GPs, dims)
    ctrl.reset()
    u = ctrl.select_action(np.asarray(env.trajectory[0]))
    assert np.all(np.isfinite(u))

    # ARD rides the FAST paths too (round-3): the lanes backend — fused GP
    # variance kernel + in-kernel linearizer with per-dim lengthscales — must
    # match the XLA path on the same batch.
    obs_b = jnp.asarray(env.trajectory[0])[None]
    st_b = jax.tree.map(lambda a: a[None], mpc_mod.init_state(6, 12, 4))
    cfg_fused = ctrl.cfg._replace(kernel_linearize=True)
    u_l, _, _ = gpmpc_mod.batched_select_action_lanes(
        model, cfg_fused, ctrl.consts, ctrl.gp_model, st_b, obs_b,
        interpret=True, var_backend="pallas",
    )
    np.testing.assert_allclose(np.asarray(u_l[0]), u, atol=5e-4)


def test_clamp_activation_is_reported(env):
    """When the GP is wildly uncertain, the tightening feasibility clamp fires
    and its activation MUST surface in MpcInfo.clamp_frac (VERDICT round 1:
    silent clamping distorts the advertised chance constraint)."""
    model = symbolic_attitude(dt=0.02, params=PRIOR)
    ctrl = GPMPC(
        model, env.trajectory, PRIOR, horizon=6, q_mpc=Q, r_mpc=R,
        sparse_gp=False, seed=0, max_gp_points=16, sqp_iters=2, qp_iters=5,
    )
    # Force enormous predictive variance: empty dataset (zero residual mean,
    # posterior variance = outputscale) with outputscale 1e4.
    gp = ctrl.gp_model
    ctrl.gp_model = gp._replace(
        hypers=gp.hypers._replace(raw_outputscale=jnp.full((3,), 1e4, jnp.float32)),
        trained=jnp.asarray(True),
    )

    obs = np.asarray(env.trajectory[0])
    ctrl.reset()
    ctrl.select_action(obs)  # step 0: tightening off by contract
    assert float(ctrl._last_info.clamp_frac) == 0.0
    u = ctrl.select_action(obs)  # step 1: tightening active and clamped
    assert np.all(np.isfinite(u))
    clamp = float(ctrl._last_info.clamp_frac)
    assert clamp > 0.0, "huge GP variance must trigger (and report) bound clamping"
    assert clamp <= 1.0
    # And a healthy GP must not clamp.
    rng = np.random.default_rng(0)
    ctrl2 = GPMPC(
        model, env.trajectory, PRIOR, horizon=6, q_mpc=Q, r_mpc=R,
        sparse_gp=False, seed=0, max_gp_points=16, sqp_iters=2, qp_iters=5,
    )
    ctrl2.train_gp(rng.normal(0, 0.3, (12, 7)).astype(np.float32),
                   (0.01 * rng.normal(0, 1, (12, 3))).astype(np.float32),
                   lr=0.05, iterations=30)
    ctrl2.reset()
    ctrl2.select_action(obs)
    ctrl2.select_action(obs)
    assert float(ctrl2._last_info.clamp_frac) == 0.0


def test_soft_constraints_graceful_and_reported(env):
    """With soft state bounds (L1 slack, ops/boxqp.py) an over-uncertain GP no
    longer needs the 45% clamp: the full tightening is passed through (even if
    the box crosses), the solve stays finite, and the violation is REPORTED in
    MpcInfo.soft_viol (VERDICT round 1, item 6)."""
    model = symbolic_attitude(dt=0.02, params=PRIOR)
    ctrl = GPMPC(
        model, env.trajectory, PRIOR, horizon=6, q_mpc=Q, r_mpc=R,
        sparse_gp=False, seed=0, max_gp_points=16, sqp_iters=2, qp_iters=8,
        soft_constraints=50.0,
    )
    gp = ctrl.gp_model
    # Variance so large the tightening exceeds the box width: the tightened
    # state box CROSSES (lx > ux) — unsolvable for the hard QP without a clamp.
    ctrl.gp_model = gp._replace(
        hypers=gp.hypers._replace(raw_outputscale=jnp.full((3,), 1e8, jnp.float32)),
        trained=jnp.asarray(True),
    )
    obs = np.asarray(env.trajectory[0])
    ctrl.reset()
    ctrl.select_action(obs)  # step 0: tightening off by contract
    u = ctrl.select_action(obs)  # step 1: huge tightening, soft solve
    assert np.all(np.isfinite(u))
    info = ctrl._last_info
    # State tightening is NOT clamped in soft mode (only inputs may clamp) ...
    assert float(info.soft_viol) > 1.0, "crossed soft box must report violation"
    # ... and the action stays within the hard input bounds.
    from gpmpc_tpu.models import quadrotor
    lu, uu = quadrotor.input_bounds()
    assert np.all(u >= np.asarray(lu) - 1e-5) and np.all(u <= np.asarray(uu) + 1e-5)

    # A healthy (tiny-variance) GP under the same soft config violates nothing
    # and matches the hard controller's action.
    rng = np.random.default_rng(0)
    x_tr = rng.normal(0, 0.3, (12, 7)).astype(np.float32)
    y_tr = (0.01 * rng.normal(0, 1, (12, 3))).astype(np.float32)
    ctrl_soft = GPMPC(
        model, env.trajectory, PRIOR, horizon=6, q_mpc=Q, r_mpc=R,
        sparse_gp=False, seed=0, max_gp_points=16, sqp_iters=2, qp_iters=8,
        soft_constraints=50.0,
    )
    ctrl_hard = GPMPC(
        model, env.trajectory, PRIOR, horizon=6, q_mpc=Q, r_mpc=R,
        sparse_gp=False, seed=0, max_gp_points=16, sqp_iters=2, qp_iters=8,
    )
    for c in (ctrl_soft, ctrl_hard):
        c.train_gp(x_tr, y_tr, lr=0.05, iterations=30)
        c.reset()
        c.select_action(obs)
    u_soft = ctrl_soft.select_action(obs)
    u_hard = ctrl_hard.select_action(obs)
    assert float(ctrl_soft._last_info.soft_viol) < 1e-4
    np.testing.assert_allclose(u_soft, u_hard, atol=2e-3)
