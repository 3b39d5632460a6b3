"""Control-sequence accuracy: production settings vs high-accuracy oracles.

BASELINE.md's parity bar is control-sequence RMSE <= 1e-3 against a
fully-converged solver at the same horizon. acados cannot run in this image
(tests/oracles/test_acados_parity.py covers it where it can); the oracles here
are (a) this framework's own solver pushed to its full convergence budget
(25 SQP x 30 IP iterations; float32 consts like every production path — it
bounds ITERATION-truncation error, not float32 rounding) over the initial
transient, and (b) the INDEPENDENT native C++ solver (native/ocp_solver.cpp:
double-precision dynamics/Jacobians/SQP state, its own Riccati + IP
implementation) driven closed-loop for a full 300-step episode at the bench's
production numerical settings — the external full-episode anchor.
"""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.control.mpc import MPC
from gpmpc_tpu.envs.drone import DroneFigureEightEnv
from gpmpc_tpu.models.quadrotor import TRUE_PARAMS
from gpmpc_tpu.models.symbolic import symbolic_attitude

Q = [8, 0.1, 8, 0.1, 8, 0.1, 0.5, 0.5, 0.5, 0.001, 0.001, 0.001]
R = [3, 3, 3, 0.1]


def test_production_solver_meets_1e3_control_rmse():
    env = DroneFigureEightEnv()
    model = symbolic_attitude(dt=0.02, params=TRUE_PARAMS)

    # High-accuracy oracle: full convergence budget (same f32 consts; bounds
    # the production config's truncated-iteration error).
    oracle = MPC(model, env.trajectory, Q, R, horizon=25, sqp_iters=25, qp_iters=30)
    # Production configuration (bench defaults).
    prod = MPC(model, env.trajectory, Q, R, horizon=25, sqp_iters=6, qp_iters=10)

    obs, _ = env.reset(seed=0)
    oracle.reset()
    prod.reset()
    u_oracle, u_prod = [], []
    for _ in range(15):
        uo = oracle.select_action(obs)
        up = prod.select_action(obs)
        u_oracle.append(uo)
        u_prod.append(up)
        # advance along the oracle's closed loop so both see identical states
        obs, _, _, _, _ = env.step(uo)

    rmse = np.sqrt(np.mean((np.asarray(u_oracle) - np.asarray(u_prod)) ** 2))
    assert rmse <= 1e-3, f"control-sequence RMSE {rmse} exceeds the 1e-3 parity bar"


@pytest.mark.slow
def test_lanes_backend_meets_1e3_control_rmse():
    """The Pallas lanes backend against the XLA path over a closed loop."""
    from gpmpc_tpu.control import gpmpc as gpmpc_mod
    from gpmpc_tpu.control import mpc as mpc_mod
    from gpmpc_tpu.control.gpmpc import GPMPC
    from gpmpc_tpu.envs.drone import env_step, env_reset

    prior = {"a": 12.1432, "b": 1.8118, "c": -72.08, "d": -7.5755,
             "e": 39.8653, "f": -72.08, "h": -7.5755, "l": 39.8653}
    env = DroneFigureEightEnv()
    model = symbolic_attitude(dt=0.02, params=prior)
    ctrl = GPMPC(model, env.trajectory, prior, horizon=8, q_mpc=Q, r_mpc=R,
                 sparse_gp=True, max_gp_samples=8, seed=0, max_gp_points=32,
                 sqp_iters=3, qp_iters=8)
    rng = np.random.default_rng(0)
    ctrl.train_gp(rng.normal(0, 0.3, (16, 7)).astype(np.float32),
                  rng.normal(0, 0.3, (16, 3)).astype(np.float32), lr=0.05, iterations=20)

    es, obs = env_reset(env.p, jax.random.PRNGKey(0))
    st_x = mpc_mod.init_state(8, 12, 4)
    st_l = jax.tree.map(lambda a: a[None], st_x)  # batch of 1 for the lanes path
    us_x, us_l = [], []
    for _ in range(4):
        u_x, st_x, _ = gpmpc_mod.select_action(
            model, ctrl.cfg, ctrl.consts, ctrl.gp_model, st_x, obs
        )
        u_l, st_l, _ = gpmpc_mod.batched_select_action_lanes(
            model, ctrl.cfg, ctrl.consts, ctrl.gp_model, st_l, obs[None], interpret=True
        )
        us_x.append(np.asarray(u_x))
        us_l.append(np.asarray(u_l[0]))
        es, obs, _, _, _ = env_step(env.p, es, u_x)
    rmse = np.sqrt(np.mean((np.asarray(us_x) - np.asarray(us_l)) ** 2))
    assert rmse <= 1e-3, rmse


@pytest.mark.slow
def test_full_episode_native_oracle_parity():
    """Full-episode external parity at production settings (VERDICT r2 item 3).

    A 300-step closed-loop figure-eight episode: the production solver runs
    the bench configuration's numerical settings (sqp 6 / qp 10 / Mehrotra —
    bench.py's defaults; the bench's lanes-only in-kernel qp_tol early-exit
    only skips iterations toward the same fixed point and is parity-locked
    separately by tests/test_pallas_ocp.py) while the INDEPENDENT native C++
    oracle (native/ocp_solver.cpp::gpmpc_native_mpc_solve — double-precision
    dynamics, Jacobians and SQP state, its own Riccati/IP) solves the same
    problem to full convergence each step and drives the plant. Control RMSE
    over the whole episode must meet the <= 1e-3 BASELINE bar.
    """
    from gpmpc_tpu.control import mpc as mpc_mod
    from gpmpc_tpu.envs import drone
    from gpmpc_tpu.models import quadrotor
    from gpmpc_tpu.ops.sqp import SqpConfig
    from gpmpc_tpu.runtime.native import NativeOcpSolver
    from gpmpc_tpu.utils.benchkit import Q_MPC, R_MPC, reference_prior_dict

    native = NativeOcpSolver()
    prior = reference_prior_dict()
    T, n_steps = 25, 300
    env_p = drone.EnvParams.ideal()
    env = DroneFigureEightEnv(env_p)
    model = symbolic_attitude(dt=0.02, params=prior)
    consts = mpc_mod.make_consts(model, env.trajectory, Q_MPC, R_MPC, horizon=T)
    cfg = SqpConfig(sqp_iters=6, qp_iters=10, qp_mehrotra=True)
    prod_step = jax.jit(
        lambda s, o: mpc_mod.select_action(model, cfg, consts, s, o)
    )

    params8 = np.asarray(
        [prior[k] for k in ("a", "b", "c", "d", "e", "f", "h", "l")], np.float32
    )
    qdiag = np.asarray(Q_MPC, np.float32)
    rdiag = np.asarray(R_MPC, np.float32)
    s_lo, s_hi = (np.asarray(b, np.float32) for b in quadrotor.state_bounds())
    u_lo, u_hi = (np.asarray(b, np.float32) for b in quadrotor.input_bounds())
    uref = np.tile(np.asarray([0.3234, 0, 0, 0], np.float32), (T, 1))

    env_state, obs = drone.env_reset(env_p, jax.random.PRNGKey(0))
    prod_state = mpc_mod.init_state(T, 12, 4)
    obs_np = np.asarray(obs, np.float32)
    X_warm = np.tile(obs_np[None], (T + 1, 1))
    U_warm = uref.copy()

    u_oracle_all, u_prod_all = [], []
    for t in range(n_steps):
        xref = np.asarray(
            mpc_mod.reference_window(consts.traj, jnp.asarray(t), T), np.float32
        )
        X_warm, U_warm = native.mpc_solve(
            params8, 0.02, obs_np, xref, uref, qdiag, rdiag, qdiag,
            s_lo, s_hi, u_lo, u_hi, X_warm, U_warm,
            sqp_iters=25, qp_iters=30, step_tol=1e-8,
        )
        u_o = U_warm[0]
        u_p, prod_state, _ = prod_step(prod_state, jnp.asarray(obs_np))
        u_oracle_all.append(u_o.copy())
        u_prod_all.append(np.asarray(u_p))
        # the ORACLE drives the plant; both controllers see identical states
        env_state, obs, _, _, _ = drone.env_step(env_p, env_state, jnp.asarray(u_o))
        obs_np = np.asarray(obs, np.float32)

    err = np.asarray(u_oracle_all) - np.asarray(u_prod_all)
    rmse = float(np.sqrt(np.mean(err**2)))
    assert rmse <= 1e-3, (
        f"full-episode control RMSE {rmse:.2e} vs the native f64 oracle "
        "exceeds the 1e-3 parity bar"
    )
