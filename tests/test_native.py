"""Native C++ OCP solver: cross-validation oracle vs the JAX solvers."""

import numpy as np
import jax.numpy as jnp
import pytest

from gpmpc_tpu.ops.boxqp import OcpQpData, solve_ocp_qp

T, NX, NU = 8, 12, 4


@pytest.fixture(scope="module")
def native():
    from gpmpc_tpu.runtime.native import NativeOcpSolver

    return NativeOcpSolver()


def make_qp(seed=0):
    rng = np.random.default_rng(seed)
    A = np.tile(np.eye(NX, dtype=np.float32), (T, 1, 1)) + 0.08 * rng.normal(
        size=(T, NX, NX)
    ).astype(np.float32)
    B = (rng.normal(size=(T, NX, NU)) * 0.4).astype(np.float32)
    r = (rng.normal(size=(T, NX)) * 0.05).astype(np.float32)
    qdiag = rng.uniform(0.5, 2.0, (T + 1, NX)).astype(np.float32)
    qx = (rng.normal(size=(T + 1, NX)) * 0.4).astype(np.float32)
    rdiag = rng.uniform(0.5, 2.0, (T, NU)).astype(np.float32)
    ru = (rng.normal(size=(T, NU)) * 0.4).astype(np.float32)
    lx = np.full((T + 1, NX), -1.2, np.float32)
    ux = np.full((T + 1, NX), 1.2, np.float32)
    lu = np.full((T, NU), -0.25, np.float32)
    uu = np.full((T, NU), 0.25, np.float32)
    lx[0] = -1e8
    ux[0] = 1e8
    return dict(A=A, B=B, r=r, qdiag=qdiag, qx=qx, rdiag=rdiag, ru=ru,
                lx=lx, ux=ux, lu=lu, uu=uu)


@pytest.mark.parametrize("seed", [0, 3])
def test_native_matches_jax_solver(native, seed):
    d = make_qp(seed)
    dx_n, du_n = native.solve(**d, n_ip=15)
    qp = OcpQpData(
        A=jnp.asarray(d["A"]), B=jnp.asarray(d["B"]), r=jnp.asarray(d["r"]),
        Qxx=jnp.asarray(np.stack([np.diag(q) for q in d["qdiag"]])),
        qx=jnp.asarray(d["qx"]),
        Ruu=jnp.asarray(np.stack([np.diag(q) for q in d["rdiag"]])),
        ru=jnp.asarray(d["ru"]),
        lx=jnp.asarray(d["lx"]), ux=jnp.asarray(d["ux"]),
        lu=jnp.asarray(d["lu"]), uu=jnp.asarray(d["uu"]),
    )
    sol = solve_ocp_qp(qp, n_iter=15)
    np.testing.assert_allclose(du_n, np.asarray(sol.du), atol=5e-4)
    np.testing.assert_allclose(dx_n, np.asarray(sol.dx), atol=5e-4)


def test_native_respects_bounds(native):
    d = make_qp(7)
    dx_n, du_n = native.solve(**d, n_ip=20)
    assert du_n.max() <= 0.25 + 1e-5 and du_n.min() >= -0.25 - 1e-5
    assert dx_n[1:].max() <= 1.2 + 1e-4 and dx_n[1:].min() >= -1.2 - 1e-4


def test_native_full_mpc_closed_loop_parity(native):
    """The native full-stack MPC (C++ dynamics + FD Jacobians + SQP + IP) drives
    the same closed loop as the JAX MPC within the 1e-3 control RMSE bar — a
    fully independent implementation of the whole controller."""
    from gpmpc_tpu.control.mpc import MPC
    from gpmpc_tpu.envs.drone import DroneFigureEightEnv
    from gpmpc_tpu.models import quadrotor
    from gpmpc_tpu.models.quadrotor import TRUE_PARAMS
    from gpmpc_tpu.models.symbolic import symbolic_attitude
    from gpmpc_tpu.envs.drone import params_to_array

    q = [8, 0.1, 8, 0.1, 8, 0.1, 0.5, 0.5, 0.5, 0.001, 0.001, 0.001]
    r = [3, 3, 3, 0.1]
    horizon, n_steps = 15, 10
    env = DroneFigureEightEnv()
    model = symbolic_attitude(dt=0.02, params=TRUE_PARAMS)
    ctrl = MPC(model, env.trajectory, q, r, horizon=horizon, sqp_iters=12, qp_iters=15)

    traj = np.asarray(env.trajectory)
    params8 = np.asarray(params_to_array(TRUE_PARAMS))
    s_low, s_high = (np.asarray(b) for b in quadrotor.state_bounds())
    u_low, u_high = (np.asarray(b) for b in quadrotor.input_bounds())
    uref = np.tile(np.asarray(quadrotor.U_EQ)[None], (horizon, 1))

    obs, _ = env.reset(seed=0)
    ctrl.reset()
    X_warm = np.tile(np.asarray(obs)[None], (horizon + 1, 1)).astype(np.float32)
    U_warm = uref.astype(np.float32)
    us_jax, us_nat = [], []
    for step in range(n_steps):
        u_jax = ctrl.select_action(obs)
        idx = np.arange(step, step + horizon + 1) % traj.shape[0]
        X_warm, U_warm = native.mpc_solve(
            params8, 0.02, np.asarray(obs), traj[idx], uref,
            np.asarray(q), np.asarray(r), np.asarray(q),
            s_low, s_high, u_low, u_high,
            X_warm, U_warm, sqp_iters=12, qp_iters=15,
        )
        us_jax.append(u_jax)
        us_nat.append(U_warm[0].copy())
        obs, _, _, _, _ = env.step(u_jax)

    rmse = np.sqrt(np.mean((np.asarray(us_jax) - np.asarray(us_nat)) ** 2))
    assert rmse <= 1e-3, f"native vs JAX full-MPC control RMSE {rmse}"
