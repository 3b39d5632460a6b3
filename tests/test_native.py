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


@pytest.mark.slow
def test_native_full_gpmpc_episode_parity(native):
    """Round-3: the external oracle covers the FULL GP-MPC controller, not
    just the nominal MPC. A 300-step closed-loop figure-eight episode with a
    trained sparse GP: per step the native C++ oracle recomputes the
    chance-constraint tightening from ITS OWN previous solution (double
    precision, independent implementation of the variance + covariance
    recursion) and solves the GP-augmented OCP to full convergence
    (finite-difference Jacobians through the SE-kernel residual); the
    production solver (jnp, Mehrotra, production iteration budget) sees the
    same observations. Control RMSE <= 1e-3 over the whole episode."""
    import jax
    import jax.numpy as jnp

    from gpmpc_tpu.control import gpmpc as gpmpc_mod
    from gpmpc_tpu.control import mpc as mpc_mod
    from gpmpc_tpu.control.gpmpc import GPMPC
    from gpmpc_tpu.envs import drone
    from gpmpc_tpu.models import quadrotor
    from gpmpc_tpu.models.symbolic import symbolic_attitude
    from gpmpc_tpu.utils.benchkit import (
        Q_MPC, R_MPC, reference_prior_dict, synthetic_residual_dataset,
    )

    prior = reference_prior_dict()
    T_h, n_steps = 25, 300
    env_p = drone.EnvParams.ideal()
    env = drone.DroneFigureEightEnv(env_p)
    model = symbolic_attitude(dt=0.02, params=prior)
    ctrl = GPMPC(
        model, env.trajectory, prior, horizon=T_h, q_mpc=Q_MPC, r_mpc=R_MPC,
        sparse_gp=True, max_gp_samples=20, seed=1, max_gp_points=64,
        sqp_iters=6, qp_iters=10,
    )
    ctrl.cfg = ctrl.cfg._replace(qp_mehrotra=True)  # bench numerical settings
    x7, y3 = synthetic_residual_dataset(48, seed=3)
    ctrl.train_gp(np.asarray(x7), np.asarray(y3), lr=0.05, iterations=60)
    gp = ctrl.gp_model
    prod_step = jax.jit(
        lambda g, s, o: gpmpc_mod.select_action(model, ctrl.cfg, ctrl.consts, g, s, o)
    )

    # Extract the GP + consts in oracle form (double precision).
    ell = np.asarray(jax.nn.softplus(gp.hypers.raw_lengthscale), np.float64)
    inv_ell2 = np.broadcast_to((1.0 / (ell * ell)).reshape(3, -1), (3, 3))
    sf2 = np.asarray(jax.nn.softplus(gp.hypers.raw_outputscale), np.float64)
    noise = np.asarray(jax.nn.softplus(gp.hypers.raw_noise), np.float64) + 1e-6
    Ad = np.asarray(ctrl.consts.Ad, np.float64)
    Bd_in = np.asarray(ctrl.consts.Bd_in, np.float64)
    Kg = np.asarray(ctrl.consts.lqr_gain, np.float64)
    ppf = float(ctrl.consts.inverse_cdf)
    dt = float(ctrl.consts.dt)
    params8 = np.asarray([prior[k] for k in "abcdefhl"], np.float32)
    qdiag = np.asarray(Q_MPC, np.float32)
    rdiag = np.asarray(R_MPC, np.float32)
    s_lo, s_hi = (np.asarray(b, np.float64) for b in quadrotor.state_bounds())
    u_lo, u_hi = (np.asarray(b, np.float64) for b in quadrotor.input_bounds())
    uref = np.tile(np.asarray([0.3234, 0, 0, 0], np.float32), (T_h, 1))
    traj = np.asarray(env.trajectory, np.float32)

    env_state, obs = drone.env_reset(env_p, jax.random.PRNGKey(0))
    obs_np = np.asarray(obs, np.float32)
    prod_state = mpc_mod.init_state(T_h, 12, 4)
    X_warm = np.tile(obs_np[None], (T_h + 1, 1)).astype(np.float32)
    U_warm = uref.copy()

    u_oracle_all, u_prod_all = [], []
    for t in range(n_steps):
        # Oracle-side bound policy, mirroring _bounds_from_tightening: zero
        # tightening at step 0, 45% feasibility clamp afterwards.
        if t == 0:
            t_x = np.zeros((T_h + 1, 12))
            t_u = np.zeros((T_h, 4))
        else:
            t_x, t_u = native.tighten(
                X_warm.astype(np.float64), U_warm.astype(np.float64),
                np.asarray(gp.var_Z), np.asarray(gp.var_mat),
                np.asarray(gp.var_mask), inv_ell2, sf2, noise,
                Ad, Bd_in, Kg, ppf, dt,
            )
            t_x = np.minimum(t_x, 0.45 * (s_hi - s_lo))
            t_u = np.minimum(t_u, 0.45 * (u_hi - u_lo))
        lx_s = np.tile(s_lo[None], (T_h + 1, 1)) + t_x
        ux_s = np.tile(s_hi[None], (T_h + 1, 1)) - t_x
        lu_s = np.tile(u_lo[None], (T_h, 1)) + t_u
        uu_s = np.tile(u_hi[None], (T_h, 1)) - t_u
        xref = np.asarray(
            traj[(t + np.arange(T_h + 1)) % traj.shape[0]], np.float32
        )
        X_warm, U_warm = native.gpmpc_solve(
            params8, dt, np.asarray(gp.Zs, np.float64),
            np.asarray(gp.alpha_s, np.float64), inv_ell2, sf2,
            obs_np, xref, uref, qdiag, rdiag, qdiag,
            lx_s, ux_s, lu_s, uu_s, X_warm, U_warm,
            sqp_iters=25, qp_iters=30, step_tol=1e-8,
        )
        u_o = U_warm[0]
        u_p, prod_state, _ = prod_step(gp, prod_state, jnp.asarray(obs_np))
        u_oracle_all.append(u_o.copy())
        u_prod_all.append(np.asarray(u_p))
        env_state, obs, _, _, _ = drone.env_step(env_p, env_state, jnp.asarray(u_o))
        obs_np = np.asarray(obs, np.float32)

    err = np.asarray(u_oracle_all) - np.asarray(u_prod_all)
    rmse = float(np.sqrt(np.mean(err**2)))
    assert rmse <= 1e-3, (
        f"full-episode GP-MPC control RMSE {rmse:.2e} vs the native oracle "
        "exceeds the 1e-3 parity bar"
    )


@pytest.mark.slow
@pytest.mark.parametrize("family", ["cartpole", "twolink"])
def test_native_family_gpmpc_episode_parity(native, family):
    """Round-4: closed-loop GP-MPC parity for the NON-quadrotor families
    through the family-generic native oracle (gpmpc_native_family_gpmpc_solve
    + _family_tighten). acados remains unbuildable here (zero network egress —
    tests/oracles/logs/acados_build_attempt_r4.log), so the independent C++
    implementation anchors solution quality for every family: per step the
    oracle recomputes the chance tightening from ITS OWN previous solution and
    solves the GP-augmented OCP to convergence (FD Jacobians through the SE
    residual, double precision); the production jnp solver sees the same
    observations. Control RMSE <= 1e-3 over the episode."""
    import jax
    import jax.numpy as jnp

    from gpmpc_tpu.control import gpmpc as gpmpc_mod
    from gpmpc_tpu.control import mpc as mpc_mod
    from gpmpc_tpu.control.gpmpc import GPMPC
    from gpmpc_tpu.envs import cartpole_env, twolink_env
    from gpmpc_tpu.models import cartpole as cartpole_mod
    from gpmpc_tpu.models import twolink as twolink_mod

    T_h, n_steps = 20, 120
    rng = np.random.default_rng(5)
    if family == "cartpole":
        env = cartpole_env.CartpoleTrackEnv(cartpole_env.EnvParams.default())
        model = cartpole_mod.symbolic_cartpole(dt=0.02)
        ctrl = GPMPC(
            model, env.trajectory, None, horizon=T_h,
            q_mpc=[5.0, 0.1, 20.0, 0.5], r_mpc=[0.05],
            sparse_gp=True, max_gp_samples=20, seed=1, max_gp_points=64,
            sqp_iters=6, qp_iters=10,
            bounds=(cartpole_mod.state_bounds(), cartpole_mod.input_bounds()),
        )
        params = np.asarray(
            [model.params.m_cart, model.params.m_pole, model.params.length]
        )
        # synthetic residual dataset in z-space (benchkit recipe)
        xz = np.zeros((48, 4), np.float32)
        xz[:, 0] = rng.normal(0, 0.5, 48)
        xz[:, 1] = rng.normal(0, 0.2, 48)
        xz[:, 2] = rng.normal(0, 0.5, 48)
        xz[:, 3] = rng.uniform(-6, 6, 48)
        y = np.stack(
            [-0.4 * xz[:, 0] + 0.12 * xz[:, 3], -0.5 * xz[:, 2] - 0.3 * xz[:, 1]],
            axis=1,
        ).astype(np.float32)
    else:
        env = twolink_env.TwoLinkTrackEnv(twolink_env.EnvParams.default())
        model = twolink_mod.symbolic_twolink(dt=0.02)
        ctrl = GPMPC(
            model, env.trajectory, None, horizon=T_h,
            q_mpc=[20.0, 20.0, 0.5, 0.5], r_mpc=[0.1, 0.1],
            sparse_gp=True, max_gp_samples=20, seed=1, max_gp_points=64,
            sqp_iters=8, qp_iters=10, lm_reg=0.0,
            bounds=(twolink_mod.state_bounds(), twolink_mod.input_bounds()),
        )
        p = model.params
        params = np.asarray([p.m1, p.m2, p.l1, p.l2])
        xz = np.zeros((48, 6), np.float32)
        xz[:, 0] = rng.uniform(-2.0, 0.0, 48)
        xz[:, 1] = rng.uniform(0.0, 1.5, 48)
        xz[:, 2:4] = rng.normal(0, 0.5, (48, 2))
        xz[:, 4:] = rng.uniform(-1.0, 1.0, (48, 2))
        y = np.stack(
            [0.6 + 0.3 * np.sin(xz[:, 1]) + 0.5 * xz[:, 4],
             -0.8 - 0.4 * xz[:, 2] + 0.4 * xz[:, 5]],
            axis=1,
        ).astype(np.float32)

    ctrl.cfg = ctrl.cfg._replace(qp_mehrotra=True)
    ctrl.train_gp(xz, y, lr=0.05, iterations=60)
    gp = ctrl.gp_model
    prod_step = jax.jit(
        lambda g, s, o: gpmpc_mod.select_action(model, ctrl.cfg, ctrl.consts, g, s, o)
    )

    G, D = ctrl.spec.num_gps, ctrl.spec.gp_input_dim
    ell = np.asarray(jax.nn.softplus(gp.hypers.raw_lengthscale), np.float64)
    inv_ell2 = np.broadcast_to((1.0 / (ell * ell)).reshape(G, -1), (G, D)).copy()
    sf2 = np.asarray(jax.nn.softplus(gp.hypers.raw_outputscale), np.float64)
    noise = np.asarray(jax.nn.softplus(gp.hypers.raw_noise), np.float64) + 1e-6
    Ad = np.asarray(ctrl.consts.Ad, np.float64)
    Bd_in = np.asarray(ctrl.consts.Bd_in, np.float64)
    Kg = np.asarray(ctrl.consts.lqr_gain, np.float64)
    ppf = float(ctrl.consts.inverse_cdf)
    dt = float(ctrl.consts.dt)
    nx, nu = model.nx, model.nu
    qdiag = np.asarray(np.diagonal(np.asarray(ctrl.consts.mpc.Q)), np.float32)
    rdiag = np.asarray(np.diagonal(np.asarray(ctrl.consts.mpc.R)), np.float32)
    s_lo = np.asarray(ctrl.consts.mpc.lx, np.float64)
    s_hi = np.asarray(ctrl.consts.mpc.ux, np.float64)
    u_lo = np.asarray(ctrl.consts.mpc.lu, np.float64)
    u_hi = np.asarray(ctrl.consts.mpc.uu, np.float64)
    uref = np.asarray(ctrl.consts.mpc.uref, np.float32)
    traj = np.asarray(env.trajectory, np.float32)

    obs, _ = env.reset(seed=0)
    obs_np = np.asarray(obs, np.float32)
    prod_state = mpc_mod.init_state(T_h, nx, nu)
    X_warm = np.tile(obs_np[None], (T_h + 1, 1)).astype(np.float32)
    U_warm = uref.copy()

    u_oracle_all, u_prod_all = [], []
    for t in range(n_steps):
        if t == 0:
            t_x = np.zeros((T_h + 1, nx))
            t_u = np.zeros((T_h, nu))
        else:
            t_x, t_u = native.family_tighten(
                family, X_warm.astype(np.float64), U_warm.astype(np.float64),
                np.asarray(gp.var_Z), np.asarray(gp.var_mat),
                np.asarray(gp.var_mask), inv_ell2, sf2, noise,
                Ad, Bd_in, Kg, ppf, dt,
            )
            t_x = np.minimum(t_x, 0.45 * (s_hi - s_lo))
            t_u = np.minimum(t_u, 0.45 * (u_hi - u_lo))
        lx_s = np.tile(s_lo[None], (T_h + 1, 1)) + t_x
        ux_s = np.tile(s_hi[None], (T_h + 1, 1)) - t_x
        lu_s = np.tile(u_lo[None], (T_h, 1)) + t_u
        uu_s = np.tile(u_hi[None], (T_h, 1)) - t_u
        xref = np.asarray(traj[(t + np.arange(T_h + 1)) % traj.shape[0]], np.float32)
        X_warm, U_warm = native.family_gpmpc_solve(
            family, params, dt, np.asarray(gp.Zs, np.float64),
            np.asarray(gp.alpha_s, np.float64), inv_ell2, sf2,
            obs_np, xref, uref, qdiag, rdiag, qdiag,
            lx_s, ux_s, lu_s, uu_s, X_warm, U_warm,
            sqp_iters=25, qp_iters=30, step_tol=1e-8,
        )
        u_o = U_warm[0]
        u_p, prod_state, _ = prod_step(gp, prod_state, jnp.asarray(obs_np))
        u_oracle_all.append(u_o.copy())
        u_prod_all.append(np.asarray(u_p))
        obs, _, _, _, _ = env.step(u_o)
        obs_np = np.asarray(obs, np.float32)

    err = np.asarray(u_oracle_all) - np.asarray(u_prod_all)
    rmse = float(np.sqrt(np.mean(err**2)))
    assert rmse <= 1e-3, (
        f"{family} full-episode GP-MPC control RMSE {rmse:.2e} vs the native "
        "oracle exceeds the 1e-3 parity bar"
    )
