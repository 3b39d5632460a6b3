"""CPU acados parity harness (external oracle; BASELINE.md config 1).

Runs only where `acados_template` + CasADi are installed (not in this image —
acados requires a source build, see /root/reference/install_acados.sh). Where
available, it builds the SAME nominal OCP in acados (RK4-discretized quadrotor
attitude dynamics, LINEAR_LS cost with W = blkdiag(Q, R), box constraints as
h(x,u) <= tol rows, SQP + HPIPM, matching /root/reference/gpmpc/mpc.py:90-163's
solver options) and checks the per-step control sequence of our jitted SQP solver
against it at RMSE <= 1e-3 — the BASELINE.json parity bar.
"""

import numpy as np
import pytest

acados = pytest.importorskip("acados_template")
cs = pytest.importorskip("casadi")

from gpmpc_tpu.control.mpc import MPC  # noqa: E402
from gpmpc_tpu.envs.drone import DroneFigureEightEnv  # noqa: E402
from gpmpc_tpu.models import quadrotor  # noqa: E402
from gpmpc_tpu.models.symbolic import symbolic_attitude  # noqa: E402

Q_MPC = [8, 0.1, 8, 0.1, 8, 0.1, 0.5, 0.5, 0.5, 0.001, 0.001, 0.001]
R_MPC = [3, 3, 3, 0.1]
HORIZON = 25
DT = 0.02


def build_casadi_dynamics(p: quadrotor.QuadrotorParams):
    """Independent CasADi expression of the attitude dynamics (test-only)."""
    x = cs.MX.sym("x", 12)
    u = cs.MX.sym("u", 4)
    g = quadrotor.GRAVITY
    phi, theta, psi = x[6], x[7], x[8]
    acc = p.a * u[0] + p.b
    dd_x = acc * (cs.cos(phi) * cs.sin(theta) * cs.cos(psi) + cs.sin(phi) * cs.sin(psi))
    dd_y = acc * (cs.cos(phi) * cs.sin(theta) * cs.sin(psi) - cs.sin(phi) * cs.cos(psi))
    dd_z = acc * cs.cos(phi) * cs.cos(theta) - g
    dd_phi = p.c * phi + p.d * x[9] + p.e * u[1]
    dd_theta = p.f * theta + p.h * x[10] + p.l * u[2]
    xdot = cs.vertcat(
        x[1], dd_x, x[3], dd_y, x[5], dd_z, x[9], x[10], x[11], dd_phi, dd_theta, 0
    )
    return x, u, xdot


def build_acados_solver(tmpdir):
    import scipy.linalg
    from acados_template import AcadosModel, AcadosOcp, AcadosOcpSolver

    p = quadrotor.PRIOR_PARAMS
    x, u, xdot = build_casadi_dynamics(p)
    fc = cs.Function("fc", [x, u], [xdot])
    k1 = fc(x, u)
    k2 = fc(x + DT / 2 * k1, u)
    k3 = fc(x + DT / 2 * k2, u)
    k4 = fc(x + DT * k3, u)
    f_disc = x + DT / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

    model = AcadosModel()
    model.x, model.u, model.disc_dyn_expr, model.name = x, u, f_disc, "parity_mpc"

    ocp = AcadosOcp()
    ocp.model = model
    nx, nu = 12, 4
    ocp.cost.cost_type = ocp.cost.cost_type_e = "LINEAR_LS"
    ocp.cost.W = scipy.linalg.block_diag(np.diag(Q_MPC), np.diag(R_MPC))
    ocp.cost.W_e = np.diag(Q_MPC)
    ocp.cost.Vx = np.vstack([np.eye(nx), np.zeros((nu, nx))])
    ocp.cost.Vu = np.vstack([np.zeros((nx, nu)), np.eye(nu)])
    ocp.cost.Vx_e = np.eye(nx)
    ocp.cost.yref = np.zeros(nx + nu)
    ocp.cost.yref_e = np.zeros(nx)
    ocp.constraints.x0 = np.zeros(nx)

    s_low, s_high = (np.asarray(b) for b in quadrotor.state_bounds())
    u_low, u_high = (np.asarray(b) for b in quadrotor.input_bounds())
    dim = 12
    A_s = np.vstack((-np.eye(dim), np.eye(dim)))
    b_s = np.hstack((-s_low, s_high))
    A_u = np.vstack((-np.eye(4), np.eye(4)))
    b_u = np.hstack((-u_low, u_high))
    cnstr = cs.vertcat(cs.MX(A_s) @ x - b_s, cs.MX(A_u) @ u - b_u)
    term = cs.MX(A_s) @ x - b_s
    ocp.model.con_h_expr_0 = cnstr
    ocp.model.con_h_expr = cnstr
    ocp.model.con_h_expr_e = term
    ocp.dims.nh_0 = ocp.dims.nh = 32
    ocp.dims.nh_e = 24
    for attr, size in (("uh_0", 32), ("uh", 32), ("uh_e", 24)):
        setattr(ocp.constraints, attr, 1e-8 * np.ones(size))
    for attr, size in (("lh_0", 32), ("lh", 32), ("lh_e", 24)):
        setattr(ocp.constraints, attr, -1e8 * np.ones(size))

    ocp.solver_options.N_horizon = HORIZON
    ocp.solver_options.qp_solver = "PARTIAL_CONDENSING_HPIPM"
    ocp.solver_options.hessian_approx = "GAUSS_NEWTON"
    ocp.solver_options.integrator_type = "DISCRETE"
    ocp.solver_options.nlp_solver_type = "SQP"
    ocp.solver_options.nlp_solver_max_iter = 25
    ocp.solver_options.tf = HORIZON * DT
    ocp.code_export_directory = str(tmpdir / "c_generated")
    return AcadosOcpSolver(ocp, json_file=str(tmpdir / "parity.json"), verbose=False)


def test_control_sequence_parity_vs_acados(tmp_path):
    env = DroneFigureEightEnv()
    traj = np.asarray(env.trajectory)
    model = symbolic_attitude(dt=DT)
    ours = MPC(model, traj, Q_MPC, R_MPC, horizon=HORIZON, sqp_iters=25, qp_iters=20)
    acados_solver = build_acados_solver(tmp_path)

    obs, _ = env.reset(seed=0)
    ours.reset()
    u_ours_seq, u_acados_seq = [], []
    for step in range(40):
        obs_np = np.asarray(obs, np.float64)
        # acados solve with identical reference window
        acados_solver.set(0, "lbx", obs_np)
        acados_solver.set(0, "ubx", obs_np)
        idx = np.arange(step, step + HORIZON + 1) % traj.shape[0]
        goal = traj[idx].T
        y_ref = np.concatenate((goal[:, :-1], np.tile(ours.U_EQ[:, None], HORIZON)), axis=0)
        for k in range(HORIZON):
            acados_solver.set(k, "yref", y_ref[:, k])
        acados_solver.set(HORIZON, "yref", goal[:, -1])
        status = acados_solver.solve()
        assert status in (0, 2)
        u_ac = acados_solver.get(0, "u")

        u_ours = ours.select_action(obs)
        u_ours_seq.append(u_ours)
        u_acados_seq.append(u_ac)
        # Follow the acados closed loop so both see identical states.
        obs, _, _, _, _ = env.step(u_ac.astype(np.float32))

    rmse = np.sqrt(np.mean((np.asarray(u_ours_seq) - np.asarray(u_acados_seq)) ** 2))
    assert rmse <= 1e-3, f"control-sequence RMSE vs acados: {rmse}"
