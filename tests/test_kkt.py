"""KKT-residual exit criteria (SqpConfig.kkt_tol, ops/sqp.py::kkt_residuals).

The reference's acados solver exits on stationarity/feasibility residual norms
(nlp_solver options at /root/reference/gpmpc/mpc.py:113-120) and reports a
failure status when it cannot converge (mpc.py:185). These tests pin the
framework's analogue: residuals in MpcInfo, and converged=False — not a silent
return — when a deliberately ill-conditioned problem exhausts the iteration
budget.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.control import mpc as mpc_mod
from gpmpc_tpu.models.symbolic import symbolic_attitude
from gpmpc_tpu.models.trajectory import figure_eight_trajectory
from gpmpc_tpu.ops.sqp import SqpConfig

Q12 = [8.0, 0.1, 8.0, 0.1, 8.0, 0.1, 0.1, 0.1, 0.1, 0.01, 0.01, 0.01]
R4 = [0.1, 0.1, 0.1, 0.1]


def _quad_setup(dt=0.02, horizon=15, **cfg_kw):
    model = symbolic_attitude(dt=dt)
    traj = figure_eight_trajectory(n_steps=64, dt=dt)
    consts = mpc_mod.make_consts(model, traj, Q12, R4, horizon=horizon)
    return model, consts, SqpConfig(**cfg_kw)


def test_converged_solve_reports_small_residuals():
    model, consts, cfg = _quad_setup(
        sqp_iters=10, qp_iters=15, kkt_tol=1e-3
    )
    state = mpc_mod.init_state(15, 12, 4)
    obs = jnp.asarray(consts.traj[0])
    _, state, info = jax.jit(
        lambda s, o: mpc_mod.select_action(model, cfg, consts, s, o)
    )(state, obs)
    assert bool(info.converged)
    assert float(info.eq_res) < 1e-3
    assert float(info.stat_res) < 1e-3
    assert int(info.n_iters) < 10  # residual exit happened before the cap


def test_kkt_exit_is_stricter_than_step_exit():
    """A solve that satisfies the step-norm criterion at a loose step_tol but
    not the KKT tolerance must keep iterating (or report non-convergence) —
    the step-norm alone can be fooled by a stalled QP."""
    model, consts, _ = _quad_setup()
    state = mpc_mod.init_state(15, 12, 4)
    obs = jnp.asarray(consts.traj[0]) + 0.15  # off-reference start

    # Loose step tolerance, one QP iteration: the first SQP step is small-ish
    # but the iterate is far from stationary.
    cfg_step = SqpConfig(sqp_iters=1, qp_iters=1, step_tol=1e30)
    _, _, info_step = mpc_mod.select_action(model, cfg_step, consts, state, obs)
    assert bool(info_step.converged)  # step criterion alone is satisfied

    cfg_kkt = cfg_step._replace(kkt_tol=1e-6)
    _, _, info_kkt = mpc_mod.select_action(model, cfg_kkt, consts, state, obs)
    assert not bool(info_kkt.converged)  # residuals expose the non-stationarity
    assert float(info_kkt.stat_res) > 1e-6 or float(info_kkt.eq_res) > 1e-6


def test_ill_conditioned_problem_reports_nonconvergence():
    """RK4 at dt = 0.25 s is far outside the quadrotor attitude dynamics'
    stability region: the SQP cannot close the dynamics defect in its budget
    and must say so instead of silently returning."""
    model, consts, cfg = _quad_setup(
        dt=0.25, horizon=10, sqp_iters=3, qp_iters=8, kkt_tol=1e-6
    )
    state = mpc_mod.init_state(10, 12, 4)
    obs = jnp.asarray(consts.traj[0]) + jnp.asarray(
        [1.0, 2.0, -1.0, 2.0, 0.5, -2.0, 0.3, -0.3, 0.2, 1.0, -1.0, 0.5],
        jnp.float32,
    )
    _, _, info = mpc_mod.select_action(model, cfg, consts, state, obs)
    assert not bool(info.converged)
    assert float(info.eq_res) > 1e-6 or float(info.stat_res) > 1e-6
    assert int(info.n_iters) == 3  # exhausted the budget


def test_lanes_backend_reports_matching_residuals():
    """The lanes SQP must report the same residuals as the XLA path (interpret
    mode; parity within float32 noise)."""
    from gpmpc_tpu.models import quadrotor
    from gpmpc_tpu.ops.sqp import OcpBounds, OcpCost, sqp_solve
    from gpmpc_tpu.ops.sqp_lanes import sqp_solve_batch_lanes

    model = symbolic_attitude(dt=0.02)
    T, nx, nu, B = 10, 12, 4, 3
    cfg = SqpConfig(sqp_iters=4, qp_iters=8, kkt_tol=1e-4)
    (lx, ux), (lu, uu) = quadrotor.state_bounds(), quadrotor.input_bounds()
    rng = np.random.default_rng(3)
    traj = figure_eight_trajectory(n_steps=64, dt=0.02)
    obs = jnp.asarray(
        np.asarray(traj[0])[None] + rng.normal(0, 0.05, (B, nx))
    ).astype(jnp.float32)
    xref = jnp.tile(traj[: T + 1][None], (B, 1, 1))
    scale = jnp.full((T + 1,), 0.02, jnp.float32).at[-1].set(1.0)
    cost_b = OcpCost(
        xref=xref, uref=jnp.tile(quadrotor.U_EQ[None], (T, 1)),
        Q=jnp.diag(jnp.asarray(Q12, jnp.float32)),
        R=jnp.diag(jnp.asarray(R4, jnp.float32)),
        Qe=jnp.diag(jnp.asarray(Q12, jnp.float32)),
        scale=scale,
    )
    bounds_b = OcpBounds(
        lx=jnp.tile(lx[None, None], (B, T + 1, 1)),
        ux=jnp.tile(ux[None, None], (B, T + 1, 1)),
        lu=jnp.tile(lu[None, None], (B, T, 1)),
        uu=jnp.tile(uu[None, None], (B, T, 1)),
    )
    X0 = jnp.tile(obs[:, None], (1, T + 1, 1))
    U0 = jnp.tile(quadrotor.U_EQ[None, None], (B, T, 1))

    sol_l = sqp_solve_batch_lanes(
        model.fd_func, cost_b, bounds_b, obs, X0, U0, cfg, interpret=True
    )
    for b in range(B):
        cost_1 = cost_b._replace(xref=cost_b.xref[b])
        bounds_1 = OcpBounds(*[leaf[b] for leaf in bounds_b])
        sol_1 = sqp_solve(
            model.fd_func, cost_1, bounds_1, obs[b], X0[b], U0[b], cfg
        )
        assert bool(sol_l.converged[b]) == bool(sol_1.converged)
        np.testing.assert_allclose(
            float(sol_l.eq_res[b]), float(sol_1.eq_res), rtol=1e-3, atol=1e-6
        )
        np.testing.assert_allclose(
            float(sol_l.stat_res[b]), float(sol_1.stat_res), rtol=1e-3, atol=1e-5
        )
