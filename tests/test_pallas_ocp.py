"""Lane-packed Pallas IP solver parity vs the XLA reference solver (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.ops.boxqp import OcpQpData, solve_ocp_qp
import pytest

from gpmpc_tpu.ops.pallas_ocp import (
    LanesQp,
    solve_ocp_qp_lanes,
    solve_ocp_qp_lanes_streamed,
)

T, NX, NU, L = 5, 12, 4, 8


def make_batch(seed=0, t=T, scale=1.0):
    rng = np.random.default_rng(seed)
    # `scale` < 1 contracts the dynamics perturbation — long random horizons
    # (the streamed-kernel tests) need stable A products to stay conditioned.
    A = np.tile(np.eye(NX, dtype=np.float32), (L, t, 1, 1)) + (
        0.1 * scale
    ) * rng.normal(size=(L, t, NX, NX)).astype(np.float32)
    B = rng.normal(size=(L, t, NX, NU)).astype(np.float32) * 0.4
    r = rng.normal(size=(L, t, NX)).astype(np.float32) * 0.05
    qdiag = rng.uniform(0.5, 2.0, size=(L, t + 1, NX)).astype(np.float32)
    qx = rng.normal(size=(L, t + 1, NX)).astype(np.float32) * 0.5
    rdiag = rng.uniform(0.5, 2.0, size=(L, t, NU)).astype(np.float32)
    ru = rng.normal(size=(L, t, NU)).astype(np.float32) * 0.5
    lx = np.full((L, t + 1, NX), -1.5, np.float32)
    ux = np.full((L, t + 1, NX), 1.5, np.float32)
    lu = np.full((L, t, NU), -0.3, np.float32)
    uu = np.full((L, t, NU), 0.3, np.float32)
    # disable stage-0 state bounds (x0 pinned), like the SQP does
    lx[:, 0, :] = -1e8
    ux[:, 0, :] = 1e8
    return dict(A=A, B=B, r=r, qdiag=qdiag, qx=qx, rdiag=rdiag, ru=ru,
                lx=lx, ux=ux, lu=lu, uu=uu)


def to_lanes(d):
    """(L, ...) batch-leading -> (..., L) lanes-trailing."""
    return LanesQp(**{k: jnp.asarray(np.moveaxis(v, 0, -1)) for k, v in d.items()})


def reference_solutions(d, n_iter):
    dxs, dus = [], []
    for b in range(L):
        qp = OcpQpData(
            A=jnp.asarray(d["A"][b]), B=jnp.asarray(d["B"][b]), r=jnp.asarray(d["r"][b]),
            Qxx=jnp.asarray(np.stack([np.diag(q) for q in d["qdiag"][b]])),
            qx=jnp.asarray(d["qx"][b]),
            Ruu=jnp.asarray(np.stack([np.diag(q) for q in d["rdiag"][b]])),
            ru=jnp.asarray(d["ru"][b]),
            lx=jnp.asarray(d["lx"][b]), ux=jnp.asarray(d["ux"][b]),
            lu=jnp.asarray(d["lu"][b]), uu=jnp.asarray(d["uu"][b]),
        )
        sol = solve_ocp_qp(qp, n_iter=n_iter)
        dxs.append(np.asarray(sol.dx))
        dus.append(np.asarray(sol.du))
    return np.stack(dxs), np.stack(dus)


def test_lanes_ip_matches_reference():
    d = make_batch(0)
    n_iter = 12
    qp_lanes = to_lanes(d)
    dx, du, gap = solve_ocp_qp_lanes(qp_lanes, n_ip=n_iter, interpret=True)
    assert np.all(np.asarray(gap) < 1e-4)
    dx = np.moveaxis(np.asarray(dx), -1, 0)  # (L, T+1, NX)
    du = np.moveaxis(np.asarray(du), -1, 0)
    dx_ref, du_ref = reference_solutions(d, n_iter)
    np.testing.assert_allclose(du, du_ref, atol=2e-4)
    np.testing.assert_allclose(dx, dx_ref, atol=2e-4)


def test_lanes_ip_respects_bounds():
    d = make_batch(1)
    qp_lanes = to_lanes(d)
    dx, du, _ = solve_ocp_qp_lanes(qp_lanes, n_ip=15, interpret=True)
    assert np.asarray(du).max() <= 0.3 + 1e-4
    assert np.asarray(du).min() >= -0.3 - 1e-4
    # stage 1..T states inside their boxes
    assert np.asarray(dx)[1:].max() <= 1.5 + 1e-3
    assert np.asarray(dx)[1:].min() >= -1.5 - 1e-3


def test_batched_lanes_step_matches_xla_step():
    """Full GP-MPC step parity: lanes backend vs vmapped XLA backend."""
    from gpmpc_tpu.control import gpmpc as gpmpc_mod
    from gpmpc_tpu.control import mpc as mpc_mod
    from gpmpc_tpu.control.gpmpc import GPMPC
    from gpmpc_tpu.envs.drone import DroneFigureEightEnv, EnvParams
    from gpmpc_tpu.models.symbolic import symbolic_attitude

    prior = {"a": 12.1432, "b": 1.8118, "c": -72.08, "d": -7.5755,
             "e": 39.8653, "f": -72.08, "h": -7.5755, "l": 39.8653}
    env = DroneFigureEightEnv(EnvParams.default()._replace(n_steps=64, traj_amplitude=0.1))
    model = symbolic_attitude(dt=0.02, params=prior)
    q = [8, 0.1, 8, 0.1, 8, 0.1, 0.5, 0.5, 0.5, 0.001, 0.001, 0.001]
    r = [3, 3, 3, 0.1]
    ctrl = GPMPC(model, env.trajectory, prior, horizon=6, q_mpc=q, r_mpc=r,
                 sparse_gp=True, max_gp_samples=8, seed=0, max_gp_points=32,
                 sqp_iters=2, qp_iters=6)
    rng = np.random.default_rng(0)
    ctrl.train_gp(rng.normal(0, 0.3, (16, 7)).astype(np.float32),
                  rng.normal(0, 0.3, (16, 3)).astype(np.float32), lr=0.05, iterations=10)

    Bn = 4
    obs = jnp.asarray(
        np.asarray(env.trajectory[0])[None] + 0.01 * rng.normal(size=(Bn, 12)), jnp.float32
    )
    states = jax.vmap(lambda _: mpc_mod.init_state(6, 12, 4))(jnp.arange(Bn))

    u_x, st_x, _ = jax.vmap(
        lambda s, o: gpmpc_mod.select_action(model, ctrl.cfg, ctrl.consts, ctrl.gp_model, s, o),
    )(states, obs)
    u_l, st_l, _ = gpmpc_mod.batched_select_action_lanes(
        model, ctrl.cfg, ctrl.consts, ctrl.gp_model, states, obs, interpret=True
    )
    np.testing.assert_allclose(np.asarray(u_l), np.asarray(u_x), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(st_l.X_warm), np.asarray(st_x.X_warm), atol=5e-3
    )


def test_lanes_adaptive_exit_matches_fixed():
    """With a tight tolerance the adaptive-exit kernel matches the fixed-count
    kernel (it only skips iterations that would be no-ops at convergence)."""
    d = make_batch(2)
    qp_lanes = to_lanes(d)
    dx_f, du_f, gap_f = solve_ocp_qp_lanes(qp_lanes, n_ip=15, interpret=True)
    dx_a, du_a, gap_a = solve_ocp_qp_lanes(
        qp_lanes, n_ip=15, adaptive_tol=1e-12, interpret=True
    )
    np.testing.assert_allclose(np.asarray(du_a), np.asarray(du_f), atol=1e-6)
    # and with a loose tolerance it still returns a feasible, near-optimal point
    dx_l, du_l, gap_l = solve_ocp_qp_lanes(
        qp_lanes, n_ip=15, adaptive_tol=1e-6, interpret=True
    )
    np.testing.assert_allclose(np.asarray(du_l), np.asarray(du_f), atol=1e-3)
    assert np.asarray(du_l).max() <= 0.3 + 1e-4


def test_lanes_analytic_jac_matches_jacfwd_path():
    """The analytic-Jacobian linearizer produces the same batched GP-MPC actions
    as the jacfwd path."""
    from gpmpc_tpu.control import gpmpc as gpmpc_mod
    from gpmpc_tpu.control import mpc as mpc_mod
    from gpmpc_tpu.control.gpmpc import GPMPC
    from gpmpc_tpu.envs.drone import DroneFigureEightEnv, EnvParams
    from gpmpc_tpu.models.symbolic import symbolic_attitude

    prior = {"a": 12.1432, "b": 1.8118, "c": -72.08, "d": -7.5755,
             "e": 39.8653, "f": -72.08, "h": -7.5755, "l": 39.8653}
    env = DroneFigureEightEnv(EnvParams.default()._replace(n_steps=64, traj_amplitude=0.1))
    model = symbolic_attitude(dt=0.02, params=prior)
    ctrl = GPMPC(model, env.trajectory, prior, horizon=6, q_mpc=[8, 0.1, 8, 0.1, 8, 0.1, 0.5, 0.5, 0.5, 0.001, 0.001, 0.001],
                 r_mpc=[3, 3, 3, 0.1], sparse_gp=True, max_gp_samples=8, seed=0,
                 max_gp_points=32, sqp_iters=2, qp_iters=6)
    rng = np.random.default_rng(0)
    ctrl.train_gp(rng.normal(0, 0.3, (16, 7)).astype(np.float32),
                  rng.normal(0, 0.3, (16, 3)).astype(np.float32), lr=0.05, iterations=10)

    Bn = 2
    obs = jnp.asarray(
        np.asarray(env.trajectory[0])[None] + 0.01 * rng.normal(size=(Bn, 12)), jnp.float32
    )
    states = jax.vmap(lambda _: mpc_mod.init_state(6, 12, 4))(jnp.arange(Bn))
    u_j, _, _ = gpmpc_mod.batched_select_action_lanes(
        model, ctrl.cfg, ctrl.consts, ctrl.gp_model, states, obs, interpret=True
    )
    cfg_a = ctrl.cfg._replace(analytic_jac=True)
    u_a, _, _ = gpmpc_mod.batched_select_action_lanes(
        model, cfg_a, ctrl.consts, ctrl.gp_model, states, obs, interpret=True
    )
    np.testing.assert_allclose(np.asarray(u_a), np.asarray(u_j), atol=5e-5)


def test_lanes_mehrotra_matches_fixed():
    """Mehrotra predictor-corrector in the lanes kernel reaches (at least) the
    fixed-sigma solution quality in fewer iterations."""
    d = make_batch(2)
    qp_lanes = to_lanes(d)
    dx_f, du_f, gap_f = solve_ocp_qp_lanes(qp_lanes, n_ip=15, interpret=True)
    dx_m, du_m, gap_m = solve_ocp_qp_lanes(qp_lanes, n_ip=8, mehrotra=True, interpret=True)
    assert float(np.max(np.asarray(gap_m))) <= max(float(np.max(np.asarray(gap_f))), 1e-7)
    np.testing.assert_allclose(np.asarray(du_m), np.asarray(du_f), atol=5e-4)
    np.testing.assert_allclose(np.asarray(dx_m), np.asarray(dx_f), atol=5e-4)


def test_streamed_kernel_matches_resident():
    """The A/B-streaming kernel is the same IP algorithm with a different memory
    plan: results must match the all-resident kernel bit-for-bit-ish."""
    d = make_batch(3)
    qp_lanes = to_lanes(d)
    for kwargs in (dict(), dict(mehrotra=True), dict(adaptive_tol=1e-8)):
        dx_r, du_r, gap_r = solve_ocp_qp_lanes(qp_lanes, n_ip=12, interpret=True, **kwargs)
        dx_s, du_s, gap_s = solve_ocp_qp_lanes_streamed(
            qp_lanes, n_ip=12, interpret=True, **kwargs
        )
        np.testing.assert_allclose(np.asarray(dx_s), np.asarray(dx_r), atol=1e-6)
        np.testing.assert_allclose(np.asarray(du_s), np.asarray(du_r), atol=1e-6)
        np.testing.assert_allclose(np.asarray(gap_s), np.asarray(gap_r), rtol=1e-4)


def test_streamed_kernel_T100_matches_boxqp():
    """VERDICT item 3 done-criterion: a T=100 lanes solve passes the boxqp
    parity test (the XLA reference IP solver, per scenario)."""
    t = 100
    d = make_batch(4, t=t, scale=0.3)
    qp_lanes = to_lanes(d)
    n_iter = 15
    dx, du, gap = solve_ocp_qp_lanes_streamed(qp_lanes, n_ip=n_iter, interpret=True)
    assert np.all(np.asarray(gap) < 1e-4)
    dx = np.moveaxis(np.asarray(dx), -1, 0)
    du = np.moveaxis(np.asarray(du), -1, 0)
    dx_ref, du_ref = reference_solutions(d, n_iter)
    np.testing.assert_allclose(du, du_ref, atol=5e-4)
    np.testing.assert_allclose(dx, dx_ref, atol=5e-4)
    # bounds honored across the long horizon
    assert du.max() <= 0.3 + 1e-4 and du.min() >= -0.3 - 1e-4


@pytest.mark.slow
def test_lanes_step_T52_uses_streamed_and_matches_xla():
    """Controller-level dispatch: T>50 routes the lanes backend through the
    streaming kernel and still matches the vmapped XLA step."""
    from gpmpc_tpu.control import gpmpc as gpmpc_mod
    from gpmpc_tpu.control import mpc as mpc_mod
    from gpmpc_tpu.control.gpmpc import GPMPC
    from gpmpc_tpu.envs.drone import DroneFigureEightEnv, EnvParams
    from gpmpc_tpu.models.symbolic import symbolic_attitude

    prior = {"a": 12.1432, "b": 1.8118, "c": -72.08, "d": -7.5755,
             "e": 39.8653, "f": -72.08, "h": -7.5755, "l": 39.8653}
    env = DroneFigureEightEnv(EnvParams.default()._replace(n_steps=64, traj_amplitude=0.1))
    model = symbolic_attitude(dt=0.02, params=prior)
    q = [8, 0.1, 8, 0.1, 8, 0.1, 0.5, 0.5, 0.5, 0.001, 0.001, 0.001]
    r = [3, 3, 3, 0.1]
    horizon = 52
    ctrl = GPMPC(model, env.trajectory, prior, horizon=horizon, q_mpc=q, r_mpc=r,
                 sparse_gp=True, max_gp_samples=8, seed=0, max_gp_points=32,
                 sqp_iters=2, qp_iters=6)
    rng = np.random.default_rng(0)
    ctrl.train_gp(rng.normal(0, 0.3, (16, 7)).astype(np.float32),
                  rng.normal(0, 0.3, (16, 3)).astype(np.float32), lr=0.05, iterations=10)

    Bn = 2
    obs = jnp.asarray(
        np.asarray(env.trajectory[0])[None] + 0.01 * rng.normal(size=(Bn, 12)), jnp.float32
    )
    states = jax.vmap(lambda _: mpc_mod.init_state(horizon, 12, 4))(jnp.arange(Bn))

    u_x, st_x, _ = jax.vmap(
        lambda s, o: gpmpc_mod.select_action(model, ctrl.cfg, ctrl.consts, ctrl.gp_model, s, o),
    )(states, obs)
    u_l, st_l, _ = gpmpc_mod.batched_select_action_lanes(
        model, ctrl.cfg, ctrl.consts, ctrl.gp_model, states, obs, interpret=True
    )
    np.testing.assert_allclose(np.asarray(u_l), np.asarray(u_x), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(st_l.X_warm), np.asarray(st_x.X_warm), atol=5e-3
    )
    # fused path at T>50: in-kernel linearization + streamed QP
    cfg_fused = ctrl.cfg._replace(kernel_linearize=True)
    u_f, st_f, _ = gpmpc_mod.batched_select_action_lanes(
        model, cfg_fused, ctrl.consts, ctrl.gp_model, states, obs, interpret=True
    )
    np.testing.assert_allclose(np.asarray(u_f), np.asarray(u_x), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(st_f.X_warm), np.asarray(st_x.X_warm), atol=1e-2
    )


def reference_solutions_soft(d, n_iter, rho, mehrotra=False):
    dxs, dus = [], []
    for b in range(L):
        qp = OcpQpData(
            A=jnp.asarray(d["A"][b]), B=jnp.asarray(d["B"][b]), r=jnp.asarray(d["r"][b]),
            Qxx=jnp.asarray(np.stack([np.diag(q) for q in d["qdiag"][b]])),
            qx=jnp.asarray(d["qx"][b]),
            Ruu=jnp.asarray(np.stack([np.diag(q) for q in d["rdiag"][b]])),
            ru=jnp.asarray(d["ru"][b]),
            lx=jnp.asarray(d["lx"][b]), ux=jnp.asarray(d["ux"][b]),
            lu=jnp.asarray(d["lu"][b]), uu=jnp.asarray(d["uu"][b]),
        )
        sol = solve_ocp_qp(qp, n_iter=n_iter, soft_x=rho, mehrotra=mehrotra)
        dxs.append(np.asarray(sol.dx))
        dus.append(np.asarray(sol.du))
    return np.stack(dxs), np.stack(dus)


def test_lanes_soft_matches_reference():
    """Soft state bounds in the resident lanes kernel == the XLA soft IP,
    on a problem whose tight boxes force real violations (rho below the hard
    multipliers)."""
    d = make_batch(2)
    d["lx"][:, 1:, :] = -0.15  # tight: forces activations/violations
    d["ux"][:, 1:, :] = 0.15
    n_iter = 15
    rho = 2.0
    qp_lanes = to_lanes(d)
    dx, du, gap = solve_ocp_qp_lanes(
        qp_lanes, n_ip=n_iter, soft_rho=rho, interpret=True
    )
    assert np.all(np.asarray(gap) < 1e-3)
    dx = np.moveaxis(np.asarray(dx), -1, 0)
    du = np.moveaxis(np.asarray(du), -1, 0)
    dx_ref, du_ref = reference_solutions_soft(d, n_iter, rho)
    assert np.abs(dx_ref[:, 1:]).max() > 0.15 + 1e-3, "oracle should violate"
    np.testing.assert_allclose(du, du_ref, atol=5e-4)
    np.testing.assert_allclose(dx, dx_ref, atol=5e-4)


def test_lanes_soft_mehrotra_matches_reference():
    d = make_batch(3)
    d["lx"][:, 1:, :] = -0.2
    d["ux"][:, 1:, :] = 0.2
    rho = 3.0
    qp_lanes = to_lanes(d)
    dx, du, gap = solve_ocp_qp_lanes(
        qp_lanes, n_ip=10, soft_rho=rho, mehrotra=True, interpret=True
    )
    dx = np.moveaxis(np.asarray(dx), -1, 0)
    du = np.moveaxis(np.asarray(du), -1, 0)
    dx_ref, du_ref = reference_solutions_soft(d, 15, rho, mehrotra=True)
    np.testing.assert_allclose(du, du_ref, atol=1e-3)
    np.testing.assert_allclose(dx, dx_ref, atol=1e-3)


def test_lanes_soft_crossed_bounds_finite():
    """Crossed boxes (over-aggressive tightening) stay well-posed in-kernel."""
    d = make_batch(4)
    d["lx"][:, 1:, :] = 0.3
    d["ux"][:, 1:, :] = -0.3  # lower ABOVE upper
    qp_lanes = to_lanes(d)
    dx, du, gap = solve_ocp_qp_lanes(
        qp_lanes, n_ip=15, soft_rho=5.0, interpret=True
    )
    assert np.all(np.isfinite(np.asarray(dx)))
    assert np.all(np.isfinite(np.asarray(du)))
    dx_ref, du_ref = reference_solutions_soft(d, 15, 5.0)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(du), -1, 0), du_ref, atol=1e-3
    )


def test_lanes_soft_step_matches_xla_soft_step():
    """Controller-level parity with soft constraints on both backends."""
    from functools import partial

    from gpmpc_tpu.control import gpmpc as gpmpc_mod
    from gpmpc_tpu.control import mpc as mpc_mod
    from gpmpc_tpu.control.gpmpc import GPMPC
    from gpmpc_tpu.envs.drone import DroneFigureEightEnv
    from gpmpc_tpu.models.symbolic import symbolic_attitude
    from gpmpc_tpu.utils.benchkit import Q_MPC, R_MPC, reference_prior_dict

    B = 4
    env = DroneFigureEightEnv()
    model = symbolic_attitude(dt=0.02, params=reference_prior_dict())
    ctrl = GPMPC(
        model, env.trajectory, reference_prior_dict(), horizon=5,
        q_mpc=Q_MPC, r_mpc=R_MPC, sparse_gp=False, seed=0, max_gp_points=16,
        sqp_iters=2, qp_iters=8, soft_constraints=50.0,
    )
    # Large (but not box-crossing) variance so the soft path is exercised.
    gp = ctrl.gp_model._replace(
        hypers=ctrl.gp_model.hypers._replace(
            raw_outputscale=jnp.full((3,), 30.0, jnp.float32)
        ),
        trained=jnp.asarray(True),
    )
    rng = np.random.default_rng(0)
    obs = jnp.asarray(
        env.trajectory[:B] + 0.01 * rng.normal(size=(B, 12)), jnp.float32
    )
    states = jax.vmap(lambda i: mpc_mod.init_state(5, 12, 4)._replace(
        traj_step=jnp.asarray(1, jnp.int32),
        X_warm=jnp.tile(obs[i][None], (6, 1)),
    ))(jnp.arange(B))
    u_lanes, _, info_lanes = gpmpc_mod.batched_select_action_lanes(
        model, ctrl.cfg, ctrl.consts, gp, states, obs, interpret=True
    )
    step = partial(gpmpc_mod.select_action, model, ctrl.cfg)
    u_xla, _, info_xla = jax.vmap(lambda s, o: step(ctrl.consts, gp, s, o))(states, obs)
    np.testing.assert_allclose(np.asarray(u_lanes), np.asarray(u_xla), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(info_lanes.soft_viol), np.asarray(info_xla.soft_viol), atol=2e-3
    )


def test_streamed_soft_matches_resident():
    """Soft state bounds in the A/B-streaming kernel: the same bounded-
    multiplier algorithm as the resident kernel, on a problem whose tight
    boxes force real violations."""
    d = make_batch(5)
    d["lx"][:, 1:, :] = -0.15
    d["ux"][:, 1:, :] = 0.15
    rho = 2.0
    qp_lanes = to_lanes(d)
    for kwargs in (dict(), dict(mehrotra=True)):
        dx_r, du_r, gap_r = solve_ocp_qp_lanes(
            qp_lanes, n_ip=15, soft_rho=rho, interpret=True, **kwargs
        )
        dx_s, du_s, gap_s = solve_ocp_qp_lanes_streamed(
            qp_lanes, n_ip=15, soft_rho=rho, interpret=True, **kwargs
        )
        # The streamed kernel recomputes the per-stage corrections instead of
        # storing them — same algebra, different f32 accumulation order.
        np.testing.assert_allclose(np.asarray(dx_s), np.asarray(dx_r), atol=5e-5)
        np.testing.assert_allclose(np.asarray(du_s), np.asarray(du_r), atol=5e-5)
        np.testing.assert_allclose(
            np.asarray(gap_s), np.asarray(gap_r), rtol=1e-1, atol=1e-9
        )


def test_streamed_soft_T52_matches_boxqp():
    """Long-horizon streamed solve with soft state bounds == the XLA soft IP,
    per scenario (chunked DMA loops + the soft per-stage algebra together)."""
    t = 52
    d = make_batch(6, t=t, scale=0.3)
    d["lx"][:, 1:, :] = -0.3
    d["ux"][:, 1:, :] = 0.3
    rho = 2.0
    n_iter = 15
    qp_lanes = to_lanes(d)
    dx, du, gap = solve_ocp_qp_lanes_streamed(
        qp_lanes, n_ip=n_iter, soft_rho=rho, interpret=True
    )
    dx = np.moveaxis(np.asarray(dx), -1, 0)
    du = np.moveaxis(np.asarray(du), -1, 0)
    dx_ref, du_ref = reference_solutions_soft(d, n_iter, rho)
    assert np.abs(dx_ref[:, 1:]).max() > 0.3 + 1e-3, "oracle should violate"
    np.testing.assert_allclose(du, du_ref, atol=5e-4)
    np.testing.assert_allclose(dx, dx_ref, atol=5e-4)


# ---------------------------------------------------------------------------
# Cap-boundary matrix (round-3 item 7): one parity test per published lanes
# horizon cap, importing the caps so the tests track any future change.
# ---------------------------------------------------------------------------
from gpmpc_tpu.ops.pallas_ocp import solve_ocp_qp_lanes_streamed2  # noqa: E402
from gpmpc_tpu.ops.sqp_lanes import (  # noqa: E402
    MAX_LANES_HORIZON,
    MAX_LANES_HORIZON_MEHROTRA,
    MAX_STREAM_HORIZON,
    MAX_STREAM_HORIZON_SOFT,
    MAX_STREAM2_HORIZON,
    MAX_STREAM2_HORIZON_SOFT,
)

# Interpret-mode wall time scales linearly with T; past this, a single cell
# would run for tens of CPU-minutes. Caps above it are tested at the ceiling
# here and validated AT the cap on hardware (v5e compile+solve probes, gap <=
# 4e-8: T=400 tier-1, T=320 tier-1 soft, T=1024 tier-2, T=768 tier-2 soft —
# docs/EXPERIMENTS_r5.md §2).
_INTERPRET_T_CEILING = 112

_CAP_CELLS = [
    # (name, horizon, solver_kind, mehrotra, soft_rho)
    ("resident", MAX_LANES_HORIZON, "resident", False, None),
    ("resident_mehrotra", MAX_LANES_HORIZON_MEHROTRA, "resident", True, None),
    ("streamed", MAX_STREAM_HORIZON, "streamed", False, None),
    ("streamed_mehrotra", MAX_STREAM_HORIZON, "streamed", True, None),
    ("streamed_soft", MAX_STREAM_HORIZON_SOFT, "streamed", False, 40.0),
    ("streamed_soft_mehrotra", MAX_STREAM_HORIZON_SOFT, "streamed", True, 40.0),
    ("streamed2", MAX_STREAM2_HORIZON, "streamed2", False, None),
    ("streamed2_mehrotra", MAX_STREAM2_HORIZON, "streamed2", True, None),
    ("streamed2_soft_mehrotra", MAX_STREAM2_HORIZON_SOFT, "streamed2", True, 40.0),
]

_SOLVERS = {
    "resident": solve_ocp_qp_lanes,
    "streamed": solve_ocp_qp_lanes_streamed,
    "streamed2": solve_ocp_qp_lanes_streamed2,
}


@pytest.mark.slow
@pytest.mark.parametrize(
    "name,t,kind,mehrotra,soft", _CAP_CELLS, ids=[c[0] for c in _CAP_CELLS]
)
def test_lanes_cap_boundary_parity(name, t, kind, mehrotra, soft):
    """Every published horizon cap gets a dedicated parity point at the cap
    (clamped to the interpret ceiling — see _INTERPRET_T_CEILING) — cap-
    boundary configs (e.g. soft+Mehrotra at the soft cap) previously had no
    coverage, so a regression at the edge of the VMEM budget would surface
    only on hardware."""
    t = min(t, _INTERPRET_T_CEILING)
    d = make_batch(11, t=t, scale=0.25)
    qp_lanes = to_lanes(d)
    n_iter = 10
    solver = _SOLVERS[kind]
    dx, du, gap = solver(
        qp_lanes, n_ip=n_iter, mehrotra=mehrotra, soft_rho=soft, interpret=True
    )
    assert np.all(np.isfinite(np.asarray(gap)))
    dx = np.moveaxis(np.asarray(dx), -1, 0)
    du = np.moveaxis(np.asarray(du), -1, 0)
    if soft is None:
        dx_ref, du_ref = reference_solutions(d, n_iter) if not mehrotra else (
            reference_solutions_soft(d, n_iter, rho=None, mehrotra=True)
        )
    else:
        dx_ref, du_ref = reference_solutions_soft(d, n_iter, rho=soft, mehrotra=mehrotra)
    # Mehrotra's adaptive centering (sigma = (gap_aff/gap)^3) cubes tiny f32
    # reduction-order differences between the two implementations, so the
    # iterate paths drift slightly more at these horizons: observed <=1.6e-3
    # on <0.4% of elements, pure path noise (both gaps converge).
    atol = 3e-3 if mehrotra else 7e-4
    np.testing.assert_allclose(du, du_ref, atol=atol)
    np.testing.assert_allclose(dx, dx_ref, atol=atol)


def test_lanes_dispatch_preserves_soft_semantics():
    """Past the soft-streamed cap the dispatcher must route to the XLA backend
    (soft semantics preserved) instead of the lanes hard-bound fallback."""
    from gpmpc_tpu.ops.sqp import SqpConfig
    from gpmpc_tpu.ops.sqp_lanes import lanes_serves

    hard = SqpConfig()
    soft = SqpConfig(soft_x_penalty=50.0)
    assert lanes_serves(hard, MAX_STREAM2_HORIZON)
    assert not lanes_serves(hard, MAX_STREAM2_HORIZON + 1)
    assert lanes_serves(soft, MAX_STREAM2_HORIZON_SOFT)
    assert not lanes_serves(soft, MAX_STREAM2_HORIZON_SOFT + 1)
    assert not lanes_serves(soft, MAX_STREAM2_HORIZON)  # soft shrinks the cap
