"""Parallel (associative-scan) Riccati must match the sequential recursion exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpmpc_tpu.ops.riccati import riccati_solve
from gpmpc_tpu.ops.riccati_parallel import riccati_solve_parallel

from tests.test_ocp_solvers import random_lq, T, NX, NU


@pytest.mark.parametrize("seed", [0, 1, 5])
def test_parallel_matches_sequential(seed):
    lq = random_lq(seed, dtype=jnp.float64)
    dx0 = jnp.asarray(np.random.default_rng(seed).normal(size=NX))
    seq = riccati_solve(lq, dx0)
    par = jax.jit(riccati_solve_parallel)(lq, dx0)
    np.testing.assert_allclose(np.asarray(par.du), np.asarray(seq.du), atol=1e-9)
    np.testing.assert_allclose(np.asarray(par.dx), np.asarray(seq.dx), atol=1e-9)
    np.testing.assert_allclose(np.asarray(par.K), np.asarray(seq.K), atol=1e-9)


def test_parallel_long_horizon_f32():
    """Longer horizon in production dtype stays close to the f64 sequential truth."""
    import tests.test_ocp_solvers as m

    rng = np.random.default_rng(7)
    T_long = 64
    A = np.tile(np.eye(NX), (T_long, 1, 1)) + 0.05 * rng.normal(size=(T_long, NX, NX))
    B = rng.normal(size=(T_long, NX, NU)) * 0.5
    r = rng.normal(size=(T_long, NX)) * 0.05
    Qxx = np.stack([np.diag(rng.uniform(0.5, 2, NX)) for _ in range(T_long + 1)])
    qx = rng.normal(size=(T_long + 1, NX)) * 0.3
    Ruu = np.stack([np.diag(rng.uniform(0.5, 2, NU)) for _ in range(T_long)])
    ru = rng.normal(size=(T_long, NU)) * 0.3
    from gpmpc_tpu.ops.riccati import LqProblem

    lq64 = LqProblem(*(jnp.asarray(a, jnp.float64) for a in (A, B, r, Qxx, qx, Ruu, ru)))
    lq32 = LqProblem(*(jnp.asarray(a, jnp.float32) for a in (A, B, r, Qxx, qx, Ruu, ru)))
    ref = riccati_solve(lq64, jnp.zeros(NX, jnp.float64))
    par = riccati_solve_parallel(lq32, jnp.zeros(NX, jnp.float32))
    np.testing.assert_allclose(np.asarray(par.du), np.asarray(ref.du), atol=5e-3)


def test_mpc_with_parallel_scan_matches_sequential():
    """End-to-end: the controller produces (near-)identical actions with the
    associative-scan backend."""
    from gpmpc_tpu.control.mpc import MPC
    from gpmpc_tpu.envs.drone import DroneFigureEightEnv
    from gpmpc_tpu.models.quadrotor import TRUE_PARAMS
    from gpmpc_tpu.models.symbolic import symbolic_attitude

    env = DroneFigureEightEnv()
    model = symbolic_attitude(dt=0.02, params=TRUE_PARAMS)
    q = [8, 0.1, 8, 0.1, 8, 0.1, 0.5, 0.5, 0.5, 0.001, 0.001, 0.001]
    r = [3, 3, 3, 0.1]
    ctrl_seq = MPC(model, env.trajectory, q, r, horizon=8, sqp_iters=3, qp_iters=6)
    ctrl_par = MPC(model, env.trajectory, q, r, horizon=8, sqp_iters=3, qp_iters=6,
                   parallel_scan=True)
    obs, _ = env.reset(seed=0)
    ctrl_seq.reset()
    ctrl_par.reset()
    for _ in range(3):
        u_s = ctrl_seq.select_action(obs)
        u_p = ctrl_par.select_action(obs)
        np.testing.assert_allclose(u_p, u_s, atol=1e-4)
        obs, _, _, _, _ = env.step(u_s)


def test_stage_sharded_parallel_riccati():
    """Long-horizon Riccati with the STAGE axis sharded over an 8-device mesh:
    the associative-scan combine tree becomes cross-device collectives (GSPMD),
    matching the unsharded result — the multi-chip long-horizon path."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from gpmpc_tpu.ops.riccati import LqProblem
    from gpmpc_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(11)
    T_long = 64
    A = np.tile(np.eye(NX), (T_long, 1, 1)) + 0.05 * rng.normal(size=(T_long, NX, NX))
    B = rng.normal(size=(T_long, NX, NU)) * 0.5
    r = rng.normal(size=(T_long, NX)) * 0.05
    Qxx = np.stack([np.diag(rng.uniform(0.5, 2, NX)) for _ in range(T_long + 1)])
    qx = rng.normal(size=(T_long + 1, NX)) * 0.3
    Ruu = np.stack([np.diag(rng.uniform(0.5, 2, NU)) for _ in range(T_long)])
    ru = rng.normal(size=(T_long, NU)) * 0.3
    lq = LqProblem(*(jnp.asarray(a, jnp.float32) for a in (A, B, r, Qxx, qx, Ruu, ru)))

    ref = riccati_solve_parallel(lq, jnp.zeros(NX, jnp.float32))

    mesh = make_mesh(8, axis_names=("stage",))
    stage_shard = NamedSharding(mesh, P("stage"))
    repl = NamedSharding(mesh, P())
    # T-sized leaves shard across stages; (T+1)-sized leaves (65, indivisible)
    # stay replicated — GSPMD still distributes the combine tree.
    lq_sharded = jax.tree.map(
        lambda a: jax.device_put(a, stage_shard if a.shape[0] % 8 == 0 else repl), lq
    )
    solver = jax.jit(riccati_solve_parallel)
    out = solver(lq_sharded, jnp.zeros(NX, jnp.float32))
    np.testing.assert_allclose(np.asarray(out.du), np.asarray(ref.du), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.dx), np.asarray(ref.dx), atol=1e-5)
