"""Lane-packed tightening-recursion kernel vs the XLA scan (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.control import gpmpc as gpmpc_mod
from gpmpc_tpu.control import mpc as mpc_mod
from gpmpc_tpu.control.gpmpc import GPMPC
from gpmpc_tpu.envs.drone import DroneFigureEightEnv
from gpmpc_tpu.models.symbolic import symbolic_attitude
from gpmpc_tpu.ops.pallas_tighten import tighten_lanes
from gpmpc_tpu.utils.benchkit import Q_MPC, R_MPC, reference_prior_dict


def make_ctrl(horizon=7):
    env = DroneFigureEightEnv()
    model = symbolic_attitude(dt=0.02, params=reference_prior_dict())
    ctrl = GPMPC(
        model, env.trajectory, reference_prior_dict(), horizon=horizon,
        q_mpc=Q_MPC, r_mpc=R_MPC, sparse_gp=False, seed=0, max_gp_points=16,
        sqp_iters=2, qp_iters=6,
    )
    return env, model, ctrl


def test_tighten_lanes_matches_scan():
    env, model, ctrl = make_ctrl()
    T, B = 7, 5  # B < LANES exercises the padding path
    rng = np.random.default_rng(0)
    cov_dn = jnp.asarray(rng.uniform(1e-6, 4e-4, size=(B, T, 5)), jnp.float32)
    c = ctrl.consts
    tx, tu = tighten_lanes(
        cov_dn, c.Ad, c.Bd_in, c.lqr_gain, c.Bd, c.inverse_cdf, interpret=True
    )
    assert tx.shape == (B, T + 1, 12) and tu.shape == (B, T, 4)

    # Reference: the XLA scan, driven by the same disturbance diagonals.
    K, A, Bm, Bd, ppf = c.lqr_gain, c.Ad, c.Bd_in, c.Bd, c.inverse_cdf

    def scan_one(dn):
        def step(cov_x, dn_k):
            cov_xu = cov_x @ K.T
            cov_u = K @ cov_x @ K.T
            t_x = ppf * jnp.sqrt(jnp.maximum(jnp.diag(cov_x), 0.0))
            t_u = ppf * jnp.sqrt(jnp.maximum(jnp.diag(cov_u), 0.0))
            cov_next = (
                A @ cov_x @ A.T + A @ cov_xu @ Bm.T + Bm @ cov_xu.T @ A.T
                + Bm @ cov_u @ Bm.T + Bd @ jnp.diag(dn_k) @ Bd.T
            )
            return cov_next, (t_x, t_u)

        cov_T, (txp, tup) = jax.lax.scan(step, jnp.zeros((12, 12), jnp.float32), dn)
        t_term = ppf * jnp.sqrt(jnp.maximum(jnp.diag(cov_T), 0.0))
        return jnp.concatenate([txp, t_term[None]], axis=0), tup

    tx_ref, tu_ref = jax.vmap(scan_one)(cov_dn)
    np.testing.assert_allclose(np.asarray(tx), np.asarray(tx_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tu), np.asarray(tu_ref), atol=1e-6)
    # variance propagates into the disturbance-driven velocity rows
    assert np.asarray(tx)[:, 1:, 1].min() > 0


def test_batched_prepare_step_pallas_tighten_matches_xla():
    """End-to-end prep parity: pallas tighten backend vs the vmapped scan."""
    env, model, ctrl = make_ctrl()
    B = 3
    rng = np.random.default_rng(1)
    ctrl.train_gp(
        rng.normal(0, 0.3, (12, 7)).astype(np.float32),
        rng.normal(0, 0.3, (12, 3)).astype(np.float32), lr=0.05, iterations=5,
    )
    obs = jnp.asarray(
        np.asarray(env.trajectory)[:B] + 0.01 * rng.normal(size=(B, 12)), jnp.float32
    )
    states = jax.vmap(lambda i: mpc_mod.init_state(7, 12, 4)._replace(
        traj_step=jnp.asarray(1, jnp.int32),
        X_warm=jnp.tile(obs[i][None], (8, 1)),
    ))(jnp.arange(B))
    out_p = gpmpc_mod.batched_prepare_step(
        model, ctrl.consts, ctrl.gp_model, states, obs,
        var_backend="xla", tighten_backend="pallas", interpret=True,
    )
    out_x = gpmpc_mod.batched_prepare_step(
        model, ctrl.consts, ctrl.gp_model, states, obs,
        var_backend="xla", tighten_backend="xla",
    )
    for a, b in zip(jax.tree.leaves(out_p), jax.tree.leaves(out_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
