"""Parallel layer: mesh construction, sharded batched solves, fused episodes."""

import jax
import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.control import gpmpc as gpmpc_mod
from gpmpc_tpu.control import mpc as mpc_mod
from gpmpc_tpu.control.gpmpc import GPMPC, pack_training_data, train_gp_models
from gpmpc_tpu.envs.drone import DroneFigureEightEnv, EnvParams
from gpmpc_tpu.models.symbolic import symbolic_attitude
from gpmpc_tpu.parallel.batch import batched_episode, batched_gpmpc_step, make_batched_controller_step
from gpmpc_tpu.parallel.mesh import make_mesh, shard_leading_axis

PRIOR = {
    "a": 12.1432, "b": 1.8118, "c": -72.08, "d": -7.5755,
    "e": 39.8653, "f": -72.08, "h": -7.5755, "l": 39.8653,
}
Q = [8, 0.1, 8, 0.1, 8, 0.1, 0.5, 0.5, 0.5, 0.001, 0.001, 0.001]
R = [3, 3, 3, 0.1]


def make_ctrl(horizon=6):
    # Short period -> small amplitude to keep required accelerations feasible.
    env = DroneFigureEightEnv(EnvParams.default()._replace(n_steps=64, traj_amplitude=0.1))
    model = symbolic_attitude(dt=0.02, params=PRIOR)
    ctrl = GPMPC(
        model, env.trajectory, PRIOR, horizon=horizon, q_mpc=Q, r_mpc=R,
        sparse_gp=True, max_gp_samples=8, seed=0, max_gp_points=32,
        sqp_iters=3, qp_iters=5,
    )
    rng = np.random.default_rng(0)
    xi = rng.normal(0, 0.3, (16, 7)).astype(np.float32)
    ti = rng.normal(0, 0.3, (16, 3)).astype(np.float32)
    ctrl.train_gp(xi, ti, lr=0.05, iterations=20)
    return env, model, ctrl


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)
    mesh2 = make_mesh(8, axis_names=("data", "stage"), shape=(4, 2))
    assert mesh2.axis_names == ("data", "stage")


def test_batched_step_matches_single():
    env, model, ctrl = make_ctrl()
    B = 4
    obs = jnp.asarray(
        np.asarray(env.trajectory[0])[None] + 0.01 * np.random.default_rng(1).normal(size=(B, 12)),
        jnp.float32,
    )
    states = jax.vmap(lambda _: mpc_mod.init_state(6, 12, 4))(jnp.arange(B))
    u_b, states_b, _ = batched_gpmpc_step(model, ctrl.cfg, ctrl.consts, ctrl.gp_model, states, obs)
    u_1, _, _ = gpmpc_mod.select_action(
        model, ctrl.cfg, ctrl.consts, ctrl.gp_model, mpc_mod.init_state(6, 12, 4), obs[2]
    )
    np.testing.assert_allclose(np.asarray(u_b[2]), np.asarray(u_1), atol=1e-5)


def test_sharded_step_matches_unsharded():
    env, model, ctrl = make_ctrl()
    mesh = make_mesh(8)
    B = 16
    obs = jnp.asarray(
        np.asarray(env.trajectory[0])[None] + 0.01 * np.random.default_rng(2).normal(size=(B, 12)),
        jnp.float32,
    )
    states = jax.vmap(lambda _: mpc_mod.init_state(6, 12, 4))(jnp.arange(B))
    plain = jax.jit(
        lambda c, g, s, o: batched_gpmpc_step(model, ctrl.cfg, c, g, s, o)
    )(ctrl.consts, ctrl.gp_model, states, obs)

    step = make_batched_controller_step(model, ctrl.cfg, mesh=mesh)
    obs_sh = shard_leading_axis(obs, mesh)
    states_sh = shard_leading_axis(states, mesh)
    sharded = step(ctrl.consts, ctrl.gp_model, states_sh, obs_sh)
    np.testing.assert_allclose(np.asarray(sharded[0]), np.asarray(plain[0]), atol=1e-5)


def test_fused_episode_runs_and_is_stable():
    env, model, ctrl = make_ctrl()
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    ep = jax.jit(
        lambda c, g, k: batched_episode(model, ctrl.cfg, env.p, c, g, k, n_steps=8)
    )(ctrl.consts, ctrl.gp_model, keys)
    assert ep.obs.shape == (3, 9, 12)
    assert ep.actions.shape == (3, 8, 4)
    assert np.all(np.isfinite(np.asarray(ep.obs)))


def test_in_jit_gp_training():
    """train_gp_models must be traceable inside a jitted program (no host sync)."""
    rng = np.random.default_rng(3)
    xi = jnp.asarray(rng.normal(0, 0.3, (12, 7)), jnp.float32)
    ti = jnp.asarray(rng.normal(0, 0.3, (12, 3)), jnp.float32)

    @jax.jit
    def fit(xi, ti, key):
        data = pack_training_data(xi, ti, 16)
        return train_gp_models(data, key, sparse=True, max_inducing=4, n_train=3, lr=0.05)

    gp = fit(xi, ti, jax.random.PRNGKey(0))
    assert bool(gp.trained)
    assert np.all(np.isfinite(np.asarray(gp.alpha_s)))


def test_randomized_episode_batch():
    from gpmpc_tpu.parallel.batch import batched_episode_randomized

    env, model, ctrl = make_ctrl()
    keys = jax.random.split(jax.random.PRNGKey(5), 3)
    ep = jax.jit(
        lambda c, g, k: batched_episode_randomized(
            model, ctrl.cfg, env.p, c, g, k, n_steps=6, param_scale=0.1
        )
    )(ctrl.consts, ctrl.gp_model, keys)
    assert ep.obs.shape == (3, 7, 12)
    assert np.all(np.isfinite(np.asarray(ep.obs)))
    # distinct plants produce distinct trajectories even from similar starts
    spread = np.std(np.asarray(ep.obs)[:, -1, 5])
    assert spread > 1e-5


def test_lanes_episode_matches_xla_episode():
    """backend='lanes' episode (batch-inside-scan, Pallas kernels in interpret
    mode) tracks the XLA episode step-for-step."""
    env, model, ctrl = make_ctrl()
    keys = jax.random.split(jax.random.PRNGKey(2), 2)
    ep_x = batched_episode(
        model, ctrl.cfg, env.p, ctrl.consts, ctrl.gp_model, keys, n_steps=4
    )
    ep_l = batched_episode(
        model, ctrl.cfg, env.p, ctrl.consts, ctrl.gp_model, keys, n_steps=4,
        backend="lanes", interpret=True,
    )
    assert ep_l.obs.shape == ep_x.obs.shape
    np.testing.assert_allclose(
        np.asarray(ep_l.actions), np.asarray(ep_x.actions), atol=2e-3
    )
    np.testing.assert_allclose(np.asarray(ep_l.obs), np.asarray(ep_x.obs), atol=5e-3)


def test_lanes_episode_randomized_plants():
    env, model, ctrl = make_ctrl()
    keys = jax.random.split(jax.random.PRNGKey(7), 2)
    ep = batched_episode(
        model, ctrl.cfg, env.p, ctrl.consts, ctrl.gp_model, keys, n_steps=3,
        param_scale=0.1, backend="lanes", interpret=True,
    )
    assert np.all(np.isfinite(np.asarray(ep.obs)))
    assert not np.allclose(np.asarray(ep.obs[0]), np.asarray(ep.obs[1]))


def test_gp_batched_lanes_episode_matches_xla():
    """Per-scenario GP populations on the lanes backend (round-3 item 2: the
    QP/tightening kernels serve gp_batched=True; the per-seed GP algebra runs
    vmapped) must match the XLA population path."""
    env, model, ctrl = make_ctrl()
    B = 2
    keys = jax.random.split(jax.random.PRNGKey(5), B)
    # a population: B GP models with different data (fit on different noise)
    rng = np.random.default_rng(0)

    def fit(seed):
        c = make_ctrl()[2]
        r = np.random.default_rng(seed)
        c.train_gp(r.normal(0, 0.3, (16, 7)).astype(np.float32),
                   r.normal(0, 0.3, (16, 3)).astype(np.float32),
                   lr=0.05, iterations=10)
        return c.gp_model

    gps = [fit(s) for s in (1, 2)]
    gp_pop = jax.tree.map(lambda *ls: jnp.stack(ls), *gps)
    ep_x = batched_episode(
        model, ctrl.cfg, env.p, ctrl.consts, gp_pop, keys, n_steps=3,
        gp_batched=True,
    )
    ep_l = batched_episode(
        model, ctrl.cfg, env.p, ctrl.consts, gp_pop, keys, n_steps=3,
        gp_batched=True, backend="lanes", interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(ep_l.actions), np.asarray(ep_x.actions), atol=2e-3
    )
    np.testing.assert_allclose(np.asarray(ep_l.obs), np.asarray(ep_x.obs), atol=5e-3)
    # the two scenarios genuinely ran different GPs
    assert not np.allclose(np.asarray(ep_l.actions[0]), np.asarray(ep_l.actions[1]))
