"""Backend-dispatch semantics: every cell of the documented matrix, and no
silent fallback cliffs.

`parallel/batch.py::dispatch_decision` is the single source of truth for which
path a configuration takes (lanes-fused / lanes / xla); `batched_gpmpc_step`
executes it and warns ONCE per distinct degradation reason (the XLA fallback
is ~150x slower at the reference problem size — a user benchmarking T=120 or
a closure-less family must see why). `scripts/gen_dispatch_table.py` renders
the same function into the README matrix, so these cells and the docs cannot
drift apart.
"""

import dataclasses
import warnings

import numpy as np
import pytest

from gpmpc_tpu.models import cartpole as cartpole_mod
from gpmpc_tpu.models.residual import CARTPOLE_SPEC, QUADROTOR_SPEC, TWOLINK_SPEC
from gpmpc_tpu.ops.sqp import SqpConfig
from gpmpc_tpu.ops.sqp_lanes import (
    MAX_FUSED_HORIZON,
    MAX_STREAM_HORIZON,
    MAX_STREAM_HORIZON_SOFT,
    MAX_STREAM2_HORIZON,
    MAX_STREAM2_HORIZON_SOFT,
)
from gpmpc_tpu.parallel.batch import dispatch_decision

CFG = SqpConfig(sqp_iters=4, qp_iters=6, kernel_linearize=True)


# The documented dispatch matrix (README "Dispatch semantics"), cell by cell.
MATRIX = [
    # (cfg, spec, T, gp_batched, backend) -> (path, reason-substring)
    ((CFG, QUADROTOR_SPEC, 25, False, "xla"), ("xla", "requested")),
    ((CFG, QUADROTOR_SPEC, 25, False, "lanes"), ("lanes-fused", "flagship")),
    ((CFG, CARTPOLE_SPEC, 25, False, "lanes"), ("lanes-fused", "flagship")),
    ((CFG, TWOLINK_SPEC, 25, False, "lanes"), ("lanes-fused", "flagship")),
    # the fused path serves up to its cap; past it the QP stays in lanes with
    # jacfwd linearization (the tier-2 streaming band, round 5)
    ((CFG, QUADROTOR_SPEC, MAX_FUSED_HORIZON, False, "lanes"),
     ("lanes-fused", "flagship")),
    ((CFG, QUADROTOR_SPEC, MAX_FUSED_HORIZON + 1, False, "lanes"),
     ("lanes", "fused-path cap")),
    ((CFG, QUADROTOR_SPEC, MAX_STREAM2_HORIZON, False, "lanes"),
     ("lanes", "fused-path cap")),
    ((CFG, QUADROTOR_SPEC, MAX_STREAM2_HORIZON + 1, False, "lanes"),
     ("xla", "exceeds the lanes cap")),
    # soft state bounds shrink the caps
    ((CFG._replace(soft_x_penalty=10.0), QUADROTOR_SPEC,
      MAX_STREAM2_HORIZON_SOFT + 1, False, "lanes"),
     ("xla", "soft state bounds")),
    ((CFG._replace(soft_x_penalty=10.0), QUADROTOR_SPEC,
      MAX_STREAM2_HORIZON_SOFT, False, "lanes"),
     ("lanes", "fused-path cap")),
    ((CFG._replace(soft_x_penalty=10.0), QUADROTOR_SPEC,
      MAX_STREAM_HORIZON_SOFT, False, "lanes"),
     ("lanes-fused", "flagship")),
    # per-scenario GP population: lanes QP, XLA linearization
    ((CFG, QUADROTOR_SPEC, 25, True, "lanes"), ("lanes", "population")),
    # family without an in-kernel linearizer closure
    ((CFG, dataclasses.replace(QUADROTOR_SPEC, supports_kernel_linearize=False), 25, False,
      "lanes"),
     ("lanes", "no in-kernel linearizer")),
    # kernel linearization disabled by config
    ((CFG._replace(kernel_linearize=False), QUADROTOR_SPEC, 25, False, "lanes"),
     ("lanes", "kernel_linearize disabled")),
]


@pytest.mark.parametrize("case", MATRIX, ids=[f"cell{i}" for i in range(len(MATRIX))])
def test_dispatch_matrix(case):
    (cfg, spec, T, gp_batched, backend), (want_path, want_reason) = case
    d = dispatch_decision(cfg, spec, T, gp_batched, backend)
    assert d.path == want_path, (d.path, d.reason)
    assert want_reason in d.reason, d.reason


def test_degraded_flag_is_structured():
    """Warning policy keys off dispatch_decision's `degraded` flag, not on
    substring matching of the reason text (a reason containing the word
    'disabled' must not silently suppress a genuine degradation warning)."""
    # explicit user choices: not degraded
    assert not dispatch_decision(CFG, QUADROTOR_SPEC, 25, False, "xla").degraded
    assert not dispatch_decision(
        CFG._replace(kernel_linearize=False), QUADROTOR_SPEC, 25, False, "lanes"
    ).degraded
    assert not dispatch_decision(CFG, QUADROTOR_SPEC, 25, False, "lanes").degraded
    # genuine degradations: flagged regardless of wording
    assert dispatch_decision(
        CFG, QUADROTOR_SPEC, MAX_STREAM2_HORIZON + 1, False, "lanes"
    ).degraded
    assert dispatch_decision(
        CFG, QUADROTOR_SPEC, MAX_FUSED_HORIZON + 1, False, "lanes"
    ).degraded
    assert dispatch_decision(CFG, QUADROTOR_SPEC, 25, True, "lanes").degraded
    assert dispatch_decision(
        CFG,
        dataclasses.replace(QUADROTOR_SPEC, name="custom", supports_kernel_linearize=False),
        25, False, "lanes",
    ).degraded


def test_cap_ordering():
    """The documented three-tier cap ordering: fused == tier-1 stream cap,
    tier-2 extends beyond it, and the soft caps sit below their hard
    counterparts. The MATRIX cells above cover the bands these induce."""
    assert MAX_FUSED_HORIZON == MAX_STREAM_HORIZON
    assert MAX_STREAM_HORIZON < MAX_STREAM2_HORIZON
    assert MAX_STREAM_HORIZON_SOFT < MAX_STREAM_HORIZON
    assert MAX_STREAM2_HORIZON_SOFT < MAX_STREAM2_HORIZON


def test_horizon_fallback_warns_once():
    """A real batched_gpmpc_step past the lanes cap emits ONE structured
    warning naming the reason, and only once per process for that reason."""
    import jax
    import jax.numpy as jnp

    from gpmpc_tpu.control import mpc as mpc_mod
    from gpmpc_tpu.control.gpmpc import GPMPC
    from gpmpc_tpu.envs import cartpole_env
    from gpmpc_tpu.parallel import batch as batch_mod
    from gpmpc_tpu.parallel.batch import batched_gpmpc_step
    from gpmpc_tpu.utils.benchkit import synthetic_cartpole_gp_model

    T = MAX_STREAM2_HORIZON + 8
    env = cartpole_env.CartpoleTrackEnv(cartpole_env.EnvParams.default())
    model = cartpole_mod.symbolic_cartpole(dt=0.02)
    ctrl = GPMPC(
        model, env.trajectory, None, horizon=T,
        q_mpc=[5.0, 0.1, 20.0, 0.5], r_mpc=[0.05],
        sparse_gp=True, max_gp_samples=10, seed=1, max_gp_points=32,
        sqp_iters=2, qp_iters=3,
        bounds=(cartpole_mod.state_bounds(), cartpole_mod.input_bounds()),
    )
    gp = synthetic_cartpole_gp_model(max_points=32, max_inducing=10, n_data=20, n_train=5)
    B = 2
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    _, obs = jax.vmap(lambda k: cartpole_env.env_reset(env.p, k))(keys)
    states = jax.vmap(lambda _: mpc_mod.init_state(T, model.nx, model.nu))(jnp.arange(B))

    batch_mod._DISPATCH_WARNED.clear()
    with pytest.warns(UserWarning, match="exceeds the lanes cap"):
        u, _, _ = batched_gpmpc_step(
            model, ctrl.cfg, ctrl.consts, gp, states, obs, backend="lanes"
        )
    assert np.all(np.isfinite(np.asarray(u)))
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # second identical fallback: silent
        batched_gpmpc_step(
            model, ctrl.cfg, ctrl.consts, gp, states, obs, backend="lanes"
        )


@pytest.mark.slow
def test_wrapper_lanes_backend_parity():
    """GPMPC.select_action routed through the lanes padded-tile path (item 5:
    the reference-shaped API reports the flagship backend on TPU) matches the
    XLA path step-for-step. On CPU the lanes program runs in interpret mode —
    slow, hence the tiny horizon and step count."""
    from gpmpc_tpu.control.gpmpc import GPMPC
    from gpmpc_tpu.envs import cartpole_env
    from gpmpc_tpu.models import cartpole

    env = cartpole_env.CartpoleTrackEnv(cartpole_env.EnvParams.default())
    model = cartpole.symbolic_cartpole(dt=0.02)

    def build(backend):
        return GPMPC(
            model, env.trajectory, None, horizon=8,
            q_mpc=[5.0, 0.1, 20.0, 0.5], r_mpc=[0.05],
            sparse_gp=True, max_gp_samples=10, seed=1, max_gp_points=32,
            sqp_iters=3, qp_iters=6, step_backend=backend,
            bounds=(cartpole.state_bounds(), cartpole.input_bounds()),
        )

    rng = np.random.default_rng(0)
    xz = np.zeros((24, 4), np.float32)
    xz[:, 0] = rng.normal(0, 0.5, 24)
    xz[:, 1] = rng.normal(0, 0.2, 24)
    xz[:, 2] = rng.normal(0, 0.5, 24)
    xz[:, 3] = rng.uniform(-6, 6, 24)
    y = np.stack([-0.3 * xz[:, 0], -0.4 * xz[:, 2]], axis=1).astype(np.float32)

    actions = {}
    for backend in ("xla", "lanes"):
        ctrl = build(backend)
        assert ctrl._resolve_step_backend() == backend
        ctrl.train_gp(xz, y, lr=0.05, iterations=20)
        obs, _ = env.reset(seed=0)
        ctrl.reset()
        us = []
        for _ in range(5):
            u = ctrl.select_action(obs)
            obs, _, _, _, _ = env.step(u)
            us.append(u)
        actions[backend] = np.asarray(us)

    np.testing.assert_allclose(actions["lanes"], actions["xla"], atol=2e-4)


def test_readme_dispatch_table_matches_generator():
    """The README's dispatch matrix must be the VERBATIM output of
    scripts/gen_dispatch_table.py — the single-source-of-truth contract both
    claim. Regenerate with `python scripts/gen_dispatch_table.py` on drift."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "scripts/gen_dispatch_table.py"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    table = r.stdout.strip()
    readme = (repo / "README.md").read_text()
    assert table in readme, (
        "README dispatch matrix drifted from scripts/gen_dispatch_table.py "
        "output — regenerate and paste verbatim"
    )


def test_forced_lanes_backend_validates_horizon_cap():
    """step_backend='lanes' forced past the lanes cap must fail at backend
    resolution with an error naming the knob and the cap, not at trace time
    inside the lanes kernel (advisor finding, round 4)."""
    from gpmpc_tpu.control.gpmpc import GPMPC
    from gpmpc_tpu.envs import cartpole_env
    from gpmpc_tpu.ops.sqp_lanes import MAX_STREAM2_HORIZON

    env = cartpole_env.CartpoleTrackEnv(cartpole_env.EnvParams.default())
    model = cartpole_mod.symbolic_cartpole(dt=0.02)
    ctrl = GPMPC(
        model, env.trajectory, None, horizon=MAX_STREAM2_HORIZON + 4,
        q_mpc=[5.0, 0.1, 20.0, 0.5], r_mpc=[0.05],
        sparse_gp=True, max_gp_samples=10, seed=1, max_gp_points=32,
        sqp_iters=2, qp_iters=3, step_backend="lanes",
        bounds=(cartpole_mod.state_bounds(), cartpole_mod.input_bounds()),
    )
    with pytest.raises(ValueError, match="step_backend='lanes'.*lanes cap"):
        ctrl._resolve_step_backend()
