"""Scenario-batched GP-MPC: vmapped controller steps and fused on-device episodes.

This is where the TPU throughput story lives (BASELINE.md north star: >=1e4
GP-MPC solves/s): a single controller solve works on 12x12/12x4 blocks that cannot
fill the MXU, so we batch thousands of scenarios with `vmap` — every small GEMM in
the Riccati/IP stack becomes a large batched GEMM — and shard the scenario axis
over the device mesh with `jit(in_shardings=...)`, letting XLA insert ICI
collectives where needed. The reference has no counterpart (it solves one OCP per
step through a ctypes boundary, SURVEY.md §2.3).

`batched_episode` additionally fuses the env into the controller scan, so a whole
closed-loop episode (controller solve -> plant integration -> next obs) for B
scenarios runs as ONE XLA program with zero host round-trips — versus the
reference's per-step Python->C (acados) and JAX->numpy (JaxToNumpy) crossings.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpmpc_tpu.control import gpmpc as gpmpc_mod
from gpmpc_tpu.control import mpc as mpc_mod
from gpmpc_tpu.control.gpmpc import GpModel, GpMpcConsts
from gpmpc_tpu.control.mpc import MpcState
from gpmpc_tpu.envs import drone
from gpmpc_tpu.models.symbolic import SymbolicModel
from gpmpc_tpu.ops.sqp import SqpConfig


class DispatchDecision(NamedTuple):
    """Outcome of `dispatch_decision`. `degraded` is the structured warning
    policy: True iff the path is below what was requested for a reason the
    user did NOT explicitly configure (horizon caps, missing family closure,
    GP population) — the silent-cliff class the one-shot warnings exist for.
    Unpacks as a (path, reason[, degraded]) tuple for existing callers."""

    path: str
    reason: str
    degraded: bool = False


def dispatch_decision(
    cfg: SqpConfig, spec, T: int, gp_batched: bool = False, backend: str = "lanes"
) -> DispatchDecision:
    """(path, reason, degraded) the dispatcher will take for this configuration.

    The single source of truth for backend dispatch — `batched_gpmpc_step`
    executes exactly this decision, the fallback warnings fire iff `degraded`,
    `tests/test_dispatch.py` asserts every cell, and the README dispatch
    matrix is generated from it (`scripts/gen_dispatch_table.py`). Paths:

      "lanes-fused"  whole-SQP Pallas path (in-kernel linearizer + lanes QP)
      "lanes"        lanes QP with XLA linearization (jacfwd)
      "xla"          fully-XLA path (vmapped select_action)
    """
    from gpmpc_tpu.ops.sqp_lanes import (
        MAX_FUSED_HORIZON, lanes_horizon_cap, lanes_serves,
    )

    if backend != "lanes":
        return DispatchDecision("xla", "requested explicitly")
    if not lanes_serves(cfg, T):
        soft = " with soft state bounds" if cfg.soft_x_penalty is not None else ""
        return DispatchDecision("xla", (
            f"horizon T={T} exceeds the lanes cap ({lanes_horizon_cap(cfg)}{soft}); "
            "the XLA path serves any horizon (orders of magnitude slower per "
            "solve — measured 200x at T=200 — see README dispatch matrix)"
        ), degraded=True)
    if gp_batched:
        return DispatchDecision("lanes", (
            "per-scenario GP population: linearization runs vmapped under XLA "
            "(each scenario has its own Gram); QP + tightening stay in lanes"
        ), degraded=True)
    if not cfg.kernel_linearize:
        return DispatchDecision(
            "lanes", "kernel_linearize disabled; jacfwd linearization + lanes QP"
        )
    if not spec.supports_kernel_linearize:
        return DispatchDecision("lanes", (
            f"model family '{spec.name}' has no in-kernel linearizer closure "
            "(ops/pallas_linearize.py registry); jacfwd linearization + lanes QP"
        ), degraded=True)
    if T > MAX_FUSED_HORIZON:
        return DispatchDecision("lanes", (
            f"horizon T={T} exceeds the fused-path cap ({MAX_FUSED_HORIZON}); "
            "jacfwd linearization + lanes QP"
        ), degraded=True)
    return DispatchDecision(
        "lanes-fused", "in-kernel linearizer + lanes QP (the flagship path)"
    )


# One-time structured fallback warnings (VERDICT r3 item 6: no silent 150x
# cliff). Keyed by reason so each distinct degradation fires once per process.
_DISPATCH_WARNED: set[str] = set()


def _warn_dispatch(decision: DispatchDecision):
    # Explicit user choices (backend="xla", kernel_linearize=False) carry
    # degraded=False from dispatch_decision and stay silent; every genuine
    # degradation warns once per distinct reason.
    if not decision.degraded:
        return
    if decision.reason in _DISPATCH_WARNED:
        return
    _DISPATCH_WARNED.add(decision.reason)
    import warnings

    warnings.warn(
        f"gpmpc dispatch: lanes backend requested but taking the "
        f"'{decision.path}' path — {decision.reason}",
        stacklevel=3,
    )


def batched_gpmpc_step(
    model: SymbolicModel,
    cfg: SqpConfig,
    consts: GpMpcConsts,
    gp: GpModel,
    states: MpcState,  # leaves with leading batch axis B
    obs: jax.Array,  # (B, nx)
    backend: str = "xla",
    var_backend: str = "auto",
    var_bf16: bool = False,
):
    """One GP-MPC solve for B scenarios. consts/gp are broadcast (replicated).

    backend="lanes" routes QP solves through the lane-packed Pallas kernel
    (ops/pallas_ocp.py) — the fast path on TPU for B >= 128. var_backend /
    var_bf16 select the tightening-variance path (control/gpmpc.py::
    batched_variances). Dispatch preserves SEMANTICS first (horizons past the
    lanes cap for this config take the XLA path, which serves any horizon);
    every degradation from the requested backend warns once with the reason
    (`dispatch_decision`).
    """
    T = consts.mpc.uref.shape[0]
    gp_batched = gp.Zs.ndim == 4  # per-scenario GP population
    spec = gpmpc_mod.model_spec(model)
    decision = dispatch_decision(cfg, spec, T, gp_batched, backend)
    path = decision.path
    _warn_dispatch(decision)
    if path.startswith("lanes"):
        return gpmpc_mod.batched_select_action_lanes(
            model, cfg, consts, gp, states, obs,
            var_backend=var_backend, var_bf16=var_bf16,
        )
    step = partial(gpmpc_mod.select_action, model, cfg)
    gp_axis = 0 if gp_batched else None
    return jax.vmap(step, in_axes=(None, gp_axis, 0, 0))(consts, gp, states, obs)


def make_batched_controller_step(model, cfg, mesh=None):
    """jit-compiled batched step; if `mesh` is given, the batch axis is sharded."""
    fn = partial(batched_gpmpc_step, model, cfg)
    if mesh is None:
        return jax.jit(fn)
    from jax.sharding import NamedSharding, PartitionSpec as P

    batched = NamedSharding(mesh, P(mesh.axis_names[0]))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        fn,
        in_shardings=(repl, repl, batched, batched),
        out_shardings=(batched, batched, batched),
    )


class EpisodeResult(NamedTuple):
    obs: jax.Array  # (B, n_steps+1, nx)
    actions: jax.Array  # (B, n_steps, nu)
    rewards: jax.Array  # (B, n_steps)


def batched_episode(
    model: SymbolicModel,
    cfg: SqpConfig,
    env_params,
    consts: GpMpcConsts,
    gp: GpModel,
    keys: jax.Array,  # (B,) PRNG keys
    n_steps: int,
    use_gp: bool = True,
    param_scale: float | None = None,
    backend: str = "xla",
    interpret: bool = False,
    gp_batched: bool = False,
    env_mod=drone,
) -> EpisodeResult:
    """Full closed-loop episodes for B scenarios as one scanned XLA program.

    `env_mod` selects the environment family: any module with the
    `envs/drone.py` functional surface (`env_reset`, `env_step_dynamic`,
    `params_to_array`, `randomize_params`) — `envs/cartpole_env.py` is the
    second instance. The model/env pairing is the caller's contract.

    With `param_scale`, every scenario runs against its own randomized plant
    coefficients (BASELINE config 3: domain-randomized rollouts) while the
    controller keeps the shared prior/GP model.

    With `gp_batched=True`, every `gp` leaf carries a leading B axis and each
    scenario runs its OWN GP model — a population of independently-learned
    controllers evaluated as one program (the multi-seed learning sweep,
    parallel/sweep.py, rides this; the reference can only run such populations
    as sequential processes). Supported on both backends: the lanes path keeps
    the QP/tightening kernels lane-packed and runs the per-scenario GP algebra
    vmapped under XLA.

    backend="lanes" (requires use_gp=True) runs the controller step through the
    lane-packed Pallas kernels with the batch axis inside the scan — the
    on-device episode shape for TPU. Note: XLA cannot hoist the layout
    transforms feeding Pallas custom-calls out of a scan body, which costs ~2x
    per step vs a host-chained loop of the same kernels (measured, see
    bench.py BENCH_FUSED) — still ~30x the XLA path inside the same scan.
    """
    if backend == "lanes":
        if not use_gp:
            raise ValueError("backend='lanes' requires use_gp=True (GP-MPC step)")
        return _batched_episode_lanes(
            model, cfg, env_params, consts, gp, keys, n_steps,
            param_scale=param_scale, interpret=interpret, env_mod=env_mod,
        )

    def single_episode(gp_i, key):
        k_env, k_par = jax.random.split(key)
        if param_scale is None:
            plant = env_mod.params_to_array(env_params.params)
        else:
            plant = env_mod.randomize_params(k_par, env_params.params, scale=param_scale)
        env_state, obs0 = env_mod.env_reset(env_params, k_env)
        ctrl_state = mpc_mod.init_state(cfg_horizon(consts), model.nx, model.nu)

        def step(carry, _):
            env_state, ctrl_state, obs = carry
            if use_gp:
                u, ctrl_state, _ = gpmpc_mod.select_action(
                    model, cfg, consts, gp_i, ctrl_state, obs
                )
            else:
                u, ctrl_state, _ = mpc_mod.select_action(
                    model, cfg, consts.mpc, ctrl_state, obs
                )
            env_state, obs_next, reward, _, _ = env_mod.env_step_dynamic(
                env_params, plant, env_state, u
            )
            return (env_state, ctrl_state, obs_next), (obs_next, u, reward)

        (_, _, _), (obs_path, actions, rewards) = jax.lax.scan(
            step, (env_state, ctrl_state, obs0), None, length=n_steps
        )
        obs_full = jnp.concatenate([obs0[None], obs_path], axis=0)
        return EpisodeResult(obs=obs_full, actions=actions, rewards=rewards)

    return jax.vmap(single_episode, in_axes=(0 if gp_batched else None, 0))(gp, keys)


def _batched_episode_lanes(
    model: SymbolicModel,
    cfg: SqpConfig,
    env_params,
    consts: GpMpcConsts,
    gp: GpModel,
    keys: jax.Array,
    n_steps: int,
    param_scale: float | None,
    interpret: bool,
    env_mod=drone,
) -> EpisodeResult:
    """Batch-inside-scan episode runner on the lane-packed Pallas backend.
    `gp` leaves may carry a leading per-scenario axis (GP populations)."""
    k_env, k_par = jax.vmap(jax.random.split, out_axes=1)(keys)
    plant0 = env_mod.params_to_array(env_params.params)
    if param_scale is None:
        plant = jnp.broadcast_to(plant0, (keys.shape[0],) + plant0.shape)
    else:
        plant = jax.vmap(
            lambda k: env_mod.randomize_params(k, env_params.params, scale=param_scale)
        )(k_par)
    env_states, obs0 = jax.vmap(lambda k: env_mod.env_reset(env_params, k))(k_env)
    T = cfg_horizon(consts)
    ctrl_states = jax.vmap(lambda _: mpc_mod.init_state(T, model.nx, model.nu))(
        jnp.arange(keys.shape[0])
    )

    def step(carry, _):
        env_states, ctrl_states, obs = carry
        u, ctrl_states, _ = gpmpc_mod.batched_select_action_lanes(
            model, cfg, consts, gp, ctrl_states, obs, interpret=interpret
        )
        env_states, obs_next, reward, _, _ = jax.vmap(
            lambda p, s, a: env_mod.env_step_dynamic(env_params, p, s, a)
        )(plant, env_states, u)
        return (env_states, ctrl_states, obs_next), (obs_next, u, reward)

    (_, _, _), (obs_path, actions, rewards) = jax.lax.scan(
        step, (env_states, ctrl_states, obs0), None, length=n_steps
    )
    # scan stacks time-first; episode results are batch-first
    obs_full = jnp.concatenate([obs0[:, None], jnp.moveaxis(obs_path, 0, 1)], axis=1)
    return EpisodeResult(
        obs=obs_full,
        actions=jnp.moveaxis(actions, 0, 1),
        rewards=jnp.moveaxis(rewards, 0, 1),
    )


def cfg_horizon(consts: GpMpcConsts) -> int:
    return consts.mpc.uref.shape[0]


def batched_episode_randomized(
    model: SymbolicModel,
    cfg: SqpConfig,
    env_params: drone.EnvParams,
    consts: GpMpcConsts,
    gp: GpModel,
    keys: jax.Array,
    n_steps: int,
    param_scale: float = 0.1,
    use_gp: bool = True,
) -> EpisodeResult:
    """Domain-randomized episodes — thin wrapper over `batched_episode`."""
    return batched_episode(
        model, cfg, env_params, consts, gp, keys, n_steps,
        use_gp=use_gp, param_scale=param_scale,
    )
