"""On-device quadrotor figure-eight environment.

Replaces the external crazyflow `DroneFigureEightXY-v0` gymnasium vec env that the
reference wraps with `JaxToNumpy` (/root/reference/scripts/run_gp_mpc.py:150). The
reference pays a JAX->numpy device round-trip on every step; here the env is a pure
jitted function over an explicit `EnvState`, so whole episodes fuse into a single
`lax.scan` with the controller, and scenario batches are just a leading `vmap` axis.

The plant integrates the "true" quadrotor parameters (models/quadrotor.TRUE_PARAMS),
which deliberately differ from the controller's prior fit (PRIOR_PARAMS) — the GP
residual layer exists to learn that model mismatch, mirroring the reference's
crazyflow-sim vs. identified-prior split.

Design decision (documented quirk resolution, SURVEY.md §7): the reference's env
steps at 60 Hz while the model dt is 0.02 s and `preprocess_data` hardcodes
dt = 1/60 (/root/reference/gpmpc/gpmpc.py:127 vs scripts/run_gp_mpc.py:146). We run
the env on the controller grid (dt = 0.02) and use the *same* dt consistently in
data preprocessing; the mismatch is not reproduced.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpmpc_tpu.models import quadrotor
from gpmpc_tpu.models.quadrotor import QuadrotorParams
from gpmpc_tpu.models.trajectory import figure_eight_trajectory


class EnvParams(NamedTuple):
    """Plant + episode parameters.

    Beyond the rigid-body coefficients, the default plant carries *structural*
    mismatch that the controller's 12-state prior model class cannot represent
    (mirroring the reference's situation, where the prior is a low-order fit to
    the structurally different crazyflow simulator, SURVEY.md §2.2):

      * first-order actuation lag — the thrust command filters through a rotor
        spin-up time constant and the attitude commands through an inner-loop
        lag, adding 4 hidden actuator states;
      * aero drag — linear + quadratic velocity drag on the translational
        accelerations (velocity is not a GP input, so this residual is only
        partially identifiable: honest structural mismatch);
      * actuation delay — commands take `delay_steps` control periods to reach
        the actuators;
      * process noise (optional, off by default for determinism) — white
        acceleration noise.

    `EnvParams.ideal()` zeroes all of these for solver parity tests where the
    plant must be exactly the prior's model class.
    """

    params: QuadrotorParams
    dt: float = 0.02
    n_steps: int = 300  # episode length == trajectory period
    sim_substeps: int = 2  # inner RK4 substeps per control step
    init_noise: float = 0.02  # seed-dependent initial-state perturbation scale
    traj_amplitude: float = 0.8
    traj_height: float = 1.0
    # --- structural-mismatch (high-fidelity) plant parameters ---
    rotor_tau: float = 0.06  # thrust-command first-order lag [s]
    att_tau: float = 0.03  # attitude-command inner-loop lag [s]
    drag_lin: float = 0.10  # linear aero drag on velocity [1/s]
    drag_quad: float = 0.06  # quadratic aero drag [1/m]
    delay_steps: int = 1  # actuation delay in control periods
    noise_std: float = 0.0  # process-noise std on accelerations [m/s^2 / sqrt(s)]

    @classmethod
    def default(cls) -> "EnvParams":
        return cls(params=quadrotor.TRUE_PARAMS)

    @classmethod
    def ideal(cls, **overrides) -> "EnvParams":
        """Pure-ODE plant (no lag/drag/delay/noise): exactly the prior model
        class with TRUE_PARAMS coefficients. For solver-parity tests."""
        kw = dict(rotor_tau=0.0, att_tau=0.0, drag_lin=0.0, drag_quad=0.0,
                  delay_steps=0, noise_std=0.0)
        kw.update(overrides)
        return cls(params=quadrotor.TRUE_PARAMS, **kw)


class EnvState(NamedTuple):
    x: jax.Array  # (12,) true state
    t: jax.Array  # scalar int32 step counter
    rng: jax.Array  # PRNG key
    # Hidden plant states (invisible to the controller's observation):
    u_act: jax.Array  # (4,) actuator output after first-order lag
    u_queue: jax.Array  # (delay_steps, 4) in-flight delayed commands


def make_trajectory(p: EnvParams) -> jax.Array:
    """The env's reference trajectory, (n_steps, 12). ≙ env.unwrapped.trajectory."""
    return figure_eight_trajectory(
        n_steps=p.n_steps, dt=p.dt, amplitude=p.traj_amplitude, height=p.traj_height
    )


@partial(jax.jit, static_argnums=0)
def env_reset(p: EnvParams, seed_key: jax.Array) -> tuple[EnvState, jax.Array]:
    """Reset to the trajectory start plus a small seed-dependent perturbation.

    Actuator states start at the true plant's hover input (rotors already
    spinning at trim), and the delay queue is pre-filled with it.
    """
    traj0 = make_trajectory(p)[0]
    key, sub = jax.random.split(seed_key)
    x0 = traj0 + p.init_noise * jax.random.normal(sub, traj0.shape, traj0.dtype)
    u_hover = hover_input(p.params)
    state = EnvState(
        x=x0, t=jnp.asarray(0, jnp.int32), rng=key,
        u_act=u_hover,
        u_queue=jnp.tile(u_hover[None], (p.delay_steps, 1)),
    )
    return state, x0


def hover_input(params: QuadrotorParams) -> jax.Array:
    """The true plant's trim input: thrust command with acc = g, zero angles."""
    t_hover = (quadrotor.GRAVITY - params.b) / params.a
    return jnp.asarray([t_hover, 0.0, 0.0, 0.0], jnp.float32)


@partial(jax.jit, static_argnums=0)
def env_step(
    p: EnvParams, state: EnvState, action: jax.Array
) -> tuple[EnvState, jax.Array, jax.Array, jax.Array, jax.Array]:
    """One control step: integrate the true plant for `sim_substeps` RK4 substeps.

    Returns (state, obs, reward, terminated, truncated) — the gymnasium step
    contract flattened to arrays (≙ run_gp_mpc.py:59-66). Delegates to
    `env_step_dynamic` with the static plant coefficients.
    """
    return env_step_dynamic(p, params_to_array(p.params), state, action)


def params_to_array(p: QuadrotorParams) -> jax.Array:
    """QuadrotorParams -> traced (8,) array [a, b, c, d, e, f, h, l]."""
    return jnp.asarray([p.a, p.b, p.c, p.d, p.e, p.f, p.h, p.l], jnp.float32)


def randomize_params(
    key: jax.Array, base: QuadrotorParams, scale: float = 0.1
) -> jax.Array:
    """Per-scenario domain randomization: multiplicative log-normal-ish jitter on
    every plant coefficient (BASELINE config 3: 'domain-randomized batched
    rollouts'). Returns a traced (8,) parameter array; vmap over keys for a batch."""
    base_arr = params_to_array(base)
    factors = 1.0 + scale * jax.random.truncated_normal(
        key, -2.0, 2.0, (8,), dtype=base_arr.dtype
    )
    return base_arr * factors


@partial(jax.jit, static_argnums=0)
def env_step_dynamic(
    p: EnvParams, params_arr: jax.Array, state: EnvState, action: jax.Array
) -> tuple[EnvState, jax.Array, jax.Array, jax.Array, jax.Array]:
    """`env_step` with the plant coefficients as a traced (8,) array, so a
    scenario batch can carry per-scenario randomized dynamics (vmap over
    params_arr). The static `p.params` is ignored in favor of `params_arr`."""
    dyn = QuadrotorParams(*[params_arr[i] for i in range(8)])

    def fc(x_, u_):
        f = quadrotor.continuous_dynamics(x_, u_, params=dyn)
        if p.drag_lin > 0.0 or p.drag_quad > 0.0:
            # Aero drag on the translational accelerations: -(c1 + c2|v|) v.
            v = x_[jnp.array([quadrotor.IDX_DX, quadrotor.IDX_DY, quadrotor.IDX_DZ])]
            drag = -(p.drag_lin + p.drag_quad * jnp.linalg.norm(v)) * v
            f = f.at[jnp.array([quadrotor.IDX_DX, quadrotor.IDX_DY, quadrotor.IDX_DZ])].add(drag)
        return f

    # Actuation delay: the command applied now left the controller
    # `delay_steps` periods ago.
    if p.delay_steps > 0:
        u_cmd = state.u_queue[0]
        u_queue = jnp.concatenate([state.u_queue[1:], action[None]], axis=0)
    else:
        u_cmd = action
        u_queue = state.u_queue

    sub_dt = p.dt / p.sim_substeps
    # First-order actuator response per substep (exact ZOH discretization);
    # tau = 0 means instantaneous (alpha = 1).
    alpha = jnp.asarray(
        [1.0 - math.exp(-sub_dt / tau) if tau > 0.0 else 1.0
         for tau in (p.rotor_tau, p.att_tau, p.att_tau, p.att_tau)],
        jnp.float32,
    )
    x = state.x
    u_act = state.u_act
    for _ in range(p.sim_substeps):
        u_act = u_act + alpha * (u_cmd - u_act)
        x = quadrotor.rk4(fc, x, u_act, sub_dt)
    key = state.rng
    if p.noise_std > 0.0:
        key, sub = jax.random.split(key)
        vel_rows = jnp.array([quadrotor.IDX_DX, quadrotor.IDX_DY, quadrotor.IDX_DZ,
                              quadrotor.IDX_DPHI, quadrotor.IDX_DTHETA])
        noise = p.noise_std * jnp.sqrt(p.dt) * jax.random.normal(sub, (5,), x.dtype)
        x = x.at[vel_rows].add(noise)
    t = state.t + 1

    traj = make_trajectory(p)
    ref = traj[jnp.mod(t, p.n_steps)]
    pos_err = jnp.stack([x[0] - ref[0], x[2] - ref[2], x[4] - ref[4]])
    reward = -jnp.sum(pos_err**2)

    s_low, s_high = quadrotor.state_bounds()
    terminated = jnp.logical_or(jnp.any(x < 2 * s_low), jnp.any(x > 2 * s_high))
    truncated = t >= p.n_steps
    new_state = EnvState(x=x, t=t, rng=key, u_act=u_act, u_queue=u_queue)
    return new_state, x, reward, terminated, truncated


class DroneFigureEightEnv:
    """Thin stateful wrapper with a gymnasium-like API for script-level use.

    The functional core (`env_reset` / `env_step`) is the real interface; this class
    only mirrors the reference driver's calling convention
    (/root/reference/scripts/run_gp_mpc.py:42-66) for the experiment scripts.
    """

    def __init__(self, params: EnvParams | None = None):
        self.p = params or EnvParams.default()
        self._state: EnvState | None = None

    @property
    def trajectory(self):
        return make_trajectory(self.p)

    @property
    def dt(self) -> float:
        return self.p.dt

    def reset(self, seed: int = 0):
        state, obs = env_reset(self.p, jax.random.PRNGKey(seed))
        self._state = state
        return obs, {}

    def step(self, action):
        self._state, obs, reward, terminated, truncated = env_step(
            self.p, self._state, jnp.asarray(action).reshape(-1)
        )
        return obs, reward, bool(terminated), bool(truncated), {}

    def close(self):
        self._state = None
