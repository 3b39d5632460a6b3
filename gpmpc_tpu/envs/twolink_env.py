"""On-device two-link-arm tracking environment (third model family's plant).

Mirrors the module surface of `envs/drone.py` / `envs/cartpole_env.py`
(`EnvParams`, `env_reset`, `env_step` / `env_step_dynamic`, `params_to_array`,
`randomize_params`, `make_trajectory`) so the generic episode runners and the
learning sweep drive this family through the same code path.

Structural mismatch the prior model class (uniform-rod arm,
models/twolink.py) cannot represent — the residual-GP layer's job:

  * an unmodeled point-mass PAYLOAD carried at the link-2 tip: changes the
    inertia matrix M(q), the Coriolis coefficient, and the gravity field in a
    configuration-dependent way no TwoLinkParams setting reproduces;
  * viscous joint friction (the prior is frictionless);
  * a torque gain error plus a constant torque bias (drivetrain losses /
    miscalibration) — the persistent-offset analogue of the quadrotor's
    hover-thrust deficit and the cartpole's force bias.

`EnvParams.ideal()` zeroes all mismatch for solver-parity tests.

The task: track a joint-space sinusoid around the hanging posture
(q1 ~ -pi/2, elbow bent) — gentle enough for the torque box, rich enough to
sweep the posture-dependent payload error.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpmpc_tpu.models import twolink
from gpmpc_tpu.models.twolink import GRAVITY, TwoLinkParams

# The true rigid arm the prior was "fit" to (slightly heavier/longer links) —
# rigid-parameter mismatch on top of the structural effects below.
TRUE_PARAMS = TwoLinkParams(m1=1.05, m2=1.1, l1=1.0, l2=1.05)


class EnvParams(NamedTuple):
    params: TwoLinkParams
    dt: float = 0.02
    n_steps: int = 300  # episode length == reference period
    sim_substeps: int = 2
    init_noise: float = 0.02
    amp1: float = 0.45  # joint-1 sine amplitude [rad]
    amp2: float = 0.45  # joint-2 sine amplitude [rad]
    phase2: float = 1.2  # joint-2 phase offset [rad]
    q1_center: float = -math.pi / 2
    q2_center: float = 0.7
    traj_period_steps: int | None = None
    # --- structural-mismatch plant parameters ---
    # Chosen by measurement (see tests/test_learning_loop.py): the torque
    # biases map through M(q)^{-1} with sign mixing across the off-diagonal,
    # so (-2.5, -1.5) produces a LARGE, nearly-constant ddq2 residual
    # (~ -12 rad/s^2) the prior cannot reject while staying learnable; a
    # heavier payload makes the residual inertia-coupled enough that a
    # one-episode GP generalizes poorly off-manifold (measured: worse than
    # the prior at payload 0.3).
    payload_m: float = 0.05  # kg point mass at the link-2 tip
    friction1: float = 0.35  # viscous joint friction [N m s/rad]
    friction2: float = 0.25
    gain: float = 0.92  # applied torque = gain * commanded + bias
    bias1: float = -2.5  # [N m]
    bias2: float = -1.5
    noise_std: float = 0.0  # process noise on the joint-rate rows

    @classmethod
    def default(cls) -> "EnvParams":
        return cls(params=TRUE_PARAMS)

    @classmethod
    def ideal(cls, **overrides) -> "EnvParams":
        """Pure prior-model-class plant for solver-parity tests."""
        kw = dict(payload_m=0.0, friction1=0.0, friction2=0.0, gain=1.0,
                  bias1=0.0, bias2=0.0, noise_std=0.0)
        kw.update(overrides)
        return cls(params=TwoLinkParams(), **kw)


class EnvState(NamedTuple):
    x: jax.Array  # (4,) true state
    t: jax.Array  # scalar int32 step counter
    rng: jax.Array


def make_trajectory(p: EnvParams) -> jax.Array:
    """Reference trajectory (n_steps, 4): joint-space sinusoids with the
    consistent joint-rate rows."""
    period = p.traj_period_steps if p.traj_period_steps is not None else p.n_steps
    t = jnp.arange(p.n_steps, dtype=jnp.float32) * p.dt
    omega = 2.0 * math.pi / (period * p.dt)
    q1 = p.q1_center + p.amp1 * jnp.sin(omega * t)
    q2 = p.q2_center + p.amp2 * jnp.sin(omega * t + p.phase2)
    dq1 = p.amp1 * omega * jnp.cos(omega * t)
    dq2 = p.amp2 * omega * jnp.cos(omega * t + p.phase2)
    return jnp.stack([q1, q2, dq1, dq2], axis=1)


def params_to_array(p: TwoLinkParams) -> jax.Array:
    """TwoLinkParams -> traced (4,) array [m1, m2, l1, l2]."""
    return jnp.asarray([p.m1, p.m2, p.l1, p.l2], jnp.float32)


def randomize_params(
    key: jax.Array, base: TwoLinkParams, scale: float = 0.1
) -> jax.Array:
    """Per-scenario domain randomization (multiplicative truncated-normal
    jitter), same contract as the other env modules."""
    base_arr = params_to_array(base)
    factors = 1.0 + scale * jax.random.truncated_normal(
        key, -2.0, 2.0, (4,), dtype=base_arr.dtype
    )
    return base_arr * factors


def _true_dynamics(p: EnvParams, dyn: TwoLinkParams, x, u_cmd):
    """Continuous dynamics of the TRUE plant: rigid arm `dyn` + tip payload +
    joint friction + torque gain/bias."""
    q1, q2, dq1, dq2 = x[0], x[1], x[2], x[3]
    m11, m12, m22, g1, g2, h = twolink._mass_gravity(dyn, q1, q2)

    mp = p.payload_m
    if mp > 0.0:
        # Point mass at the link-2 tip (distance l2 along link 2): exact
        # augmentation of M(q), the Coriolis coefficient, and gravity.
        c2 = jnp.cos(q2)
        m11 = m11 + mp * (dyn.l1**2 + dyn.l2**2 + 2.0 * dyn.l1 * dyn.l2 * c2)
        m12 = m12 + mp * (dyn.l2**2 + dyn.l1 * dyn.l2 * c2)
        m22 = m22 + mp * dyn.l2**2
        h = h + mp * dyn.l1 * dyn.l2 * jnp.sin(q2)
        g1 = g1 + mp * GRAVITY * (dyn.l1 * jnp.cos(q1) + dyn.l2 * jnp.cos(q1 + q2))
        g2 = g2 + mp * GRAVITY * dyn.l2 * jnp.cos(q1 + q2)

    tau1 = p.gain * u_cmd[0] + p.bias1 - p.friction1 * dq1
    tau2 = p.gain * u_cmd[1] + p.bias2 - p.friction2 * dq2
    c1 = -h * dq2 * (2.0 * dq1 + dq2)
    c2v = h * dq1 * dq1
    r1 = tau1 - c1 - g1
    r2 = tau2 - c2v - g2
    det = m11 * m22 - m12 * m12
    ddq1 = (m22 * r1 - m12 * r2) / det
    ddq2 = (m11 * r2 - m12 * r1) / det
    return jnp.stack([dq1, dq2, ddq1, ddq2])


@partial(jax.jit, static_argnums=0)
def env_reset(p: EnvParams, seed_key: jax.Array) -> tuple[EnvState, jax.Array]:
    traj0 = make_trajectory(p)[0]
    key, sub = jax.random.split(seed_key)
    x0 = traj0 + p.init_noise * jax.random.normal(sub, traj0.shape, traj0.dtype)
    state = EnvState(x=x0, t=jnp.asarray(0, jnp.int32), rng=key)
    return state, x0


@partial(jax.jit, static_argnums=0)
def env_step(
    p: EnvParams, state: EnvState, action: jax.Array
) -> tuple[EnvState, jax.Array, jax.Array, jax.Array, jax.Array]:
    return env_step_dynamic(p, params_to_array(p.params), state, action)


@partial(jax.jit, static_argnums=0)
def env_step_dynamic(
    p: EnvParams, params_arr: jax.Array, state: EnvState, action: jax.Array
) -> tuple[EnvState, jax.Array, jax.Array, jax.Array, jax.Array]:
    """One control step of the true plant (traced (4,) rigid coefficients for
    per-scenario randomized dynamics)."""
    dyn = TwoLinkParams(params_arr[0], params_arr[1], params_arr[2], params_arr[3])
    fc = lambda x_, u_: _true_dynamics(p, dyn, x_, u_)

    sub_dt = p.dt / p.sim_substeps
    x = state.x
    for _ in range(p.sim_substeps):
        x = twolink.rk4(fc, x, action, sub_dt)
    key = state.rng
    if p.noise_std > 0.0:
        key, sub = jax.random.split(key)
        x = x.at[jnp.array([2, 3])].add(
            p.noise_std * jnp.sqrt(p.dt) * jax.random.normal(sub, (2,), x.dtype)
        )
    t = state.t + 1

    ref = make_trajectory(p)[jnp.mod(t, p.n_steps)]
    err = x[:2] - ref[:2]
    reward = -jnp.sum(err**2)

    s_low, s_high = twolink.state_bounds()
    terminated = jnp.logical_or(jnp.any(x < 2 * s_low), jnp.any(x > 2 * s_high))
    truncated = t >= p.n_steps
    return EnvState(x=x, t=t, rng=key), x, reward, terminated, truncated


class TwoLinkTrackEnv:
    """Stateful gymnasium-like wrapper (mirror of the other env classes)."""

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
