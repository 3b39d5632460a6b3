"""On-device cartpole tracking environment (second model family's plant).

Mirrors the module surface of `envs/drone.py` (`EnvParams`, `env_reset`,
`env_step` / `env_step_dynamic`, `params_to_array`, `randomize_params`,
`make_trajectory`) so the generic episode runners (`parallel/batch.py`) and the
learning sweep (`parallel/sweep.py`) drive either family through the same code
path — the point of the ResidualSpec layer (models/residual.py).

Like the drone env, the plant carries *structural* mismatch the controller's
prior model class cannot represent (the residual-GP layer exists to learn it):

  * different rigid-body parameters (heavier, longer pole than the prior fit);
  * viscous cart friction and pole pivot friction — neither exists in the
    prior's frictionless Barto dynamics (models/cartpole.py);
  * an actuation gain error (commanded force != applied force);
  * optional white process noise on the velocity rows.

`EnvParams.ideal()` zeroes all mismatch for solver-parity tests.

The task: track a slow sinusoidal cart-position reference while keeping the
pole upright — the cartpole analogue of the drone's figure-eight.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpmpc_tpu.models import cartpole
from gpmpc_tpu.models.cartpole import CartpoleParams

# The plant the controller's prior (CartpoleParams() defaults) was "fit" to:
# heavier and longer pole — rigid-parameter mismatch on top of the structural
# effects below.
TRUE_PARAMS = CartpoleParams(m_cart=1.0, m_pole=0.14, length=0.62)


class EnvParams(NamedTuple):
    params: CartpoleParams
    dt: float = 0.02
    n_steps: int = 300  # episode length == reference period
    sim_substeps: int = 2
    init_noise: float = 0.03
    traj_amplitude: float = 0.7  # cart-position sine amplitude [m]
    # Reference period in steps; None = one period per episode (n_steps).
    # Short test episodes set this explicitly so truncating the episode does
    # not speed the reference up into infeasibility.
    traj_period_steps: int | None = None
    # --- structural-mismatch plant parameters ---
    friction_cart: float = 0.25  # viscous cart friction [N s/m]
    friction_pole: float = 0.004  # pivot friction [N m s/rad]
    gain: float = 0.9  # actuation gain error (applied = gain * commanded)
    # Constant horizontal disturbance force on the cart [N] (a tilted track /
    # steady wind): the cartpole analogue of the quadrotor PRIOR's engineered
    # hover-thrust deficit — a persistent bias the prior model class cannot
    # represent but the residual GP learns from one episode.
    force_bias: float = 1.2
    noise_std: float = 0.0  # process noise on velocity rows

    @classmethod
    def default(cls) -> "EnvParams":
        return cls(params=TRUE_PARAMS)

    @classmethod
    def ideal(cls, **overrides) -> "EnvParams":
        """Pure prior-model-class plant (prior rigid params, no friction/gain
        mismatch): for solver-parity tests."""
        kw = dict(friction_cart=0.0, friction_pole=0.0, gain=1.0,
                  force_bias=0.0, noise_std=0.0)
        kw.update(overrides)
        return cls(params=CartpoleParams(), **kw)


class EnvState(NamedTuple):
    x: jax.Array  # (4,) true state
    t: jax.Array  # scalar int32 step counter
    rng: jax.Array


def make_trajectory(p: EnvParams) -> jax.Array:
    """Reference trajectory (n_steps, 4): sinusoidal cart position (with the
    consistent velocity row), pole upright."""
    period = p.traj_period_steps if p.traj_period_steps is not None else p.n_steps
    t = jnp.arange(p.n_steps, dtype=jnp.float32) * p.dt
    omega = 2.0 * math.pi / (period * p.dt)
    x_ref = p.traj_amplitude * jnp.sin(omega * t)
    dx_ref = p.traj_amplitude * omega * jnp.cos(omega * t)
    zero = jnp.zeros_like(x_ref)
    return jnp.stack([x_ref, dx_ref, zero, zero], axis=1)


def params_to_array(p: CartpoleParams) -> jax.Array:
    """CartpoleParams -> traced (3,) array [m_cart, m_pole, length]."""
    return jnp.asarray([p.m_cart, p.m_pole, p.length], jnp.float32)


def randomize_params(
    key: jax.Array, base: CartpoleParams, scale: float = 0.1
) -> jax.Array:
    """Per-scenario domain randomization (multiplicative truncated-normal
    jitter), same contract as envs/drone.py::randomize_params."""
    base_arr = params_to_array(base)
    factors = 1.0 + scale * jax.random.truncated_normal(
        key, -2.0, 2.0, (3,), dtype=base_arr.dtype
    )
    return base_arr * factors


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
    """One control step of the true plant (traced (3,) rigid coefficients, so
    scenario batches can carry per-scenario randomized dynamics)."""
    dyn = CartpoleParams(params_arr[0], params_arr[1], params_arr[2])

    def fc(x_, u_):
        # Gain error + constant disturbance force act exactly like a modified
        # applied force (both enter the cart-force balance).
        u_eff = p.gain * u_ + p.force_bias
        f = cartpole.continuous_dynamics(x_, u_eff, params=dyn)
        if p.friction_cart > 0.0 or p.friction_pole > 0.0:
            total = dyn.m_cart + dyn.m_pole
            f = f.at[cartpole.IDX_DX].add(
                -p.friction_cart * x_[cartpole.IDX_DX] / total
            )
            f = f.at[cartpole.IDX_DTHETA].add(
                -p.friction_pole
                * x_[cartpole.IDX_DTHETA]
                / (dyn.m_pole * dyn.length**2)
            )
        return f

    sub_dt = p.dt / p.sim_substeps
    x = state.x
    for _ in range(p.sim_substeps):
        x = cartpole.rk4(fc, x, action, sub_dt)
    key = state.rng
    if p.noise_std > 0.0:
        key, sub = jax.random.split(key)
        vel_rows = jnp.array([cartpole.IDX_DX, cartpole.IDX_DTHETA])
        x = x.at[vel_rows].add(
            p.noise_std * jnp.sqrt(p.dt) * jax.random.normal(sub, (2,), x.dtype)
        )
    t = state.t + 1

    ref = make_trajectory(p)[jnp.mod(t, p.n_steps)]
    err_pos = x[cartpole.IDX_X] - ref[cartpole.IDX_X]
    reward = -(err_pos**2 + x[cartpole.IDX_THETA] ** 2)

    s_low, s_high = cartpole.state_bounds()
    terminated = jnp.logical_or(jnp.any(x < 2 * s_low), jnp.any(x > 2 * s_high))
    truncated = t >= p.n_steps
    return EnvState(x=x, t=t, rng=key), x, reward, terminated, truncated


class CartpoleTrackEnv:
    """Stateful gymnasium-like wrapper (mirror of DroneFigureEightEnv)."""

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
