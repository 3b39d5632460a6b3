"""Cartpole model family.

The reference framework is single-model (the crazyflow quadrotor); this module
exists to demonstrate — and regression-test — that this framework's whole
OCP/SQP/IP stack is model-agnostic: every solver shape is derived from the
model's (nx, nu), nothing assumes the quadrotor's 12/4 layout
(tests/test_cartpole.py drives a full nx=4, nu=1 MPC loop through the same
`control/mpc.py` + `ops/sqp.py` path the quadrotor uses).

Dynamics: the classic pole-on-cart (Barto et al. / safe-control-gym form),
state [x, x_dot, theta, theta_dot] with theta = 0 the UPRIGHT (unstable)
equilibrium, input = horizontal force on the cart.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpmpc_tpu.models import quadrotor
from gpmpc_tpu.models.symbolic import SymbolicModel

NX = 4
NU = 1
GRAVITY = 9.81

IDX_X, IDX_DX, IDX_THETA, IDX_DTHETA = 0, 1, 2, 3


class CartpoleParams(NamedTuple):
    m_cart: float = 1.0  # kg
    m_pole: float = 0.1  # kg
    length: float = 0.5  # m, pivot -> pole center of mass


def continuous_dynamics(
    x: jax.Array, u: jax.Array, params: CartpoleParams = CartpoleParams()
) -> jax.Array:
    """f(x, u) -> dx/dt for the pole-on-cart."""
    mc, mp, ell = params.m_cart, params.m_pole, params.length
    theta, dtheta = x[IDX_THETA], x[IDX_DTHETA]
    force = u[0]
    total = mc + mp
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)

    tmp = (force + mp * ell * dtheta**2 * sin_t) / total
    dd_theta = (GRAVITY * sin_t - cos_t * tmp) / (
        ell * (4.0 / 3.0 - mp * cos_t**2 / total)
    )
    dd_x = tmp - mp * ell * dd_theta * cos_t / total
    return jnp.stack([x[IDX_DX], dd_x, dtheta, dd_theta])


def state_bounds(dtype=jnp.float32) -> tuple[jax.Array, jax.Array]:
    hi = jnp.asarray([2.4, 10.0, 0.8, 10.0], dtype)
    return -hi, hi


def input_bounds(dtype=jnp.float32) -> tuple[jax.Array, jax.Array]:
    hi = jnp.asarray([12.0], dtype)
    return -hi, hi


def symbolic_cartpole(
    dt: float = 0.02, params: CartpoleParams | None = None
) -> SymbolicModel:
    """Cartpole as a `SymbolicModel` — same contract `symbolic_attitude` gives
    the quadrotor, consumed unchanged by the MPC *and* GP-MPC stacks (the
    residual-GP structure rides along as CARTPOLE_SPEC)."""
    from gpmpc_tpu.models.residual import CARTPOLE_SPEC  # avoid import cycle

    p = params or CartpoleParams()
    fc = partial(continuous_dynamics, params=p)
    return SymbolicModel(
        nx=NX, nu=NU, dt=float(dt), params=p, fc_func=fc,
        residual_spec=CARTPOLE_SPEC,
    )


def upright_reference(n_steps: int, dtype=jnp.float32) -> jax.Array:
    """Constant stabilization reference: the upright equilibrium at the origin."""
    return jnp.zeros((n_steps, NX), dtype)


# Reuse the shared RK4 integrator (quadrotor.rk4 is model-agnostic).
rk4 = quadrotor.rk4
