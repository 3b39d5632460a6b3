"""Reference-trajectory generation.

Replaces the external crazyflow env's `DroneFigureEightXY-v0` trajectory attribute
(/root/reference/scripts/run_gp_mpc.py:150-151). The trajectory is a periodic
figure-eight (lemniscate of Gerono) in the X-Y plane at constant height, sampled on
the controller grid, with velocities filled in analytically so the tracking cost sees
a dynamically-consistent reference. Rows follow the canonical 12-state order
(/root/reference/gpmpc/plotting.py:198-211).
"""

from __future__ import annotations

import jax.numpy as jnp


def figure_eight_trajectory(
    n_steps: int = 300,
    dt: float = 0.02,
    amplitude: float = 0.8,
    height: float = 1.0,
    n_periods: int = 1,
) -> jnp.ndarray:
    """Periodic figure-eight reference, shape ``(n_steps, 12)``.

    x(t) = A sin(w t), y(t) = (A/2) sin(2 w t), z = height — one full period over
    ``n_steps * dt / n_periods`` seconds. The MPC windows into this array modulo its
    length (≙ MPC.reference_trajectory, /root/reference/gpmpc/mpc.py:188-193), so the
    array must tile periodically, which it does exactly.
    """
    t = jnp.arange(n_steps, dtype=jnp.float32) * dt
    w = 2.0 * jnp.pi * n_periods / (n_steps * dt)
    x = amplitude * jnp.sin(w * t)
    dx = amplitude * w * jnp.cos(w * t)
    y = 0.5 * amplitude * jnp.sin(2.0 * w * t)
    dy = amplitude * w * jnp.cos(2.0 * w * t)
    z = jnp.full_like(t, height)
    dz = jnp.zeros_like(t)
    zeros = jnp.zeros_like(t)
    # [x, dx, y, dy, z, dz, phi, theta, psi, dphi, dtheta, dpsi]
    traj = jnp.stack([x, dx, y, dy, z, dz] + [zeros] * 6, axis=1)
    return traj
