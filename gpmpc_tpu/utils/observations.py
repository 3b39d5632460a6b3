"""Observation-space adapters: quaternion sensor dicts -> canonical 12-state.

The reference's environment emits a dict observation with a quaternion attitude
and body angular velocity, flattened into the canonical Euler 12-state by
`flatten_obs` (/root/reference/scripts/run_gp_mpc.py:32-39, using scipy Rotation
and crazyflow's `ang_vel2rpy_rates`). The in-repo env observes the Euler state
directly, but any external (real or simulated) quadrotor source speaks
quaternions — these jnp adapters keep that migration path on-device.

Conventions: quaternions are (x, y, z, w) scalar-last (scipy order); Euler
angles are roll-pitch-yaw about extrinsic x-y-z axes (≙ scipy `as_euler("xyz")`);
angular velocity is in the body frame.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_euler(quat: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) scalar-last quaternion -> (..., 3) roll/pitch/yaw."""
    x, y, z, w = (quat[..., i] for i in range(4))
    roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw], axis=-1)


def euler_to_quat(rpy: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) roll/pitch/yaw -> (..., 4) scalar-last quaternion."""
    hr, hp, hy = (rpy[..., i] / 2.0 for i in range(3))
    cr, sr = jnp.cos(hr), jnp.sin(hr)
    cp, sp = jnp.cos(hp), jnp.sin(hp)
    cy, sy = jnp.cos(hy), jnp.sin(hy)
    return jnp.stack(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ],
        axis=-1,
    )


def ang_vel_to_rpy_rates(ang_vel: jnp.ndarray, rpy: jnp.ndarray) -> jnp.ndarray:
    """Body angular velocity (p, q, r) -> Euler-angle rates (dphi, dtheta, dpsi).

    ≙ crazyflow's `ang_vel2rpy_rates` role at run_gp_mpc.py:37. Standard
    kinematic relation for the xyz (roll-pitch-yaw) Euler chart.
    """
    p, q, r = (ang_vel[..., i] for i in range(3))
    phi, theta = rpy[..., 0], rpy[..., 1]
    sphi, cphi = jnp.sin(phi), jnp.cos(phi)
    tth = jnp.tan(theta)
    sec = 1.0 / jnp.cos(theta)
    d_phi = p + (q * sphi + r * cphi) * tth
    d_theta = q * cphi - r * sphi
    d_psi = (q * sphi + r * cphi) * sec
    return jnp.stack([d_phi, d_theta, d_psi], axis=-1)


def flatten_obs(obs: dict) -> jnp.ndarray:
    """Quaternion sensor dict -> canonical 12-state
    [x, dx, y, dy, z, dz, phi, theta, psi, dphi, dtheta, dpsi].

    ≙ flatten_obs, /root/reference/scripts/run_gp_mpc.py:32-39, as a traced jnp
    function (usable inside jitted pipelines, no scipy/host round-trip).
    Expects keys pos (3,), quat (4, scalar-last), vel (3,), ang_vel (3, body).
    """
    pos, vel = jnp.asarray(obs["pos"]), jnp.asarray(obs["vel"])
    rpy = quat_to_euler(jnp.asarray(obs["quat"]))
    rates = ang_vel_to_rpy_rates(jnp.asarray(obs["ang_vel"]), rpy)
    return jnp.concatenate(
        [
            jnp.stack([pos[0], vel[0], pos[1], vel[1], pos[2], vel[2]]),
            rpy,
            rates,
        ]
    )
