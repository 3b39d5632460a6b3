"""Shared helpers for benchmarks and entry points.

Consolidates the reference prior-parameter dict (single source of truth:
models/quadrotor.PRIOR_PARAMS ≙ scripts/gp_mpc_config.yaml:9-17 of the reference)
and the synthetic residual dataset + trained GpModel used by bench.py,
scripts/bench_scaling.py, scripts/run_multihost.py, and __graft_entry__.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.models.quadrotor import PRIOR_PARAMS

Q_MPC = [8, 0.1, 8, 0.1, 8, 0.1, 0.5, 0.5, 0.5, 0.001, 0.001, 0.001]
R_MPC = [3, 3, 3, 0.1]


def reference_prior_dict() -> dict:
    """The reference config's prior-parameter dict (gp_mpc_config.yaml:9-17)."""
    return dict(zip("abcdefhl", PRIOR_PARAMS))


def synthetic_residual_dataset(n: int = 60, seed: int = 0):
    """A plausible GP residual dataset at the reference's scale: a thrust-map
    deficit of ~4 m/s^2 plus small attitude-rate residuals (matches what the
    learning loop actually produces; see preprocess_data)."""
    rng = np.random.default_rng(seed)
    x7 = np.zeros((n, 7), np.float32)
    x7[:, 0] = rng.uniform(0.2, 0.5, n)  # thrust command
    x7[:, 1:] = rng.normal(0, 0.2, (n, 6))
    y3 = np.stack(
        [
            4.0 + 0.5 * np.sin(5 * x7[:, 0]) + 0.01 * rng.normal(size=n),
            0.1 * x7[:, 1] + 0.01 * rng.normal(size=n),
            0.1 * x7[:, 4] + 0.01 * rng.normal(size=n),
        ],
        axis=1,
    ).astype(np.float32)
    return x7, y3


def synthetic_gp_model(
    max_points: int = 128,
    max_inducing: int = 40,
    n_data: int = 60,
    n_train: int = 30,
    seed: int = 0,
    ard: bool = False,
):
    """Train a GpModel on the synthetic dataset (jitted; cached per shapes)."""
    from gpmpc_tpu.control.gpmpc import pack_training_data, train_gp_models

    x7, y3 = synthetic_residual_dataset(n_data, seed)
    data = pack_training_data(jnp.asarray(x7), jnp.asarray(y3), max_points)
    fit = jax.jit(
        lambda d, k: train_gp_models(
            d, k, sparse=True, max_inducing=max_inducing, n_train=n_train, lr=0.05,
            ard=ard,
        )
    )
    return fit(data, jax.random.PRNGKey(seed))


def synthetic_cartpole_gp_model(
    max_points: int = 128,
    max_inducing: int = 40,
    n_data: int = 60,
    n_train: int = 30,
    seed: int = 0,
):
    """Cartpole GP ensemble (G=2, D=3) on synthetic acceleration residuals —
    the cartpole analogue of `synthetic_gp_model`, for family-generic benches."""
    from gpmpc_tpu.control.gpmpc import pack_training_data, train_gp_models
    from gpmpc_tpu.models.residual import CARTPOLE_SPEC

    rng = np.random.default_rng(seed)
    xz = np.zeros((n_data, 4), np.float32)  # z = [x_dot, theta, theta_dot, F]
    xz[:, 0] = rng.normal(0, 0.5, n_data)
    xz[:, 1] = rng.normal(0, 0.2, n_data)
    xz[:, 2] = rng.normal(0, 0.5, n_data)
    xz[:, 3] = rng.uniform(-6.0, 6.0, n_data)
    y = np.stack(
        [
            -0.4 * xz[:, 0] + 0.12 * xz[:, 3] + 0.01 * rng.normal(size=n_data),
            -0.5 * xz[:, 2] - 0.3 * xz[:, 1] + 0.01 * rng.normal(size=n_data),
        ],
        axis=1,
    ).astype(np.float32)
    data = pack_training_data(jnp.asarray(xz), jnp.asarray(y), max_points, CARTPOLE_SPEC)
    fit = jax.jit(
        lambda d, k: train_gp_models(
            d, k, sparse=True, max_inducing=max_inducing, n_train=n_train, lr=0.05
        )
    )
    return fit(data, jax.random.PRNGKey(seed))


def synthetic_twolink_gp_model(
    max_points: int = 128,
    max_inducing: int = 40,
    n_data: int = 60,
    n_train: int = 30,
    seed: int = 0,
):
    """Two-link GP ensemble (G=2, D=6) on synthetic acceleration residuals."""
    from gpmpc_tpu.control.gpmpc import pack_training_data, train_gp_models
    from gpmpc_tpu.models.residual import TWOLINK_SPEC

    rng = np.random.default_rng(seed)
    xz = np.zeros((n_data, 6), np.float32)  # z = [q1, q2, dq1, dq2, t1/10, t2/10]
    xz[:, 0] = rng.uniform(-2.0, 0.0, n_data)
    xz[:, 1] = rng.uniform(0.0, 1.5, n_data)
    xz[:, 2:4] = rng.normal(0, 0.5, (n_data, 2))
    xz[:, 4:] = rng.uniform(-1.0, 1.0, (n_data, 2))
    y = np.stack(
        [
            1.5 + 0.4 * np.sin(xz[:, 1]) + 0.8 * xz[:, 4] + 0.01 * rng.normal(size=n_data),
            -9.0 - 0.5 * xz[:, 2] + 0.6 * xz[:, 5] + 0.01 * rng.normal(size=n_data),
        ],
        axis=1,
    ).astype(np.float32)
    data = pack_training_data(jnp.asarray(xz), jnp.asarray(y), max_points, TWOLINK_SPEC)
    fit = jax.jit(
        lambda d, k: train_gp_models(
            d, k, sparse=True, max_inducing=max_inducing, n_train=n_train, lr=0.05
        )
    )
    return fit(data, jax.random.PRNGKey(seed))
