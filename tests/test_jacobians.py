"""Analytic Jacobians must match jacfwd exactly (prior and GP-augmented)."""

import jax
import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.models.jacobians import (
    augmented_jacobians,
    make_augmented_fd_jac,
    prior_jacobians,
    rk4_discrete_jacobians,
)
from gpmpc_tpu.models.quadrotor import PRIOR_PARAMS
from gpmpc_tpu.models.symbolic import symbolic_attitude


def rand_xu(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 0.3, 12), jnp.float64)
    u = jnp.asarray([0.35, 0.05, -0.08, 0.02], jnp.float64)
    return x, u


def test_prior_jacobians_match_jacfwd():
    model = symbolic_attitude(dt=0.02)
    for seed in (0, 1):
        x, u = rand_xu(seed)
        A, B = prior_jacobians(PRIOR_PARAMS, x, u)
        A_ref, B_ref = model.df_func(x, u)
        np.testing.assert_allclose(np.asarray(A), np.asarray(A_ref), atol=1e-10)
        np.testing.assert_allclose(np.asarray(B), np.asarray(B_ref), atol=1e-10)


def make_gp():
    from gpmpc_tpu.utils.benchkit import synthetic_gp_model

    return synthetic_gp_model(max_points=32, max_inducing=8, n_data=16, n_train=10)


def test_augmented_jacobians_match_jacfwd():
    from gpmpc_tpu.control.gpmpc import gp_residual

    model = symbolic_attitude(dt=0.02)
    gp = jax.tree.map(lambda a: a.astype(jnp.float64) if a.dtype == jnp.float32 else a, make_gp())
    fc = lambda x, u: model.fc_func(x, u) + gp_residual(gp, x, u)
    for seed in (0, 3):
        x, u = rand_xu(seed)
        A, B = augmented_jacobians(model, gp, x, u)
        A_ref = jax.jacfwd(fc, argnums=0)(x, u)
        B_ref = jax.jacfwd(fc, argnums=1)(x, u)
        np.testing.assert_allclose(np.asarray(A), np.asarray(A_ref), atol=1e-8)
        np.testing.assert_allclose(np.asarray(B), np.asarray(B_ref), atol=1e-8)


def test_rk4_discrete_jacobians_match_jacfwd():
    model = symbolic_attitude(dt=0.02)
    gp = jax.tree.map(lambda a: a.astype(jnp.float64) if a.dtype == jnp.float32 else a, make_gp())
    fd_jac = make_augmented_fd_jac(model, gp)
    from gpmpc_tpu.control.gpmpc import augmented_fd

    fd = lambda x, u: augmented_fd(model, gp, x, u)
    x, u = rand_xu(5)
    fnext, A, B = fd_jac(x, u)
    np.testing.assert_allclose(np.asarray(fnext), np.asarray(fd(x, u)), atol=1e-10)
    A_ref = jax.jacfwd(fd, argnums=0)(x, u)
    B_ref = jax.jacfwd(fd, argnums=1)(x, u)
    np.testing.assert_allclose(np.asarray(A), np.asarray(A_ref), atol=1e-8)
    np.testing.assert_allclose(np.asarray(B), np.asarray(B_ref), atol=1e-8)
