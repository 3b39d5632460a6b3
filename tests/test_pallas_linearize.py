"""Parity: lane-packed linearization kernel vs jacfwd and analytic-chain paths."""

import jax
import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.control.gpmpc import augmented_fd
from gpmpc_tpu.envs.drone import DroneFigureEightEnv
from gpmpc_tpu.models.symbolic import symbolic_attitude
from gpmpc_tpu.ops.pallas_linearize import linearize_ocp_lanes
from gpmpc_tpu.utils.benchkit import reference_prior_dict, synthetic_gp_model
import pytest

L = 128
T = 5


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(0, 0.3, (T + 1, 12, L)).astype(np.float32)
    U = np.stack(
        [
            rng.uniform(0.15, 0.55, (T, L)),
            rng.uniform(-0.3, 0.3, (T, L)),
            rng.uniform(-0.3, 0.3, (T, L)),
            rng.uniform(-0.3, 0.3, (T, L)),
        ],
        axis=1,
    ).astype(np.float32)
    return jnp.asarray(X), jnp.asarray(U)


def kernel_args(gp):
    prior = reference_prior_dict()
    params8 = jnp.asarray([prior[k] for k in "abcdefhl"], jnp.float32)
    ell = jax.nn.softplus(gp.hypers.raw_lengthscale)  # (3,) or (3, D)
    sf2 = jax.nn.softplus(gp.hypers.raw_outputscale)
    G, D = gp.Zs.shape[0], gp.Zs.shape[-1]
    inv_ell2 = jnp.broadcast_to((1.0 / (ell * ell)).reshape(G, -1), (G, D))
    hyp = jnp.concatenate([sf2[:, None], inv_ell2], axis=1)  # (3, 1+D)
    return params8, hyp


def test_linearize_lanes_matches_jacfwd():
    prior = reference_prior_dict()
    model = symbolic_attitude(dt=0.02, params=prior)
    gp = synthetic_gp_model(max_points=32, max_inducing=12, n_data=24, n_train=10)
    X, U = make_inputs(0)

    params8, hyp = kernel_args(gp)
    fnext, A, B = linearize_ocp_lanes(
        params8, hyp, gp.Zs, gp.alpha_s, X, U, dt=0.02, use_gp=True, interpret=True
    )

    # Reference: jacfwd through the jnp augmented dynamics, per (stage, lane).
    fd = lambda x, u: augmented_fd(model, gp, x, u)
    fd_jac = jax.vmap(jax.vmap(jax.jacfwd(fd, argnums=(0, 1))))
    fd_batch = jax.vmap(jax.vmap(fd))
    Xb = jnp.moveaxis(X[:-1], -1, 0)  # (L, T, 12)
    Ub = jnp.moveaxis(U, -1, 0)
    A_ref, B_ref = fd_jac(Xb, Ub)  # (L, T, 12, 12), (L, T, 12, 4)
    f_ref = fd_batch(Xb, Ub)

    np.testing.assert_allclose(
        np.moveaxis(np.asarray(fnext), -1, 0), np.asarray(f_ref), atol=2e-5
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(A), -1, 0), np.asarray(A_ref), atol=2e-4
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(B), -1, 0), np.asarray(B_ref), atol=2e-4
    )


def test_linearize_lanes_prior_only():
    """use_gp=False must equal jacfwd of the bare prior dynamics."""
    prior = reference_prior_dict()
    model = symbolic_attitude(dt=0.02, params=prior)
    gp = synthetic_gp_model(max_points=32, max_inducing=12, n_data=24, n_train=10)
    X, U = make_inputs(1)
    params8, hyp = kernel_args(gp)
    fnext, A, B = linearize_ocp_lanes(
        params8, hyp, gp.Zs, gp.alpha_s, X, U, dt=0.02, use_gp=False, interpret=True
    )
    fd = model.fd_func
    fd_jac = jax.vmap(jax.vmap(jax.jacfwd(fd, argnums=(0, 1))))
    Xb = jnp.moveaxis(X[:-1], -1, 0)
    Ub = jnp.moveaxis(U, -1, 0)
    A_ref, B_ref = fd_jac(Xb, Ub)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(A), -1, 0), np.asarray(A_ref), atol=2e-4
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(B), -1, 0), np.asarray(B_ref), atol=2e-4
    )


@pytest.mark.slow
def test_fused_lanes_step_matches_standard_lanes_step():
    """batched_select_action_lanes with kernel_linearize=True must match the
    jacfwd-based lanes path on the same batch."""
    from gpmpc_tpu.control import gpmpc as gpmpc_mod
    from gpmpc_tpu.control import mpc as mpc_mod
    from gpmpc_tpu.control.gpmpc import GPMPC
    from gpmpc_tpu.utils.benchkit import Q_MPC, R_MPC

    prior = reference_prior_dict()
    env = DroneFigureEightEnv()
    model = symbolic_attitude(dt=0.02, params=prior)
    ctrl = GPMPC(model, env.trajectory, prior, horizon=6, q_mpc=Q_MPC, r_mpc=R_MPC,
                 sparse_gp=True, max_gp_samples=10, seed=0, max_gp_points=32,
                 sqp_iters=3, qp_iters=6)
    gp = synthetic_gp_model(max_points=32, max_inducing=10, n_data=24, n_train=10)
    B = 4
    rng = np.random.default_rng(0)
    obs = jnp.asarray(
        np.asarray(env.trajectory[:B]) + 0.01 * rng.normal(size=(B, 12)), jnp.float32
    )
    states = jax.vmap(lambda i: mpc_mod.init_state(6, 12, 4))(jnp.arange(B))

    cfg_std = ctrl.cfg
    cfg_fused = ctrl.cfg._replace(kernel_linearize=True)
    u_std, st_std, info_std = gpmpc_mod.batched_select_action_lanes(
        model, cfg_std, ctrl.consts, gp, states, obs, interpret=True
    )
    u_fus, st_fus, info_fus = gpmpc_mod.batched_select_action_lanes(
        model, cfg_fused, ctrl.consts, gp, states, obs, interpret=True
    )
    np.testing.assert_allclose(np.asarray(u_fus), np.asarray(u_std), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(st_fus.X_warm), np.asarray(st_std.X_warm), atol=5e-3
    )


def test_linearize_lanes_ard_matches_jacfwd():
    """ARD lengthscales through the in-kernel linearizer (round-3: the fused
    path no longer falls back to jacfwd for ARD models)."""
    prior = reference_prior_dict()
    model = symbolic_attitude(dt=0.02, params=prior)
    gp = synthetic_gp_model(max_points=32, max_inducing=12, n_data=24, n_train=10,
                            ard=True)
    assert gp.hypers.raw_lengthscale.shape == (3, 3)
    X, U = make_inputs(1)

    params8, hyp = kernel_args(gp)
    assert hyp.shape == (3, 4)
    fnext, A, B = linearize_ocp_lanes(
        params8, hyp, gp.Zs, gp.alpha_s, X, U, dt=0.02, use_gp=True, interpret=True
    )

    fd = lambda x, u: augmented_fd(model, gp, x, u)
    fd_jac = jax.vmap(jax.vmap(jax.jacfwd(fd, argnums=(0, 1))))
    fd_batch = jax.vmap(jax.vmap(fd))
    Xb = jnp.moveaxis(X[:-1], -1, 0)
    Ub = jnp.moveaxis(U, -1, 0)
    A_ref, B_ref = fd_jac(Xb, Ub)
    f_ref = fd_batch(Xb, Ub)

    np.testing.assert_allclose(
        np.moveaxis(np.asarray(fnext), -1, 0), np.asarray(f_ref), atol=2e-5
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(A), -1, 0), np.asarray(A_ref), atol=2e-4
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(B), -1, 0), np.asarray(B_ref), atol=2e-4
    )


# ---------------------------------------------------------------------------
# Cartpole family (the registry's second hand-derived closure)
# ---------------------------------------------------------------------------


def cartpole_gp(seed=0, n_data=24):
    """Train a small cartpole GP ensemble (G=2, D=3) on synthetic residuals."""
    from gpmpc_tpu.control.gpmpc import pack_training_data, train_gp_models
    from gpmpc_tpu.models.residual import CARTPOLE_SPEC

    rng = np.random.default_rng(seed)
    xz = rng.normal(0, 0.5, (n_data, 4)).astype(np.float32)  # z = [dx, th, om, F]
    y = np.stack(
        [
            0.3 * np.sin(xz[:, 0]) + 0.1 * xz[:, 3],
            -0.4 * xz[:, 1] + 0.2 * np.cos(xz[:, 2]),
        ],
        axis=1,
    ).astype(np.float32)
    data = pack_training_data(jnp.asarray(xz), jnp.asarray(y), 32, CARTPOLE_SPEC)
    fit = jax.jit(
        lambda d, k: train_gp_models(
            d, k, sparse=True, max_inducing=10, n_train=10, lr=0.05
        )
    )
    return fit(data, jax.random.PRNGKey(seed))


def make_cartpole_inputs(seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(0, 0.3, (T + 1, 4, L)).astype(np.float32)
    U = rng.uniform(-5.0, 5.0, (T, 1, L)).astype(np.float32)
    return jnp.asarray(X), jnp.asarray(U)


def test_linearize_lanes_cartpole_matches_jacfwd():
    """The cartpole closure of the family registry vs jacfwd through the jnp
    GP-augmented cartpole dynamics — same contract the quadrotor test checks."""
    from gpmpc_tpu.models.cartpole import symbolic_cartpole
    from gpmpc_tpu.models.residual import CARTPOLE_SPEC

    model = symbolic_cartpole(dt=0.02)
    gp = cartpole_gp(0)
    assert gp.Zs.shape[0] == 2 and gp.Zs.shape[-1] == 3
    X, U = make_cartpole_inputs(0)

    params8 = CARTPOLE_SPEC.kernel_params(model.params)
    ell = jax.nn.softplus(gp.hypers.raw_lengthscale)
    sf2 = jax.nn.softplus(gp.hypers.raw_outputscale)
    G, D = gp.Zs.shape[0], gp.Zs.shape[-1]
    inv_ell2 = jnp.broadcast_to((1.0 / (ell * ell)).reshape(G, -1), (G, D))
    hyp = jnp.concatenate([sf2[:, None], inv_ell2], axis=1)
    assert hyp.shape == (2, 4)

    fnext, A, B = linearize_ocp_lanes(
        params8, hyp, gp.Zs, gp.alpha_s, X, U, dt=0.02, use_gp=True,
        interpret=True, family="cartpole",
    )

    fd = lambda x, u: augmented_fd(model, gp, x, u)
    fd_jac = jax.vmap(jax.vmap(jax.jacfwd(fd, argnums=(0, 1))))
    fd_batch = jax.vmap(jax.vmap(fd))
    Xb = jnp.moveaxis(X[:-1], -1, 0)  # (L, T, 4)
    Ub = jnp.moveaxis(U, -1, 0)
    A_ref, B_ref = fd_jac(Xb, Ub)
    f_ref = fd_batch(Xb, Ub)

    np.testing.assert_allclose(
        np.moveaxis(np.asarray(fnext), -1, 0), np.asarray(f_ref), atol=2e-5
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(A), -1, 0), np.asarray(A_ref), atol=2e-4
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(B), -1, 0), np.asarray(B_ref), atol=2e-4
    )


def test_linearize_lanes_unknown_family_raises():
    from gpmpc_tpu.models.cartpole import symbolic_cartpole
    from gpmpc_tpu.models.residual import CARTPOLE_SPEC

    model = symbolic_cartpole(dt=0.02)
    gp = cartpole_gp(0)
    X, U = make_cartpole_inputs(0)
    params8 = CARTPOLE_SPEC.kernel_params(model.params)
    hyp = jnp.ones((2, 4), jnp.float32)
    with pytest.raises(ValueError, match="hand-derived kernel linearizer"):
        linearize_ocp_lanes(
            params8, hyp, gp.Zs, gp.alpha_s, X, U, dt=0.02, use_gp=True,
            interpret=True, family="unicycle",
        )


@pytest.mark.slow
def test_fused_lanes_step_matches_standard_lanes_step_cartpole():
    """kernel_linearize=True on the CARTPOLE family must match the jacfwd-based
    lanes path — the fused fast path is no longer quadrotor-only."""
    from gpmpc_tpu.control import gpmpc as gpmpc_mod
    from gpmpc_tpu.control import mpc as mpc_mod
    from gpmpc_tpu.control.gpmpc import GPMPC
    from gpmpc_tpu.envs import cartpole_env
    from gpmpc_tpu.models import cartpole

    env = cartpole_env.CartpoleTrackEnv(cartpole_env.EnvParams.default())
    model = cartpole.symbolic_cartpole(dt=0.02)
    ctrl = GPMPC(
        model, env.trajectory, None, horizon=6,
        q_mpc=[5.0, 0.1, 20.0, 0.5], r_mpc=[0.05],
        sparse_gp=True, max_gp_samples=10, seed=0, max_gp_points=32,
        sqp_iters=3, qp_iters=6,
        bounds=(cartpole.state_bounds(), cartpole.input_bounds()),
    )
    gp = cartpole_gp(0)
    B = 4
    rng = np.random.default_rng(0)
    obs = jnp.asarray(
        np.asarray(env.trajectory[:B]) + 0.01 * rng.normal(size=(B, 4)), jnp.float32
    )
    states = jax.vmap(lambda i: mpc_mod.init_state(6, 4, 1))(jnp.arange(B))

    cfg_std = ctrl.cfg
    cfg_fused = ctrl.cfg._replace(kernel_linearize=True)
    u_std, st_std, info_std = gpmpc_mod.batched_select_action_lanes(
        model, cfg_std, ctrl.consts, gp, states, obs, interpret=True
    )
    u_fus, st_fus, info_fus = gpmpc_mod.batched_select_action_lanes(
        model, cfg_fused, ctrl.consts, gp, states, obs, interpret=True
    )
    np.testing.assert_allclose(np.asarray(u_fus), np.asarray(u_std), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(st_fus.X_warm), np.asarray(st_std.X_warm), atol=5e-3
    )


# ---------------------------------------------------------------------------
# Two-link arm family (D=6 GP inputs through the generic _gp_mean_grad)
# ---------------------------------------------------------------------------


def twolink_gp(seed=0, n_data=24):
    """Train a small two-link GP ensemble (G=2, D=6) on synthetic residuals."""
    from gpmpc_tpu.control.gpmpc import pack_training_data, train_gp_models
    from gpmpc_tpu.models.residual import TWOLINK_SPEC

    rng = np.random.default_rng(seed)
    xz = rng.normal(0, 0.4, (n_data, 6)).astype(np.float32)
    y = np.stack(
        [
            0.5 * np.sin(xz[:, 1]) + 0.3 * xz[:, 4],
            -0.6 * xz[:, 0] + 0.2 * np.cos(xz[:, 3]) + 0.2 * xz[:, 5],
        ],
        axis=1,
    ).astype(np.float32)
    data = pack_training_data(jnp.asarray(xz), jnp.asarray(y), 32, TWOLINK_SPEC)
    fit = jax.jit(
        lambda d, k: train_gp_models(
            d, k, sparse=True, max_inducing=10, n_train=10, lr=0.05
        )
    )
    return fit(data, jax.random.PRNGKey(seed))


def test_linearize_lanes_twolink_matches_jacfwd():
    """Third family registry closure vs jacfwd through the jnp GP-augmented
    two-link dynamics."""
    from gpmpc_tpu.models.twolink import symbolic_twolink
    from gpmpc_tpu.models.residual import TWOLINK_SPEC

    model = symbolic_twolink(dt=0.02)
    gp = twolink_gp(0)
    assert gp.Zs.shape[0] == 2 and gp.Zs.shape[-1] == 6
    rng = np.random.default_rng(2)
    X = jnp.asarray(
        np.stack([
            rng.uniform(-2.0, 0.2, (T + 1, L)),
            rng.uniform(-0.4, 1.8, (T + 1, L)),
            rng.normal(0, 0.8, (T + 1, L)),
            rng.normal(0, 0.8, (T + 1, L)),
        ], axis=1).astype(np.float32))
    U = jnp.asarray(rng.uniform(-12.0, 12.0, (T, 2, L)).astype(np.float32))

    params8 = TWOLINK_SPEC.kernel_params(model.params)
    ell = jax.nn.softplus(gp.hypers.raw_lengthscale)
    sf2 = jax.nn.softplus(gp.hypers.raw_outputscale)
    G, D = gp.Zs.shape[0], gp.Zs.shape[-1]
    inv_ell2 = jnp.broadcast_to((1.0 / (ell * ell)).reshape(G, -1), (G, D))
    hyp = jnp.concatenate([sf2[:, None], inv_ell2], axis=1)
    assert hyp.shape == (2, 7)

    fnext, A, B = linearize_ocp_lanes(
        params8, hyp, gp.Zs, gp.alpha_s, X, U, dt=0.02, use_gp=True,
        interpret=True, family="twolink",
    )

    fd = lambda x, u: augmented_fd(model, gp, x, u)
    fd_jac = jax.vmap(jax.vmap(jax.jacfwd(fd, argnums=(0, 1))))
    fd_batch = jax.vmap(jax.vmap(fd))
    Xb = jnp.moveaxis(X[:-1], -1, 0)  # (L, T, 4)
    Ub = jnp.moveaxis(U, -1, 0)
    A_ref, B_ref = fd_jac(Xb, Ub)
    f_ref = fd_batch(Xb, Ub)

    np.testing.assert_allclose(
        np.moveaxis(np.asarray(fnext), -1, 0), np.asarray(f_ref), atol=5e-5
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(A), -1, 0), np.asarray(A_ref), atol=5e-4
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(B), -1, 0), np.asarray(B_ref), atol=5e-4
    )


@pytest.mark.slow
def test_fused_lanes_step_matches_standard_lanes_step_twolink():
    """kernel_linearize=True on the TWOLINK family must match the jacfwd-based
    lanes path — all three families ride the fused fast path."""
    from gpmpc_tpu.control import gpmpc as gpmpc_mod
    from gpmpc_tpu.control import mpc as mpc_mod
    from gpmpc_tpu.control.gpmpc import GPMPC
    from gpmpc_tpu.envs import twolink_env
    from gpmpc_tpu.models import twolink

    env = twolink_env.TwoLinkTrackEnv(twolink_env.EnvParams.default())
    model = twolink.symbolic_twolink(dt=0.02)
    ctrl = GPMPC(
        model, env.trajectory, None, horizon=6,
        q_mpc=[20.0, 20.0, 0.5, 0.5], r_mpc=[0.1, 0.1],
        sparse_gp=True, max_gp_samples=10, seed=0, max_gp_points=32,
        sqp_iters=3, qp_iters=6, lm_reg=0.5,
        bounds=(twolink.state_bounds(), twolink.input_bounds()),
    )
    gp = twolink_gp(0)
    B = 4
    rng = np.random.default_rng(0)
    obs = jnp.asarray(
        np.asarray(env.trajectory[:B]) + 0.01 * rng.normal(size=(B, 4)), jnp.float32
    )
    states = jax.vmap(lambda i: mpc_mod.init_state(6, 4, 2))(jnp.arange(B))

    cfg_std = ctrl.cfg
    cfg_fused = ctrl.cfg._replace(kernel_linearize=True)
    u_std, st_std, info_std = gpmpc_mod.batched_select_action_lanes(
        model, cfg_std, ctrl.consts, gp, states, obs, interpret=True
    )
    u_fus, st_fus, info_fus = gpmpc_mod.batched_select_action_lanes(
        model, cfg_fused, ctrl.consts, gp, states, obs, interpret=True
    )
    np.testing.assert_allclose(np.asarray(u_fus), np.asarray(u_std), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(st_fus.X_warm), np.asarray(st_std.X_warm), atol=5e-3
    )
