"""Pallas GP posterior kernel parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.ops.pallas_gp import gp_mean_var, gp_mean_var_reference


def make_problem(n=70, m=128, d=3, seed=0):
    rng = np.random.default_rng(seed)
    n_active = 50
    Z = np.zeros((m, d), np.float32)
    Z[:n_active] = rng.normal(size=(n_active, d))
    mask = np.zeros(m, np.float32)
    mask[:n_active] = 1.0
    y = rng.normal(size=m).astype(np.float32) * mask
    ell, sf2, noise = 0.9, 1.3, 0.05
    diff = (Z[:, None, :] - Z[None, :, :]) / ell
    K = sf2 * np.exp(-0.5 * (diff**2).sum(-1)) * np.outer(mask, mask)
    K += np.diag(noise * mask + (1 - mask))
    K_inv = np.linalg.inv(K)
    alpha = K_inv @ y
    z = rng.normal(size=(n, d)).astype(np.float32)
    return (
        jnp.asarray(z), jnp.asarray(Z), jnp.asarray(alpha), jnp.asarray(K_inv, jnp.float32),
        jnp.asarray(ell, jnp.float32), jnp.asarray(sf2, jnp.float32),
        jnp.asarray(noise, jnp.float32), jnp.asarray(mask),
    )


def test_pallas_kernel_matches_reference_interpret():
    args = make_problem()
    mean_k, var_k = gp_mean_var(*args, include_noise=True, interpret=True)
    mean_r, var_r = gp_mean_var_reference(*args, include_noise=True)
    np.testing.assert_allclose(np.asarray(mean_k), np.asarray(mean_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(var_k), np.asarray(var_r), atol=1e-4)


def test_pallas_kernel_nonmultiple_tile():
    args = make_problem(n=130)  # forces padding to 256
    mean_k, var_k = gp_mean_var(*args, interpret=True)
    mean_r, var_r = gp_mean_var_reference(*args)
    assert mean_k.shape == (130,)
    np.testing.assert_allclose(np.asarray(mean_k), np.asarray(mean_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(var_k), np.asarray(var_r), atol=1e-4)


def test_reference_matches_exact_gp_module():
    """The K_inv-based variance equals the Cholesky-based exact_gp variance."""
    from gpmpc_tpu.gp.exact_gp import GPData, GPHypers, posterior, predict_var

    z, Z, alpha, K_inv, ell, sf2, noise, mask = make_problem()
    # invert the softplus transforms to build equivalent raw hypers
    inv_softplus = lambda v: float(np.log(np.expm1(v)))
    h = GPHypers(
        raw_lengthscale=jnp.asarray(inv_softplus(0.9), jnp.float64),
        raw_outputscale=jnp.asarray(inv_softplus(1.3), jnp.float64),
        raw_noise=jnp.asarray(inv_softplus(0.05 - 1e-6), jnp.float64),
    )
    data = GPData(x=Z.astype(jnp.float64), y=jnp.zeros(Z.shape[0], jnp.float64), mask=mask.astype(jnp.float64))
    post = posterior(h, data)
    var_chol = predict_var(h, data, post, z.astype(jnp.float64), include_noise=False)
    _, var_kinv = gp_mean_var_reference(*(a.astype(jnp.float64) for a in (z, Z, alpha, K_inv)), ell, sf2, noise, mask.astype(jnp.float64))
    # exact_gp adds a 1e-6*sf2 jitter the numpy K here doesn't have -> small atol
    np.testing.assert_allclose(np.asarray(var_kinv), np.asarray(var_chol), atol=1e-4)


def test_batched_variances_pallas_matches_xla():
    """The hot-path integration: batched_variances routed through the fused
    Pallas kernel equals the XLA quadratic-form path (exact and FITC modes)."""
    from gpmpc_tpu.control.gpmpc import batched_variances
    from gpmpc_tpu.utils.benchkit import synthetic_gp_model

    for sparse in (True, False):
        gp = synthetic_gp_model(
            max_points=32, max_inducing=12 if sparse else 32, n_data=24, n_train=10,
            seed=3,
        )
        rng = np.random.default_rng(0)
        z = jnp.asarray(rng.normal(0, 0.4, (3, 4, 5, 3)).astype(np.float32))
        v_xla = batched_variances(gp, z, backend="xla")
        v_pallas = batched_variances(gp, z, backend="pallas", interpret=True)
        np.testing.assert_allclose(
            np.asarray(v_pallas), np.asarray(v_xla), rtol=2e-4, atol=1e-6
        )


def test_batched_prepare_step_matches_vmap_prepare_step():
    from gpmpc_tpu.control import gpmpc as gpmpc_mod
    from gpmpc_tpu.control import mpc as mpc_mod
    from gpmpc_tpu.control.gpmpc import GPMPC
    from gpmpc_tpu.envs.drone import DroneFigureEightEnv
    from gpmpc_tpu.models.symbolic import symbolic_attitude
    from gpmpc_tpu.utils.benchkit import Q_MPC, R_MPC, reference_prior_dict, synthetic_gp_model

    prior = reference_prior_dict()
    env = DroneFigureEightEnv()
    model = symbolic_attitude(dt=0.02, params=prior)
    ctrl = GPMPC(model, env.trajectory, prior, horizon=6, q_mpc=Q_MPC, r_mpc=R_MPC,
                 sparse_gp=True, max_gp_samples=10, seed=0, max_gp_points=32,
                 sqp_iters=2, qp_iters=4)
    gp = synthetic_gp_model(max_points=32, max_inducing=10, n_data=24, n_train=10)
    B = 3
    rng = np.random.default_rng(1)
    obs = jnp.asarray(env.trajectory[:B] + 0.01 * rng.normal(size=(B, 12)), jnp.float32)
    states = jax.vmap(lambda i: mpc_mod.init_state(6, 12, 4))(jnp.arange(B))
    # advance traj_step so tightening is active
    states = states._replace(
        traj_step=jnp.ones(B, jnp.int32),
        X_warm=jnp.tile(obs[:, None, :], (1, 7, 1)),
    )
    ref = jax.vmap(lambda s, o: gpmpc_mod.prepare_step(model, ctrl.consts, gp, s, o))(states, obs)
    got = gpmpc_mod.batched_prepare_step(model, ctrl.consts, gp, states, obs, var_backend="xla")
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6)


def test_pallas_kernel_ard_matches_reference():
    """(D,) ARD lengthscales through the fused kernel (round-3: ARD on the
    fast paths — the kernel takes per-dimension reciprocal squares)."""
    z, Z, alpha, K_inv, _, sf2, noise, mask = make_problem(seed=3)
    ell = jnp.asarray([0.7, 1.1, 1.6], jnp.float32)
    # rebuild a consistent K_inv/alpha for the ARD kernel
    Zn = np.asarray(Z)
    mask_n = np.asarray(mask)
    diff = (Zn[:, None, :] - Zn[None, :, :]) / np.asarray(ell)
    K = 1.3 * np.exp(-0.5 * (diff**2).sum(-1)) * np.outer(mask_n, mask_n)
    K += np.diag(0.05 * mask_n + (1 - mask_n))
    K_inv = jnp.asarray(np.linalg.inv(K), jnp.float32)
    alpha = K_inv @ (jnp.asarray(np.asarray(alpha)))
    mean_k, var_k = gp_mean_var(
        z, Z, alpha, K_inv, ell, sf2, noise, mask, include_noise=True, interpret=True
    )
    mean_r, var_r = gp_mean_var_reference(
        z, Z, alpha, K_inv, ell, sf2, noise, mask, include_noise=True
    )
    # means reach ~6 here (reused-alpha targets): 5e-4 is ~1e-4 relative
    np.testing.assert_allclose(np.asarray(mean_k), np.asarray(mean_r), atol=5e-4)
    np.testing.assert_allclose(np.asarray(var_k), np.asarray(var_r), atol=5e-4)
