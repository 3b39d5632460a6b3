"""GP-MPC: nonlinear MPC with GP residual dynamics and chance-constraint tightening.

≙ /root/reference/gpmpc/gpmpc.py:15-514, rebuilt TPU-first. Key structural changes
from the reference (all behavior-preserving unless flagged as a documented quirk):

  * No codegen boundary. The reference re-generates and recompiles an acados C
    solver whenever the GP dataset size changes (gpmpc.py:97-108,213-218). Here the
    GP dataset lives in fixed-capacity padded buffers inside `GpModel`, which is a
    *runtime argument* of one jitted controller step — retraining the GP is a pure
    data update and never triggers recompilation.
  * No dual GP representation. The reference trains in GPyTorch and re-expresses
    the posterior mean in CasADi, synchronizing numerics at recompile time
    (gp.py:72-85, gpmpc.py:402-423). Here the same jnp kernel expression serves
    training, in-dynamics mean, and tightening variance.
  * The GP-augmented dynamics (setup_acados_model, gpmpc.py:166-221) are a traced
    function: prior f(x, u) plus the residual rotated into world axes by
    (cos phi sin theta, -sin phi, cos phi cos theta) at rows [1, 3, 5] and the
    phi/theta rate-residual rows [9, 10] (gpmpc.py:193-197), RK4-discretized.
  * Constraint tightening (propagate_constraint_limits, gpmpc.py:425-498) is a
    `lax.scan` over the horizon, and tightened constraints enter the QP directly
    as per-stage box bounds instead of acados runtime parameters.

Documented quirks deliberately not copied (SURVEY.md §7):
  * the x-axis variance rotation factor uses the mathematically consistent
    (cos phi sin theta)^2; the reference computes cos(phi) * sin(theta)^2
    (gpmpc.py:448) — a missing square on the cosine;
  * predictive variance excludes the likelihood noise term (the reference adds
    noise twice: once inside `gp.likelihood(...)` at gpmpc.py:444 and again via
    cov_noise_batch at gpmpc.py:459-465); the noise still enters once through
    cov_noise, matching intent;
  * preprocessing uses the actual env dt rather than a hardcoded 1/60
    (gpmpc.py:127);
  * posterior weights come from Cholesky solves, not dense inverses (gp.py:46).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.control import mpc as mpc_mod
from gpmpc_tpu.control.mpc import MPC, MpcConsts, MpcState
from gpmpc_tpu.gp.exact_gp import (
    GPData,
    GPHypers,
    fit_gp,
    init_hypers,
    posterior,
)
from gpmpc_tpu.gp.kernels import se_kernel
from gpmpc_tpu.gp.sparse import fitc_posterior, select_inducing
from gpmpc_tpu.models import quadrotor
from gpmpc_tpu.models.quadrotor import GRAVITY, QuadrotorParams
from gpmpc_tpu.models.symbolic import SymbolicModel
from gpmpc_tpu.ops import discretize_linear_system, lqr_gain_discrete
from gpmpc_tpu.ops.sqp import OcpBounds, SqpConfig, sqp_solve

# Uncertainty enters rows [dx, dy, dz, dphi, dtheta] (gpmpc.py:68-69).
UNCERTAIN_DIM = (1, 3, 5, 9, 10)
# GP input layout: [thrust | phi, dphi, phi_cmd | theta, dtheta, theta_cmd]
# (preprocess_data concat order, gpmpc.py:149; gp_idx at gpmpc.py:59).
GP_IDX = ((0,), (1, 2, 3), (4, 5, 6))
GP_INPUT_DIM = 3  # padded per-GP slice dimension
NUM_GPS = 3


class GpModel(NamedTuple):
    """Padded GP ensemble state — a pure-data controller argument."""

    # Full training set, per GP slice space. Leading axis: the 3 GPs.
    Z: jax.Array  # (3, M, 3)
    y: jax.Array  # (3, M)
    mask: jax.Array  # (3, M)
    hypers: GPHypers  # leaves shaped (3,)
    # Mean-prediction inducing set: FITC subset if sparse, else the full set.
    Zs: jax.Array  # (3, Ms, 3)
    alpha_s: jax.Array  # (3, Ms)
    # Predictive-variance quadratic form: var(z) = sf2 - k(z,var_Z) var_mat k'.
    # Exact mode: var_Z = Z, var_mat = K_inv (the reference's dense-inverse cache,
    # ≙ compute_covariances gp.py:43-46 — the right call for the TPU hot path:
    # variance becomes pure GEMMs on the MXU, no per-step triangular solves).
    # Sparse mode: var_Z = Zs, var_mat = the FITC variance form (gp/sparse.py::
    # fitc_posterior) — O(Ms^2) per query instead of O(M^2), the inducing-point
    # analogue of the reference's LOVE fast_pred_var (gpmpc.py:443-445).
    var_Z: jax.Array  # (3, Mv, 3)
    var_mat: jax.Array  # (3, Mv, Mv)
    var_mask: jax.Array  # (3, Mv)
    trained: jax.Array  # scalar bool


class GpMpcConsts(NamedTuple):
    mpc: MpcConsts
    Ad: jax.Array  # (nx, nx) exact discretization of prior Jacobian at equilibrium
    Bd_in: jax.Array  # (nx, nu)
    lqr_gain: jax.Array  # (nu, nx)
    Bd: jax.Array  # (nx, 5) uncertainty injection matrix
    inverse_cdf: jax.Array  # scalar chance-constraint quantile
    dt: jax.Array  # scalar


def empty_gp_model(
    max_points: int, max_inducing: int, dtype=jnp.float32, ard: bool = False
) -> GpModel:
    """`max_inducing` sizes both the mean inducing set and the variance form
    (callers pass max_inducing == max_points for the exact/dense mode)."""
    M, Ms = max_points, max_inducing
    zeros3 = jnp.zeros((NUM_GPS,), dtype)
    # The lengthscale leaf shape must match what train_gp_models will produce —
    # otherwise the first retrain changes the pytree structure and recompiles the
    # jitted controller step, breaking the no-recompile invariant.
    ell0 = jnp.zeros((NUM_GPS, GP_INPUT_DIM), dtype) if ard else zeros3
    return GpModel(
        Z=jnp.zeros((NUM_GPS, M, GP_INPUT_DIM), dtype),
        y=jnp.zeros((NUM_GPS, M), dtype),
        mask=jnp.zeros((NUM_GPS, M), dtype),
        hypers=GPHypers(ell0, zeros3, zeros3),
        Zs=jnp.zeros((NUM_GPS, Ms, GP_INPUT_DIM), dtype),
        alpha_s=jnp.zeros((NUM_GPS, Ms), dtype),
        var_Z=jnp.zeros((NUM_GPS, Ms, GP_INPUT_DIM), dtype),
        var_mat=jnp.zeros((NUM_GPS, Ms, Ms), dtype),
        var_mask=jnp.zeros((NUM_GPS, Ms), dtype),
        trained=jnp.asarray(False),
    )


def slice_gp_inputs(x7: jax.Array) -> jax.Array:
    """(..., 7) GP input rows -> (3, ..., 3) padded per-GP slices."""
    pads = []
    for idx in GP_IDX:
        cols = [x7[..., i] for i in idx]
        while len(cols) < GP_INPUT_DIM:
            cols.append(jnp.zeros_like(x7[..., 0]))
        pads.append(jnp.stack(cols, axis=-1))
    return jnp.stack(pads, axis=0)


def gp_input_from_xu(x: jax.Array, u: jax.Array) -> jax.Array:
    """(x, u) -> the 7-dim GP input [T, phi, dphi, phi_cmd, theta, dtheta, theta_cmd].

    ≙ the z-index selection idx_T/idx_R/idx_P at gpmpc.py:173.
    """
    return jnp.stack(
        [
            u[..., 0],
            x[..., quadrotor.IDX_PHI], x[..., quadrotor.IDX_DPHI], u[..., 1],
            x[..., quadrotor.IDX_THETA], x[..., quadrotor.IDX_DTHETA], u[..., 2],
        ],
        axis=-1,
    )


def pack_training_data(x7: jax.Array, y3: jax.Array, max_points: int) -> GPData:
    """(N, 7) inputs / (N, 3) targets -> padded per-GP GPData batch (leaves lead
    with the GP axis). N may be traced-dynamic via a validity mask upstream; here
    N is the static array length and all rows are marked active."""
    n = x7.shape[0]
    z = slice_gp_inputs(x7)  # (3, N, 3)
    pad = max_points - n
    Z = jnp.pad(z, ((0, 0), (0, pad), (0, 0)))
    Y = jnp.pad(y3.T, ((0, 0), (0, pad)))
    mask = jnp.pad(jnp.ones((NUM_GPS, n), x7.dtype), ((0, 0), (0, pad)))
    return GPData(x=Z, y=Y, mask=mask)


def pack_training_buffers(bufx: jax.Array, bufy: jax.Array, count) -> GPData:
    """Padded (cap, 7)/(cap, 3) buffers + traced active-row count -> masked GPData.

    The traced-count sibling of `pack_training_data`: rows >= `count` stay in
    the buffers but are masked out of the likelihood/posterior, so dataset
    growth inside a jitted program (the seed sweep, the online learner) never
    changes shapes."""
    cap = bufx.shape[0]
    mask = (jnp.arange(cap) < count).astype(bufx.dtype)
    return GPData(
        x=slice_gp_inputs(bufx), y=bufy.T, mask=jnp.tile(mask[None], (NUM_GPS, 1))
    )


def train_gp_models(
    data: GPData,  # leaves batched over the 3 GPs
    key: jax.Array,
    sparse: bool,
    max_inducing: int,
    n_train: int,
    lr: float,
    ard: bool = False,
) -> GpModel:
    """Fit hypers, factorize posteriors, and build the mean-inducing set — fully
    traceable (works inside one jitted multi-chip training step).

    ≙ train_gp (gpmpc.py:153-164) + the solver-rebuild work that the reference
    defers to reset()/setup_acados_* (gpmpc.py:94-111,166-273), which here is just
    constructing the `GpModel` pytree.
    """
    h0 = init_hypers(data.x.dtype, GP_INPUT_DIM if ard else None)
    hypers, _ = jax.vmap(lambda d: fit_gp(d, hypers=h0, n_train=n_train, lr=lr))(data)
    hypers = GPHypers(*hypers)
    post = jax.vmap(posterior)(hypers, data)

    if sparse:
        # Mean AND variance from the inducing set: the O(M^2)-per-query exact
        # variance (and its O(M^3) K_inv factorization) is never built — at
        # M = 5k that is the difference between MXU-roofline-bound and fast.
        idx_s, s_mask = select_inducing(key, data.mask[0], max_inducing)
        Zs, alpha_s, W = jax.vmap(
            lambda h, d: fitc_posterior(h, d, idx_s, s_mask)
        )(hypers, data)
        var_Z, var_mask = Zs, jnp.tile(s_mask[None], (NUM_GPS, 1))
    else:
        M = data.x.shape[1]
        eye = jnp.eye(M, dtype=data.x.dtype)
        W = jax.vmap(lambda c: jax.scipy.linalg.cho_solve((c, True), eye))(post.chol)
        Zs, alpha_s = data.x, post.alpha
        var_Z, var_mask = data.x, data.mask

    return GpModel(
        Z=data.x, y=data.y, mask=data.mask, hypers=hypers,
        Zs=Zs, alpha_s=alpha_s,
        var_Z=var_Z, var_mat=W, var_mask=var_mask,
        trained=jnp.asarray(True),
    )


def gp_residual(gp: GpModel, x: jax.Array, u: jax.Array) -> jax.Array:
    """Residual dynamics term (12,). ≙ res_dyn, gpmpc.py:193-197."""
    z = slice_gp_inputs(gp_input_from_xu(x, u))  # (3, 3)

    def mean_one(Zs_i, alpha_i, ell_i, sf2_i, z_i):
        k = se_kernel(z_i[None, :], Zs_i, ell_i, sf2_i)[0]
        return jnp.dot(k, alpha_i)

    ell = jax.nn.softplus(gp.hypers.raw_lengthscale)
    sf2 = jax.nn.softplus(gp.hypers.raw_outputscale)
    preds = jax.vmap(mean_one)(gp.Zs, gp.alpha_s, ell, sf2, z)
    T_pred, R_pred, P_pred = preds[0], preds[1], preds[2]

    phi, theta = x[quadrotor.IDX_PHI], x[quadrotor.IDX_THETA]
    ax = T_pred * jnp.cos(phi) * jnp.sin(theta)
    ay = T_pred * (-jnp.sin(phi))
    az = T_pred * jnp.cos(phi) * jnp.cos(theta)
    res = jnp.zeros_like(x)
    res = res.at[quadrotor.IDX_DX].set(ax)
    res = res.at[quadrotor.IDX_DY].set(ay)
    res = res.at[quadrotor.IDX_DZ].set(az)
    res = res.at[quadrotor.IDX_DPHI].set(R_pred)
    res = res.at[quadrotor.IDX_DTHETA].set(P_pred)
    return res


def augmented_fd(model: SymbolicModel, gp: GpModel, x: jax.Array, u: jax.Array) -> jax.Array:
    """RK4 discretization of prior + GP residual (≙ gpmpc.py:199-209)."""
    f = lambda x_, u_: model.fc_func(x_, u_) + gp_residual(gp, x_, u_)
    return quadrotor.rk4(f, x, u, model.dt)


def gp_variances(gp: GpModel, z_slices: jax.Array, bf16: bool = False) -> jax.Array:
    """Predictive variance (3, ...) at per-GP query slices (3, ..., 3) via the
    var_mat quadratic form (exact K_inv or FITC — see GpModel).

    ≙ the LOVE fast-variance call at gpmpc.py:443-445. With `bf16`, the
    O(N·Mv^2) GEMM runs in bfloat16 with f32 accumulation — 4x MXU throughput
    for a variance that only feeds sqrt-scale bound offsets.
    """
    batch_shape = z_slices.shape[1:-1]
    z_flat = z_slices.reshape(NUM_GPS, -1, GP_INPUT_DIM)
    ell = jax.nn.softplus(gp.hypers.raw_lengthscale)
    sf2 = jax.nn.softplus(gp.hypers.raw_outputscale)

    def var_one(Zv, mv, W, ell_i, sf2_i, z):
        k = se_kernel(z, Zv, ell_i, sf2_i) * mv[None, :]  # (N, Mv)
        if bf16:
            t = jnp.dot(
                k.astype(jnp.bfloat16), W.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        else:
            t = k @ W
        return jnp.maximum(sf2_i - jnp.sum(t * k, axis=-1), 1e-12)

    covs = jax.vmap(var_one)(gp.var_Z, gp.var_mask, gp.var_mat, ell, sf2, z_flat)
    return covs.reshape((NUM_GPS,) + batch_shape)


def propagate_constraint_limits(
    consts: GpMpcConsts,
    gp: GpModel,
    x_prev: jax.Array,  # (T+1, nx) previous MPC solution
    u_prev: jax.Array,  # (T, nu)
) -> tuple[jax.Array, jax.Array]:
    """Per-stage bound tightenings (t_x: (T+1, nx), t_u: (T, nu)), both >= 0.

    ≙ propagate_constraint_limits, gpmpc.py:425-498. The reference returns signed
    constraint offsets for the [-I; I] constraint rows; since |A| = 1 for box rows,
    the tightening magnitude ppf * sqrt(diag(cov)) applies symmetrically to both
    sides, which is how it is returned here.
    """
    z7 = gp_input_from_xu(x_prev[:-1], u_prev)  # (T, 7)
    covs_diag = gp_variances(gp, slice_gp_inputs(z7))  # (3, T)
    return tightening_from_variances(consts, gp, z7, covs_diag)


def disturbance_diagonals(
    consts: GpMpcConsts,
    gp: GpModel,
    z7: jax.Array,  # (T, 7) GP inputs along the previous solution
    covs_diag: jax.Array,  # (3, T) predictive variances (precomputed)
) -> jax.Array:
    """Per-stage diagonals of the 5x5 disturbance covariance (GP variance
    rotated into world axes + observation noise), (T, 5). ≙ gpmpc.py:452-469.
    Shared by the XLA scan and the lanes tightening kernel."""
    phi = z7[:, 1]
    theta = z7[:, 4]
    f_ax = (jnp.cos(phi) * jnp.sin(theta)) ** 2
    f_ay = jnp.sin(phi) ** 2
    f_az = (jnp.cos(phi) * jnp.cos(theta)) ** 2

    dt2 = consts.dt**2
    noise = jax.nn.softplus(gp.hypers.raw_noise) + 1e-6  # (3,)
    cov_d = jnp.stack(
        [covs_diag[0] * f_ax, covs_diag[0] * f_ay, covs_diag[0] * f_az,
         covs_diag[1], covs_diag[2]],
        axis=1,
    )  # (T, 5)
    cov_n = jnp.stack(
        [noise[0] * f_ax, noise[0] * f_ay, noise[0] * f_az,
         jnp.full_like(f_ax, noise[1]), jnp.full_like(f_ax, noise[2])],
        axis=1,
    )
    return (cov_d + cov_n) * dt2


def tightening_from_variances(
    consts: GpMpcConsts,
    gp: GpModel,
    z7: jax.Array,  # (T, 7) GP inputs along the previous solution
    covs_diag: jax.Array,  # (3, T) predictive variances (precomputed)
) -> tuple[jax.Array, jax.Array]:
    """Covariance-propagation scan given precomputed GP variances — split out so
    batched callers can compute the variances with one fused kernel over all
    scenarios (see batched_prepare_step)."""
    nx = consts.Ad.shape[0]
    cov_dn = disturbance_diagonals(consts, gp, z7, covs_diag)

    K = consts.lqr_gain
    A, B, Bd = consts.Ad, consts.Bd_in, consts.Bd
    ppf = consts.inverse_cdf

    def step(cov_x, cov_dn_k):
        cov_xu = cov_x @ K.T
        cov_u = K @ cov_x @ K.T
        t_x = ppf * jnp.sqrt(jnp.maximum(jnp.diag(cov_x), 0.0))
        t_u = ppf * jnp.sqrt(jnp.maximum(jnp.diag(cov_u), 0.0))
        cov_next = (
            A @ cov_x @ A.T
            + A @ cov_xu @ B.T
            + B @ cov_xu.T @ A.T
            + B @ cov_u @ B.T
            + Bd @ jnp.diag(cov_dn_k) @ Bd.T
        )
        return cov_next, (t_x, t_u)

    cov0 = jnp.zeros((nx, nx), z7.dtype)
    cov_T, (t_x_path, t_u) = jax.lax.scan(step, cov0, cov_dn)
    t_x_term = ppf * jnp.sqrt(jnp.maximum(jnp.diag(cov_T), 0.0))
    t_x = jnp.concatenate([t_x_path, t_x_term[None]], axis=0)
    return t_x, t_u


def preprocess_data_jnp(
    model: SymbolicModel,
    acc_a: float,
    acc_b: float,
    x: jax.Array,  # (N, nx)
    u: jax.Array,  # (N, nu)
    x_next: jax.Array,  # (N, nx)
) -> tuple[jax.Array, jax.Array]:
    """Pure-jnp transition preprocessing (usable inside jitted training steps).

    ≙ preprocess_data, gpmpc.py:113-151: targets are finite-difference state
    derivatives minus the prior model's prediction — the thrust-magnitude residual
    for the acceleration GP (rows 1/3/5 via |v_dot + g e_z|) and the phi/theta rate
    residual rows. dt = model dt (the reference hardcodes 1/60; documented quirk).
    """
    dt = model.dt
    thrust_cmd = u[:, 0]
    x_dot = (x_next - x) / dt

    acc = jnp.sqrt(x_dot[:, 1] ** 2 + x_dot[:, 3] ** 2 + (x_dot[:, 5] + GRAVITY) ** 2)
    acc_target = acc - (acc_a * thrust_cmd + acc_b)
    f_prior = jax.vmap(model.fc_func)(x, u)

    idx_phi, idx_d_phi, idx_phi_cmd = 6, 9, 1
    phi_target = x_dot[:, idx_phi] - f_prior[:, idx_phi]
    idx_theta, idx_d_theta, idx_theta_cmd = 7, 10, 2
    theta_target = x_dot[:, idx_theta] - f_prior[:, idx_theta]

    train_input = jnp.stack(
        [
            thrust_cmd,
            x[:, idx_phi], x[:, idx_d_phi], u[:, idx_phi_cmd],
            x[:, idx_theta], x[:, idx_d_theta], u[:, idx_theta_cmd],
        ],
        axis=1,
    )
    train_output = jnp.stack((acc_target, phi_target, theta_target), axis=1)
    return train_input, train_output


def _bounds_from_tightening(
    consts: GpMpcConsts,
    gp: GpModel,
    state: MpcState,
    obs: jax.Array,
    t_x: jax.Array,  # (T+1, nx) requested tightenings
    t_u: jax.Array,  # (T, nu)
    soft: bool = False,
) -> tuple[jax.Array, OcpBounds, jax.Array, jax.Array, jax.Array]:
    """Shared tail of step preparation: gate/clamp the tightening, build bounds,
    reference window, and warm start. Returns (xref, bounds, X_init, U_init,
    clamp_frac)."""
    T = consts.mpc.uref.shape[0]
    c = consts.mpc

    # First step has no previous rollout -> zero tightening (gpmpc.py:432-433).
    use = jnp.logical_and(state.traj_step > 0, gp.trained)
    t_x = jnp.where(use, t_x, 0.0)
    t_u = jnp.where(use, t_u, 0.0)

    # Keep tightened boxes feasible: never consume more than 45% of the interval
    # from each side (the reference would instead hit an acados failure status).
    # Every clamped entry is counted and surfaced in MpcInfo.clamp_frac — when
    # nonzero, the chance constraint is degraded and the caller must know.
    # With soft state bounds (SqpConfig.soft_x_penalty) the STATE tightening is
    # honored in full — infeasible (even crossed) boxes are well-posed for the
    # L1-penalized QP, and the degradation signal moves to MpcInfo.soft_viol.
    # Input bounds are actuator limits and always stay hard-clamped.
    lx = jnp.tile(c.lx[None], (T + 1, 1))
    ux = jnp.tile(c.ux[None], (T + 1, 1))
    lu = jnp.tile(c.lu[None], (T, 1))
    uu = jnp.tile(c.uu[None], (T, 1))
    cap_x = 0.45 * (ux - lx)
    cap_u = 0.45 * (uu - lu)
    n_clamped = jnp.sum(t_u > cap_u) + (0 if soft else jnp.sum(t_x > cap_x))
    clamp_frac = n_clamped.astype(jnp.float32) / float(t_x.size + t_u.size)
    if not soft:
        t_x = jnp.minimum(t_x, cap_x)
    t_u = jnp.minimum(t_u, cap_u)
    bounds = OcpBounds(lx=lx + t_x, ux=ux - t_x, lu=lu + t_u, uu=uu - t_u)

    xref = mpc_mod.reference_window(c.traj, state.traj_step, T)
    first = state.traj_step == 0
    X_init = jnp.where(first, jnp.tile(obs[None], (T + 1, 1)), state.X_warm)
    U_init = jnp.where(first, c.uref, state.U_warm)
    return xref, bounds, X_init, U_init, clamp_frac


def prepare_step(
    model: SymbolicModel,
    consts: GpMpcConsts,
    gp: GpModel,
    state: MpcState,
    obs: jax.Array,
    soft: bool = False,
) -> tuple[jax.Array, OcpBounds, jax.Array, jax.Array, jax.Array]:
    """Per-scenario step preparation: tightened bounds, reference window, warm
    start. (xref, bounds, X_init, U_init, clamp_frac). Vmappable."""
    t_x, t_u = propagate_constraint_limits(consts, gp, state.X_warm, state.U_warm)
    return _bounds_from_tightening(consts, gp, state, obs, t_x, t_u, soft=soft)


def batched_variances(
    gp: GpModel,
    z_slices: jax.Array,  # (3, B, T, 3)
    backend: str = "auto",
    bf16: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Tightening variances for a whole scenario batch, (3, B, T).

    backend="pallas" routes through the fused GP inference kernel
    (ops/pallas_gp.py) — one VMEM-resident pass per GP over all B*T query
    points; "xla" is the quadratic-form GEMM; "auto" picks pallas on TPU for
    isotropic hypers and resident-size variance matrices.
    """
    _, B, T, _ = z_slices.shape
    Mv = gp.var_Z.shape[1]
    isotropic = jnp.ndim(gp.hypers.raw_lengthscale) == 1
    if backend == "auto":
        backend = (
            "pallas"
            if (jax.default_backend() == "tpu" and isotropic and Mv <= 1024)
            else "xla"
        )
    if backend != "pallas":
        return gp_variances(gp, z_slices, bf16=bf16)

    from gpmpc_tpu.ops.pallas_gp import gp_mean_var

    # Pad the variance form to a lane-aligned Mv (masked entries contribute 0).
    pad = (-Mv) % 128
    var_Z = jnp.pad(gp.var_Z, ((0, 0), (0, pad), (0, 0)))
    var_mat = jnp.pad(gp.var_mat, ((0, 0), (0, pad), (0, pad)))
    var_mask = jnp.pad(gp.var_mask, ((0, 0), (0, pad)))
    alpha = jnp.pad(gp.alpha_s, ((0, 0), (0, pad)))
    ell = jax.nn.softplus(gp.hypers.raw_lengthscale)
    sf2 = jax.nn.softplus(gp.hypers.raw_outputscale)
    noise = jax.nn.softplus(gp.hypers.raw_noise) + 1e-6

    covs = []
    for i in range(NUM_GPS):  # 3 kernel launches; each tiles over B*T queries
        _, var = gp_mean_var(
            z_slices[i].reshape(B * T, GP_INPUT_DIM),
            var_Z[i], alpha[i], var_mat[i],
            ell[i], sf2[i], noise[i], var_mask[i],
            include_noise=False, interpret=interpret,
        )
        covs.append(var.reshape(B, T))
    return jnp.stack(covs, axis=0)


def batched_prepare_step(
    model: SymbolicModel,
    consts: GpMpcConsts,
    gp: GpModel,
    states: MpcState,  # leaves batched over B
    obs: jax.Array,  # (B, nx)
    var_backend: str = "auto",
    var_bf16: bool = False,
    soft: bool = False,
    tighten_backend: str = "auto",
    interpret: bool = False,
):
    """Batch-first step preparation: the GP variance work for all B scenarios
    runs as one fused pass (the hot-path integration of the GP-inference
    kernel), and the T-step covariance recursion runs lane-packed in one Pallas
    launch (ops/pallas_tighten.py) — under XLA the vmapped scan of 12x12
    products was 42% of the whole default-config step (measured)."""
    z7 = jax.vmap(lambda s: gp_input_from_xu(s.X_warm[:-1], s.U_warm))(states)  # (B, T, 7)
    covs = batched_variances(gp, slice_gp_inputs(z7), var_backend, var_bf16)  # (3, B, T)
    if tighten_backend == "auto":
        tighten_backend = (
            "pallas" if (jax.default_backend() == "tpu" or interpret) else "xla"
        )
    if tighten_backend == "pallas":
        from gpmpc_tpu.ops.pallas_tighten import tighten_lanes

        cov_dn = jax.vmap(
            lambda z7_b, cv_b: disturbance_diagonals(consts, gp, z7_b, cv_b)
        )(z7, jnp.moveaxis(covs, 1, 0))  # (B, T, 5)
        t_x, t_u = tighten_lanes(
            cov_dn, consts.Ad, consts.Bd_in, consts.lqr_gain, consts.Bd,
            consts.inverse_cdf, interpret=interpret,
        )
    else:
        t_x, t_u = jax.vmap(
            lambda z7_b, cv_b: tightening_from_variances(consts, gp, z7_b, cv_b)
        )(z7, jnp.moveaxis(covs, 1, 0))
    return jax.vmap(
        lambda s, o, tx, tu: _bounds_from_tightening(consts, gp, s, o, tx, tu, soft=soft)
    )(states, obs, t_x, t_u)


def select_action(
    model: SymbolicModel,
    cfg: SqpConfig,
    consts: GpMpcConsts,
    gp: GpModel,
    state: MpcState,
    obs: jax.Array,
) -> tuple[jax.Array, MpcState, mpc_mod.MpcInfo]:
    """One GP-MPC step (pure). ≙ GPMPC.select_action, gpmpc.py:334-368."""
    c = consts.mpc
    xref, bounds, X_init, U_init, clamp_frac = prepare_step(
        model, consts, gp, state, obs, soft=cfg.soft_x_penalty is not None
    )
    if cfg.warm_shift:
        X_init = jnp.concatenate([X_init[1:], X_init[-1:]], axis=0)
        U_init = jnp.concatenate([U_init[1:], U_init[-1:]], axis=0)
    fd = partial(augmented_fd, model, gp)
    cost = mpc_mod.OcpCost(xref=xref, uref=c.uref, Q=c.Q, R=c.R, Qe=c.Q, scale=c.scale)
    sol = sqp_solve(fd, cost, bounds, obs, X_init, U_init, cfg)

    new_state = MpcState(traj_step=state.traj_step + 1, X_warm=sol.X, U_warm=sol.U)
    info = mpc_mod.MpcInfo(
        X=sol.X, U=sol.U, step_norm=sol.step_norm, qp_gap=sol.qp_gap,
        n_iters=sol.n_iters, clamp_frac=clamp_frac,
        soft_viol=mpc_mod.state_bound_violation(sol.X, bounds),
    )
    return sol.U[0], new_state, info


def batched_select_action_lanes(
    model: SymbolicModel,
    cfg: SqpConfig,
    consts: GpMpcConsts,
    gp: GpModel,
    states: MpcState,  # leaves batched over B
    obs: jax.Array,  # (B, nx)
    interpret: bool = False,
    var_backend: str = "auto",
    var_bf16: bool = False,
) -> tuple[jax.Array, MpcState, mpc_mod.MpcInfo]:
    """Batch GP-MPC step with the lane-packed Pallas QP backend (pallas_ocp.py).

    Same semantics as vmap(select_action); the QP solves go through one Pallas
    kernel per 128-scenario lane tile instead of XLA's batched small matmuls,
    and the tightening variances go through the fused GP-inference kernel
    (batched_prepare_step) instead of per-scenario einsums.
    """
    from gpmpc_tpu.ops.sqp_lanes import (
        MAX_FUSED_HORIZON,
        lanes_horizon_cap,
        sqp_solve_batch_lanes,
    )

    c = consts.mpc
    T = c.uref.shape[0]
    # Soft state bounds live in both lanes kernels (resident and streamed) up
    # to the soft streamed cap; beyond it fall back to clamped hard bounds —
    # loudly, not silently.
    if cfg.soft_x_penalty is not None and T > lanes_horizon_cap(cfg):
        import warnings

        warnings.warn(
            f"soft_constraints requested but T={T} exceeds the lanes soft "
            f"horizon cap ({lanes_horizon_cap(cfg)}); falling back to hard "
            "bounds with the 45% feasibility clamp for this controller",
            stacklevel=2,
        )
        cfg = cfg._replace(soft_x_penalty=None)
    soft = cfg.soft_x_penalty is not None
    xref, bounds, X_init, U_init, clamp_frac = batched_prepare_step(
        model, consts, gp, states, obs, var_backend=var_backend, var_bf16=var_bf16,
        soft=soft, interpret=interpret,
    )
    if cfg.warm_shift:
        X_init = jnp.concatenate([X_init[:, 1:], X_init[:, -1:]], axis=1)
        U_init = jnp.concatenate([U_init[:, 1:], U_init[:, -1:]], axis=1)
    cost = mpc_mod.OcpCost(xref=xref, uref=c.uref, Q=c.Q, R=c.R, Qe=c.Q, scale=c.scale)
    # The fused kernel-linearize path covers the lanes horizon range (the
    # linearizer is stage-looped; the QP dispatches resident/streamed); horizons
    # past MAX_FUSED_HORIZON take the jacfwd + XLA path.
    if (
        cfg.kernel_linearize
        and T <= MAX_FUSED_HORIZON
        and jnp.ndim(gp.hypers.raw_lengthscale) == 1
    ):
        # Whole-SQP lanes path: linearization AND QP in Pallas, X/U stay in
        # lanes layout across SQP iterations (isotropic kernels only).
        from gpmpc_tpu.models.quadrotor import QuadrotorParams  # noqa: F401
        from gpmpc_tpu.ops.sqp_lanes import LanesLinearizer, sqp_solve_batch_lanes_fused

        p = model.params
        params8 = jnp.asarray([p.a, p.b, p.c, p.d, p.e, p.f, p.h, p.l], jnp.float32)
        ell = jax.nn.softplus(gp.hypers.raw_lengthscale)
        sf2 = jax.nn.softplus(gp.hypers.raw_outputscale)
        lin = LanesLinearizer(
            params8=params8,
            hyp=jnp.stack([1.0 / (ell * ell), sf2], axis=1),
            Zs=gp.Zs,
            alpha=gp.alpha_s,  # zero for the untrained model -> residual vanishes
            use_gp=True,
        )
        sol = sqp_solve_batch_lanes_fused(
            lin, model.dt, cost, bounds, obs, X_init, U_init, cfg, interpret=interpret
        )
    else:
        fd = partial(augmented_fd, model, gp)
        fd_jac3 = None
        if cfg.analytic_jac and jnp.ndim(gp.hypers.raw_lengthscale) == 1:
            # isotropic GP kernels only; the ARD shape falls back to jacfwd
            from gpmpc_tpu.models.jacobians import make_augmented_fd_jac

            fd_jac3 = make_augmented_fd_jac(model, gp)
        sol = sqp_solve_batch_lanes(
            fd, cost, bounds, obs, X_init, U_init, cfg, interpret=interpret, fd_jac3=fd_jac3
        )
    new_states = MpcState(
        traj_step=states.traj_step + 1, X_warm=sol.X, U_warm=sol.U
    )
    info = mpc_mod.MpcInfo(
        X=sol.X, U=sol.U, step_norm=sol.step_norm, qp_gap=sol.qp_gap,
        n_iters=sol.n_iters, clamp_frac=clamp_frac,
        soft_viol=jax.vmap(mpc_mod.state_bound_violation)(sol.X, bounds),
    )
    return sol.U[:, 0], new_states, info


class GPMPC:
    """Stateful wrapper mirroring the reference GPMPC API (gpmpc.py:15-514)."""

    U_EQ = np.array([0.3234, 0.0, 0.0, 0.0])

    def __init__(
        self,
        symbolic_model: SymbolicModel,
        traj,
        prior_params: dict | None,
        horizon: int,
        q_mpc,
        r_mpc,
        sparse_gp: bool = False,
        prob: float = 0.955,
        max_gp_samples: int = 30,
        seed: int = 1337,
        device: str = "tpu",
        output_dir=None,
        max_gp_points: int = 128,
        sqp_iters: int = 25,
        qp_iters: int = 15,
        parallel_scan: bool = False,
        ard_gp: bool = False,
        soft_constraints: float | None = None,
    ):
        if prior_params is None or any(k not in prior_params for k in ("a", "b")):
            raise ValueError("GPMPC requires prior_params to be defined and contain 'a' and 'b'.")
        self.sparse = sparse_gp
        self.ard_gp = ard_gp  # per-dimension (ARD) lengthscales; reference uses isotropic
        self.output_dir = output_dir
        self.model = symbolic_model
        # Only the thrust-map coefficients are consumed here (the symbolic model
        # already carries the full parameter set) — ≙ setup_symbolic_acceleration,
        # gpmpc.py:322-325, and the a/b-only validation at gpmpc.py:43-44.
        if isinstance(prior_params, QuadrotorParams):
            self._acc_a, self._acc_b = float(prior_params.a), float(prior_params.b)
        else:
            self._acc_a, self._acc_b = float(prior_params["a"]), float(prior_params["b"])
        self.dt = symbolic_model.dt
        self.T = horizon
        self.max_gp_samples = max_gp_samples
        self.max_gp_points = max(max_gp_points, max_gp_samples)
        self.np_random = np.random.default_rng(seed)
        self._gp_key = jax.random.PRNGKey(seed)

        traj = jnp.asarray(traj)
        if traj.shape[0] < traj.shape[1]:
            traj = traj.T

        # Nominal prior controller (≙ gpmpc.py:72-80).
        self.prior_ctrl = MPC(
            symbolic_model, traj, q_mpc=q_mpc, r_mpc=r_mpc,
            output_dir=output_dir, horizon=horizon,
            sqp_iters=sqp_iters, qp_iters=qp_iters, parallel_scan=parallel_scan,
        )
        self.traj = traj

        # Chance-constraint quantile (gpmpc.py:63-65).
        nx = symbolic_model.nx
        # jax.scipy keeps the core install scipy-free (ops/linalg.py already
        # guards its optional scipy use).
        inverse_cdf = float(
            jax.scipy.stats.norm.ppf(1 - (1 / nx - (prob + 1) / (2 * nx)))
        )

        # Prior linearization at equilibrium -> exact discretization + LQR gain
        # (gpmpc.py:81-86,500-507).
        x_eq = jnp.zeros(nx, jnp.float32)
        u_eq = quadrotor.U_EQ
        dfdx, dfdu = symbolic_model.df_func(x_eq, u_eq)
        Ad, Bd_in = discretize_linear_system(
            np.asarray(dfdx, np.float64), np.asarray(dfdu, np.float64), self.dt, exact=True
        )
        Q = np.diag(np.asarray(q_mpc, np.float64))
        R = np.diag(np.asarray(r_mpc, np.float64))
        lqr_K, _ = lqr_gain_discrete(Ad, Bd_in, Q, R)

        Bd_mat = np.eye(nx)[:, list(UNCERTAIN_DIM)]
        self.consts = GpMpcConsts(
            mpc=self.prior_ctrl.consts,
            Ad=jnp.asarray(Ad, jnp.float32),
            Bd_in=jnp.asarray(Bd_in, jnp.float32),
            lqr_gain=jnp.asarray(lqr_K, jnp.float32),
            Bd=jnp.asarray(Bd_mat, jnp.float32),
            inverse_cdf=jnp.asarray(inverse_cdf, jnp.float32),
            dt=jnp.asarray(self.dt, jnp.float32),
        )
        # soft_constraints: L1 penalty weight that makes the chance-tightened
        # STATE bounds soft (ops/boxqp.py bounded-multiplier formulation) so an
        # uncertain GP degrades the constraint gracefully and *visibly*
        # (MpcInfo.soft_viol) instead of being silently clamped at 45%.
        self.cfg = SqpConfig(
            sqp_iters=sqp_iters, qp_iters=qp_iters, parallel_scan=parallel_scan,
            soft_x_penalty=soft_constraints,
        )
        self.gp_model = empty_gp_model(
            self.max_gp_points,
            self.max_gp_samples if sparse_gp else self.max_gp_points,
            ard=ard_gp,
        )
        self.state = mpc_mod.init_state(horizon, nx, symbolic_model.nu)
        self._requires_recompile = False  # API compat: re-jit never needed here.
        self._step = jax.jit(partial(select_action, self.model, self.cfg))
        self._train_fns: dict = {}  # (iterations, lr) -> jitted training program

    # -- training-data path ---------------------------------------------------

    def preprocess_data(self, x, u, x_next):
        """Rollout transitions -> GP inputs (N, 7) and residual targets (N, 3).

        ≙ preprocess_data, gpmpc.py:113-151, with dt = the model/env step (the
        reference hardcodes 1/60 here; documented quirk).
        """
        xi, ti = preprocess_data_jnp(
            self.model, self._acc_a, self._acc_b,
            jnp.asarray(x, jnp.float32), jnp.asarray(u, jnp.float32),
            jnp.asarray(x_next, jnp.float32),
        )
        return np.asarray(xi), np.asarray(ti)

    def train_gp(self, x, y, lr: float, iterations: int):
        """Fit the 3 GPs to (N, 7) inputs / (N, 3) targets. ≙ gpmpc.py:153-164.

        Training is one jitted, GP-batched program; dataset growth only changes the
        row mask, so no recompilation ever happens (vs. _requires_recompile=True in
        the reference).
        """
        x = np.asarray(x, np.float32)
        y = np.asarray(y, np.float32)
        n = x.shape[0]
        M = self.max_gp_points
        if n > M:
            raise ValueError(f"GP dataset ({n}) exceeds capacity ({M}); raise max_gp_points")

        Z = np.zeros((NUM_GPS, M, GP_INPUT_DIM), np.float32)
        Y = np.zeros((NUM_GPS, M), np.float32)
        mask = np.zeros((NUM_GPS, M), np.float32)
        for i, idx in enumerate(GP_IDX):
            Z[i, :n, : len(idx)] = x[:, list(idx)]
            Y[i, :n] = y[:, i]
            mask[i, :n] = 1.0
        data = GPData(x=jnp.asarray(Z), y=jnp.asarray(Y), mask=jnp.asarray(mask))

        self._gp_key, sub = jax.random.split(self._gp_key)
        cache_key = (int(iterations), float(lr))
        if cache_key not in self._train_fns:
            self._train_fns[cache_key] = jax.jit(
                partial(
                    train_gp_models,
                    sparse=self.sparse,
                    max_inducing=self.max_gp_samples if self.sparse else M,
                    n_train=int(iterations),
                    lr=float(lr),
                    ard=self.ard_gp,
                )
            )
        self.gp_model = self._train_fns[cache_key](data, sub)
        self._requires_recompile = False

    # -- control path ---------------------------------------------------------

    def reset(self):
        """≙ GPMPC.reset (gpmpc.py:94-111) — without the recompile branch, which
        this design makes unnecessary."""
        self.state = mpc_mod.init_state(self.T, self.model.nx, self.model.nu)

    def reference_trajectory(self) -> np.ndarray:
        """Reference window at the current step, (nx, T+1). ≙ gpmpc.py:509-514."""
        return np.asarray(
            mpc_mod.reference_window(self.consts.mpc.traj, self.state.traj_step, self.T)
        ).T

    def select_action(self, obs) -> np.ndarray:
        obs = jnp.asarray(obs, jnp.float32)
        u, self.state, self._last_info = self._step(self.consts, self.gp_model, self.state, obs)
        u = np.asarray(u)
        # ≙ `assert status in [0, 2]` after each acados solve (gpmpc.py:365).
        if not np.all(np.isfinite(u)):
            raise RuntimeError(
                f"GP-MPC solve produced non-finite action {u} "
                f"(step_norm={float(self._last_info.step_norm)})"
            )
        return u
