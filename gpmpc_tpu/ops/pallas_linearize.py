"""Lane-packed dynamics linearization kernel.

Round-1 measurement: once the QP moved into the lanes kernel, the SQP step's
dominant cost became dynamics linearization — `jacfwd` pushes 16 tangents
through every elementwise op of the RK4-discretized GP-augmented dynamics, and
the analytic-Jacobian alternative (models/jacobians.py) was 35% *slower* via
XLA because its RK4 chain is batched 12x12 matmuls, exactly the shape XLA lowers
at <0.1% MXU utilization (the same disease ops/pallas_ocp.py fixes for the QP).

This kernel computes the closed forms of models/jacobians.py in the lanes
layout: scenarios live on the 128-wide lane axis, so every 12x12 matmul in the
RK4 Jacobian chain is a full-width VPU broadcast-multiply-accumulate, and the
SE-kernel posterior mean + gradient of the 3 residual GPs are (Ms, L) VPU
blocks. One launch linearizes all T stages of a 128-scenario tile:

    (X (T+1,nx,L), U (T,nu,L)) -> fnext (T,nx,L), A (T,nx,nx,L), B (T,nx,nu,L)

ready to feed `solve_ocp_qp_lanes` with no layout churn in between.

The RK4 chain, the SE-kernel mean/gradient block, and the lane-matrix
assembly are family-generic; only the closed-form continuous dynamics +
Jacobian closure is hand-derived per model family (`_FAMILY_FC_JAC` registry:
the quadrotor attitude dynamics of models/quadrotor.py — ≙ the reference's
symbolic model, crazyflow symbolic_attitude — with the thrust-magnitude GP
rotated by (cphi*sth, -sphi, cphi*cth) plus phi/theta rate GPs,
≙ /root/reference/gpmpc/gpmpc.py:193-197; and the cartpole of
models/cartpole.py with acceleration-residual GPs acting directly on the
x_dot/theta_dot rows). Families without a registry entry
(ResidualSpec.supports_kernel_linearize=False) stay on `jacfwd`. Isotropic
AND ARD lengthscales supported (per-dimension reciprocal squares in the hyp
rows). Each family's ResidualSpec.kernel_params packs its plant parameters
into the (8,) SMEM row this kernel reads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpmpc_tpu.ops.pallas_ocp import VMEM_LIMIT_BYTES

from gpmpc_tpu.ops.pallas_ocp import _mm

NX = 12
NU = 4
GRAVITY = 9.81


def _build_mat(rows, n_cols, L, dtype):
    """rows: dict {(i, j): (L,) value} -> (n_rows, n_cols, L) dense lane matrix."""
    zero = jnp.zeros((L,), dtype)
    n_rows = max(i for i, _ in rows) + 1 if rows else 0
    out_rows = []
    for i in range(n_rows):
        cols = [rows.get((i, j), zero) for j in range(n_cols)]
        out_rows.append(jnp.stack(cols, axis=0))
    return jnp.stack(out_rows, axis=0)


def _gp_mean_grad(Zs, alpha, inv_ell2, sf2, z):
    """SE posterior mean and d(mean)/dz for one GP, lane-vectorized.

    Zs (Ms, D), alpha (Ms,), inv_ell2: tuple of D per-dimension reciprocal
    square lengthscales (identical scalars for isotropic kernels — ARD costs
    one extra scalar multiply per dim), z: tuple of D (L,) query components
    (D = len(z): 3 for the quadrotor/cartpole closures, 6 for the two-link).
    Returns mean (L,), grads tuple of D (L,).
    """
    D = len(z)
    d2 = None
    diffs = []
    for d in range(D):
        diff = Zs[:, d : d + 1] - z[d][None, :]  # (Ms, L)
        diffs.append(diff)
        dd = (diff * diff) * inv_ell2[d]
        d2 = dd if d2 is None else d2 + dd
    k = sf2 * jnp.exp(-0.5 * d2)  # (Ms, L)
    ka = k * alpha[:, None]
    mean = jnp.sum(ka, axis=0)
    grads = tuple(jnp.sum(ka * diffs[d], axis=0) * inv_ell2[d] for d in range(D))
    return mean, grads


def _quad_fc_and_jac(par_ref, hyp_ref, Zs_ref, alpha_ref, use_gp, zero, one):
    """Closed-form continuous dynamics + Jacobians for the quadrotor family
    (≙ models/jacobians.py::prior_jacobians + the GP-augmented terms)."""
    f32 = jnp.float32
    L = zero.shape[0]
    pa, pb = par_ref[0, 0], par_ref[0, 1]
    pc, pd_, pe = par_ref[0, 2], par_ref[0, 3], par_ref[0, 4]
    pf, ph, plc = par_ref[0, 5], par_ref[0, 6], par_ref[0, 7]

    def fc_and_jac(x, u):
        """Continuous dynamics f (NX, L) + Jacobians Jx (NX,NX,L), Ju (NX,NU,L)."""
        phi, theta, psi = x[6], x[7], x[8]
        dphi, dtheta, dpsi = x[9], x[10], x[11]
        u0, u1, u2 = u[0], u[1], u[2]
        cphi, sphi = jnp.cos(phi), jnp.sin(phi)
        cth, sth = jnp.cos(theta), jnp.sin(theta)
        cpsi, spsi = jnp.cos(psi), jnp.sin(psi)
        acc = pa * u0 + pb

        if use_gp:
            zT = (u0, zero, zero)
            zR = (phi, dphi, u1)
            zP = (theta, dtheta, u2)
            inv = lambda g: (hyp_ref[g, 1], hyp_ref[g, 2], hyp_ref[g, 3])
            Tp, dT = _gp_mean_grad(
                Zs_ref[0], alpha_ref[0], inv(0), hyp_ref[0, 0], zT
            )
            Rp, dR = _gp_mean_grad(
                Zs_ref[1], alpha_ref[1], inv(1), hyp_ref[1, 0], zR
            )
            Pp, dP = _gp_mean_grad(
                Zs_ref[2], alpha_ref[2], inv(2), hyp_ref[2, 0], zP
            )
            dT0 = dT[0]
        else:
            Tp = Rp = Pp = dT0 = zero
            dR = dP = (zero, zero, zero)

        dd_x = acc * (cphi * sth * cpsi + sphi * spsi) + Tp * cphi * sth
        dd_y = acc * (cphi * sth * spsi - sphi * cpsi) + Tp * (-sphi)
        dd_z = acc * cphi * cth - GRAVITY + Tp * cphi * cth
        dd_phi = pc * phi + pd_ * dphi + pe * u1 + Rp
        dd_theta = pf * theta + ph * dtheta + plc * u2 + Pp

        f = jnp.stack(
            [x[1], dd_x, x[3], dd_y, x[5], dd_z, dphi, dtheta, dpsi,
             dd_phi, dd_theta, zero],
            axis=0,
        )

        # Jx entries (≙ models/jacobians.py::prior_jacobians + augmented terms;
        # the GP residual rotation is the psi=0 slice of the thrust rotation).
        jx = {
            (0, 1): one, (2, 3): one, (4, 5): one,
            (6, 9): one, (7, 10): one, (8, 11): one,
            (1, 6): acc * (-sphi * sth * cpsi + cphi * spsi) - Tp * sphi * sth,
            (1, 7): acc * (cphi * cth * cpsi) + Tp * cphi * cth,
            (1, 8): acc * (-cphi * sth * spsi + sphi * cpsi),
            (3, 6): acc * (-sphi * sth * spsi - cphi * cpsi) - Tp * cphi,
            (3, 7): acc * (cphi * cth * spsi),
            (3, 8): acc * (cphi * sth * cpsi + sphi * spsi),
            (5, 6): -(acc + Tp) * sphi * cth,
            (5, 7): -(acc + Tp) * cphi * sth,
            (9, 6): pc * one + dR[0],
            (9, 9): pd_ * one + dR[1],
            (10, 7): pf * one + dP[0],
            (10, 10): ph * one + dP[1],
            (11, 11): zero,
        }
        ju = {
            (1, 0): pa * (cphi * sth * cpsi + sphi * spsi) + dT0 * cphi * sth,
            (3, 0): pa * (cphi * sth * spsi - sphi * cpsi) - dT0 * sphi,
            (5, 0): pa * cphi * cth + dT0 * cphi * cth,
            (9, 1): pe * one + dR[2],
            (10, 2): plc * one + dP[2],
            (11, 3): zero,
        }
        return f, _build_mat(jx, NX, L, f32), _build_mat(ju, NU, L, f32)

    return fc_and_jac


def _cart_fc_and_jac(par_ref, hyp_ref, Zs_ref, alpha_ref, use_gp, zero, one):
    """Closed-form continuous dynamics + Jacobians for the cartpole family
    (models/cartpole.py::continuous_dynamics with the two acceleration-residual
    GPs of CARTPOLE_SPEC: GP0(x_dot, theta_dot, F) on the x_dot row,
    GP1(theta, theta_dot, F) on the theta_dot row)."""
    f32 = jnp.float32
    L = zero.shape[0]
    mc, mp, ell = par_ref[0, 0], par_ref[0, 1], par_ref[0, 2]
    total = mc + mp
    k_ = mp * ell / total

    def fc_and_jac(x, u):
        xdot, theta, omega = x[1], x[2], x[3]
        force = u[0]
        s, c = jnp.sin(theta), jnp.cos(theta)

        if use_gp:
            z0 = (xdot, omega, force)
            z1 = (theta, omega, force)
            inv = lambda g: (hyp_ref[g, 1], hyp_ref[g, 2], hyp_ref[g, 3])
            g0, d0 = _gp_mean_grad(Zs_ref[0], alpha_ref[0], inv(0), hyp_ref[0, 0], z0)
            g1, d1 = _gp_mean_grad(Zs_ref[1], alpha_ref[1], inv(1), hyp_ref[1, 0], z1)
        else:
            g0 = g1 = zero
            d0 = d1 = (zero, zero, zero)

        # Prior accelerations (models/cartpole.py::continuous_dynamics) and
        # their closed-form partials w.r.t. (theta, omega, force).
        tmp = (force + mp * ell * omega * omega * s) / total
        den = ell * (4.0 / 3.0 - mp * c * c / total)
        num = GRAVITY * s - c * tmp
        ddth0 = num / den
        ddx0 = tmp - k_ * ddth0 * c

        dtmp_dth = mp * ell * omega * omega * c / total
        dtmp_dom = 2.0 * mp * ell * omega * s / total
        dtmp_dF = one / total
        dden_dth = 2.0 * ell * mp * c * s / total
        dnum_dth = GRAVITY * c + s * tmp - c * dtmp_dth
        dddth_dth = (dnum_dth * den - num * dden_dth) / (den * den)
        dddth_dom = -c * dtmp_dom / den
        dddth_dF = -c / (total * den)
        dddx_dth = dtmp_dth - k_ * (dddth_dth * c - ddth0 * s)
        dddx_dom = dtmp_dom - k_ * c * dddth_dom
        dddx_dF = dtmp_dF - k_ * c * dddth_dF

        f = jnp.stack([xdot, ddx0 + g0, omega, ddth0 + g1], axis=0)
        jx = {
            (0, 1): one,
            (1, 1): d0[0],
            (1, 2): dddx_dth,
            (1, 3): dddx_dom + d0[1],
            (2, 3): one,
            (3, 2): dddth_dth + d1[0],
            (3, 3): dddth_dom + d1[1],
        }
        ju = {
            (1, 0): dddx_dF + d0[2],
            (3, 0): dddth_dF + d1[2],
        }
        return f, _build_mat(jx, 4, L, f32), _build_mat(ju, 1, L, f32)

    return fc_and_jac


def _twolink_fc_and_jac(par_ref, hyp_ref, Zs_ref, alpha_ref, use_gp, zero, one):
    """Closed-form continuous dynamics + Jacobians for the two-link arm
    (models/twolink.py::continuous_dynamics, uniform-rod 2R manipulator with
    the TWOLINK_SPEC full-feature acceleration-residual GPs; both GPs see
    z = [q1, q2, dq1, dq2, tau1/10, tau2/10])."""
    f32 = jnp.float32
    L = zero.shape[0]
    m1, m2, l1, l2 = par_ref[0, 0], par_ref[0, 1], par_ref[0, 2], par_ref[0, 3]
    lc1, lc2 = 0.5 * l1, 0.5 * l2
    i1, i2 = m1 * l1 * l1 / 12.0, m2 * l2 * l2 / 12.0
    k1c = i1 + i2 + m1 * lc1 * lc1 + m2 * (l1 * l1 + lc2 * lc2)  # m11 const part
    k2c = i2 + m2 * lc2 * lc2  # m12 const part == m22
    a_ = m2 * l1 * lc2
    g1c = (m1 * lc1 + m2 * l1) * GRAVITY
    g2c = m2 * lc2 * GRAVITY
    tau_scale = 0.1  # ≙ models/residual.py::_TWOLINK_TAU_SCALE

    def fc_and_jac(x, u):
        q1, q2, dq1, dq2 = x[0], x[1], x[2], x[3]
        t1, t2 = u[0], u[1]
        c2, s2 = jnp.cos(q2), jnp.sin(q2)
        c12, s12 = jnp.cos(q1 + q2), jnp.sin(q1 + q2)

        if use_gp:
            z = (q1, q2, dq1, dq2, tau_scale * t1, tau_scale * t2)
            inv = lambda g: tuple(hyp_ref[g, 1 + d] for d in range(6))
            g0, d0 = _gp_mean_grad(Zs_ref[0], alpha_ref[0], inv(0), hyp_ref[0, 0], z)
            g1p, d1 = _gp_mean_grad(Zs_ref[1], alpha_ref[1], inv(1), hyp_ref[1, 0], z)
        else:
            g0 = g1p = zero
            d0 = d1 = (zero,) * 6

        m11 = k1c + 2.0 * a_ * c2
        m12 = k2c + a_ * c2
        m22 = k2c * one  # (L,) for uniform broadcasting below
        h = a_ * s2
        gg1 = g1c * jnp.cos(q1) + g2c * c12
        gg2 = g2c * c12
        c1 = -h * dq2 * (2.0 * dq1 + dq2)
        c2v = h * dq1 * dq1
        r1 = t1 - c1 - gg1
        r2 = t2 - c2v - gg2
        det = m11 * m22 - m12 * m12
        num1 = m22 * r1 - m12 * r2
        num2 = m11 * r2 - m12 * r1
        ddq1 = num1 / det
        ddq2 = num2 / det

        # Partials. q2 moves the mass matrix; everything else only moves r.
        dm11 = -2.0 * a_ * s2
        dm12 = -a_ * s2
        dh = a_ * c2
        ddet = dm11 * m22 - 2.0 * m12 * dm12
        dg1_q1 = -g1c * jnp.sin(q1) - g2c * s12
        dg_q2 = -g2c * s12  # = dg1/dq2 = dg2/dq2 = dg2/dq1
        dc1_q2 = -dh * dq2 * (2.0 * dq1 + dq2)
        dc1_dq1 = -2.0 * h * dq2
        dc1_dq2 = -2.0 * h * (dq1 + dq2)
        dc2_q2 = dh * dq1 * dq1
        dc2_dq1 = 2.0 * h * dq1

        dr1 = {  # dr1/dp for p in q1, q2, dq1, dq2, t1, t2
            "q1": -dg1_q1, "q2": -dc1_q2 - dg_q2,
            "dq1": -dc1_dq1, "dq2": -dc1_dq2, "t1": one, "t2": zero,
        }
        dr2 = {
            "q1": -dg_q2, "q2": -dc2_q2 - dg_q2,
            "dq1": -dc2_dq1, "dq2": zero, "t1": zero, "t2": one,
        }

        def dd1(p):  # d(ddq1)/dp, mass matrix fixed
            return (m22 * dr1[p] - m12 * dr2[p]) / det

        def dd2(p):
            return (m11 * dr2[p] - m12 * dr1[p]) / det

        # q2: quotient rule with moving mass matrix
        dnum1_q2 = m22 * dr1["q2"] - dm12 * r2 - m12 * dr2["q2"]
        dnum2_q2 = dm11 * r2 + m11 * dr2["q2"] - dm12 * r1 - m12 * dr1["q2"]
        dd1_q2 = (dnum1_q2 * det - num1 * ddet) / (det * det)
        dd2_q2 = (dnum2_q2 * det - num2 * ddet) / (det * det)

        f = jnp.stack([dq1, dq2, ddq1 + g0, ddq2 + g1p], axis=0)
        ts = tau_scale
        jx = {
            (0, 2): one,
            (1, 3): one,
            (2, 0): dd1("q1") + d0[0],
            (2, 1): dd1_q2 + d0[1],
            (2, 2): dd1("dq1") + d0[2],
            (2, 3): dd1("dq2") + d0[3],
            (3, 0): dd2("q1") + d1[0],
            (3, 1): dd2_q2 + d1[1],
            (3, 2): dd2("dq1") + d1[2],
            (3, 3): dd2("dq2") + d1[3],
        }
        ju = {
            (2, 0): dd1("t1") + ts * d0[4],
            (2, 1): dd1("t2") + ts * d0[5],
            (3, 0): dd2("t1") + ts * d1[4],
            (3, 1): dd2("t2") + ts * d1[5],
        }
        return f, _build_mat(jx, 4, L, f32), _build_mat(ju, 2, L, f32)

    return fc_and_jac


# family name (== ResidualSpec.name) -> hand-derived fc+Jacobian closure factory.
_FAMILY_FC_JAC = {
    "quadrotor": _quad_fc_and_jac,
    "cartpole": _cart_fc_and_jac,
    "twolink": _twolink_fc_and_jac,
}


def _linearize_kernel_body(
    family: str, T: int, dt: float, use_gp: bool,
    # refs
    par_ref,  # (1, 8) plant params in SMEM (family-specific packing)
    hyp_ref,  # (G, 1+D) per-GP [sf2, 1/ell^2 per input dim] in SMEM (D family-dependent)
    X_ref,  # (T+1, nx, L)
    U_ref,  # (T, nu, L)
    Zs_ref,  # (G, Ms, D) mean-inducing inputs (D family-dependent)
    alpha_ref,  # (G, Ms)
    fnext_ref,  # (T, nx, L) out
    A_ref,  # (T, nx, nx, L) out
    B_ref,  # (T, nx, nu, L) out
):
    nx, L = X_ref.shape[1], X_ref.shape[2]
    f32 = jnp.float32
    zero = jnp.zeros((L,), f32)
    one = jnp.ones((L,), f32)
    eye = jnp.stack(
        [jnp.stack([one if i == j else zero for j in range(nx)], 0) for i in range(nx)], 0
    )  # (nx, nx, L)

    fc_and_jac = _FAMILY_FC_JAC[family](
        par_ref, hyp_ref, Zs_ref, alpha_ref, use_gp, zero, one
    )

    # Stage loop as fori_loop, NOT a static unroll: unrolling gives Mosaic a
    # scoped-VMEM stack that grows with T (measured 28.6M at T=50 vs the 16M
    # core limit); the looped body holds one stage's temporaries regardless of T.
    def stage_body(k, _):
        x = X_ref[k]
        u = U_ref[k]
        # RK4 with the analytic chain (≙ models/jacobians.py::rk4_discrete_jacobians)
        k1, J1x, J1u = fc_and_jac(x, u)
        x2 = x + 0.5 * dt * k1
        k2, J2x, J2u = fc_and_jac(x2, u)
        dk2x = _mm(J2x, eye + 0.5 * dt * J1x)
        dk2u = _mm(J2x, 0.5 * dt * J1u) + J2u
        x3 = x + 0.5 * dt * k2
        k3, J3x, J3u = fc_and_jac(x3, u)
        dk3x = _mm(J3x, eye + 0.5 * dt * dk2x)
        dk3u = _mm(J3x, 0.5 * dt * dk2u) + J3u
        x4 = x + dt * k3
        k4, J4x, J4u = fc_and_jac(x4, u)
        dk4x = _mm(J4x, eye + dt * dk3x)
        dk4u = _mm(J4x, dt * dk3u) + J4u

        fnext_ref[k] = x + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
        A_ref[k] = eye + dt / 6.0 * (J1x + 2 * dk2x + 2 * dk3x + dk4x)
        B_ref[k] = dt / 6.0 * (J1u + 2 * dk2u + 2 * dk3u + dk4u)
        return 0

    jax.lax.fori_loop(0, T, stage_body, 0)


@functools.partial(
    jax.jit, static_argnames=("dt", "use_gp", "interpret", "family")
)
def linearize_ocp_lanes(
    params8: jax.Array,  # (8,) plant params (family-specific packing)
    hyp: jax.Array,  # (G, 1+D) per-GP [sf2, 1/ell^2 per input dim (ARD or repeated)]
    Zs: jax.Array,  # (G, Ms, D) mean-inducing inputs (D=3 quad/cartpole, 6 twolink)
    alpha: jax.Array,  # (G, Ms) mean weights (zero rows inert)
    X: jax.Array,  # (T+1, nx, L) lanes-layout state trajectory
    U: jax.Array,  # (T, nu, L)
    dt: float,
    use_gp: bool = True,
    interpret: bool = False,
    family: str = "quadrotor",
):
    """Linearize all T stages of a lane tile: (fnext, A, B) in lanes layout."""
    Tp1, nx, L = X.shape
    T = Tp1 - 1
    nu = U.shape[1]
    f32 = jnp.float32
    if family not in _FAMILY_FC_JAC:
        raise ValueError(
            f"no hand-derived kernel linearizer for model family {family!r} "
            f"(have {sorted(_FAMILY_FC_JAC)}); use the jacfwd/XLA path"
        )

    kernel = functools.partial(
        _linearize_kernel_body, family, T, float(dt), use_gp
    )
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    sm = lambda shape: pl.BlockSpec(shape, memory_space=pltpu.SMEM)
    fnext, A, B = pl.pallas_call(
        kernel,
        in_specs=[sm((1, 8)), sm(tuple(hyp.shape)), vm(), vm(), vm(), vm()],
        out_specs=[vm(), vm(), vm()],
        out_shape=[
            jax.ShapeDtypeStruct((T, nx, L), f32),
            jax.ShapeDtypeStruct((T, nx, nx, L), f32),
            jax.ShapeDtypeStruct((T, nx, nu, L), f32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES),
    )(
        params8.astype(f32)[None, :],
        hyp.astype(f32),
        X.astype(f32),
        U.astype(f32),
        Zs.astype(f32),
        alpha.astype(f32),
    )
    return fnext, A, B
