"""Batched SQP with the lane-packed Pallas QP backend.

Same Gauss-Newton SQP semantics as `sqp.sqp_solve` (full steps, masked
convergence), but organized batch-first: dynamics linearization runs as one big
vmapped `jacfwd` over all B*T stage points (elementwise-over-batch XLA code, which
the TPU vectorizes well), and the QP solves go through `pallas_ocp.
solve_ocp_qp_lanes`, which lane-packs 128 scenarios per kernel launch (the part
XLA handles badly — see pallas_ocp.py).

Requires diagonal Q/R stage costs (always true for this framework's LINEAR_LS
tracking cost + IP barrier).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from gpmpc_tpu.ops.boxqp import BOUND_INF
from gpmpc_tpu.ops.pallas_ocp import LANES, LanesQp, solve_ocp_qp_lanes
from gpmpc_tpu.ops.sqp import OcpBounds, OcpCost, SqpConfig, SqpSolution


# All-resident kernel VMEM cap. After the accumulating-matmul rewrite (small
# live temporaries) T=50 compiles and solves on v5e (validated; gap ~1e-7);
# larger horizons are untested and would fail loudly at compile with a VMEM OOM.
MAX_LANES_HORIZON = 50


def _lane_width(T: int) -> int:
    """Lane-tile width. The lane axis is physically padded to 128, so narrowing
    tiles does NOT reduce VMEM — the kernel simply requires T <= MAX_LANES_HORIZON
    (callers fall back to the XLA backend beyond that; a streaming-DMA variant
    that stages A/B through HBM is the future long-horizon path)."""
    if T > MAX_LANES_HORIZON:
        raise ValueError(
            f"lanes backend supports horizons up to {MAX_LANES_HORIZON} (got {T}); "
            "use the xla backend (optionally with parallel_scan) for longer horizons"
        )
    return LANES


def _to_lane_tiles(x: jax.Array, n_tiles: int, lanes: int) -> jax.Array:
    """(B_pad, ...) -> (n_tiles, ..., lanes)."""
    x = jnp.moveaxis(x, 0, -1)  # (..., B_pad)
    x = x.reshape(x.shape[:-1] + (n_tiles, lanes))
    return jnp.moveaxis(x, -2, 0)  # (n_tiles, ..., lanes)


def _from_lane_tiles(x: jax.Array, B: int) -> jax.Array:
    """(n_tiles, ..., LANES) -> (B, ...)."""
    x = jnp.moveaxis(x, 0, -2)  # (..., n_tiles, LANES)
    x = x.reshape(x.shape[:-2] + (x.shape[-2] * x.shape[-1],))
    return jnp.moveaxis(x, -1, 0)[:B]


def sqp_solve_batch_lanes(
    fd: Callable[[jax.Array, jax.Array], jax.Array],
    cost: OcpCost,  # leaves batched over B (xref/uref) or shared (Q/R/scale)
    bounds: OcpBounds,  # leaves batched over B
    x0: jax.Array,  # (B, nx)
    X_init: jax.Array,  # (B, T+1, nx)
    U_init: jax.Array,  # (B, T, nu)
    cfg: SqpConfig,
    interpret: bool = False,
    fd_jac3=None,
) -> SqpSolution:
    """Batch SQP solve; returns SqpSolution with leaves batched over B.

    fd_jac3: optional (x, u) -> (fnext, A, B) combined evaluator (analytic
    Jacobians, models/jacobians.py); default differentiates fd with jacfwd.
    """
    B, Tp1, nx = X_init.shape
    T = Tp1 - 1
    nu = U_init.shape[2]
    dtype = X_init.dtype
    lanes = _lane_width(T)
    B_pad = B + ((-B) % lanes)
    n_tiles = B_pad // lanes

    q_diag_stage = jnp.diagonal(cost.Q)  # (nx,)
    qe_diag = jnp.diagonal(cost.Qe)
    r_diag = jnp.diagonal(cost.R)
    scale = cost.scale  # (T+1,)
    qdiag = jnp.concatenate(
        [scale[:-1, None] * q_diag_stage[None], (scale[-1] * qe_diag)[None]], axis=0
    )  # (T+1, nx)
    rdiag = scale[:-1, None] * r_diag[None]  # (T, nu)

    if fd_jac3 is None:
        fd_jac = jax.vmap(jax.vmap(jax.jacfwd(fd, argnums=(0, 1))))
        fd_batch = jax.vmap(jax.vmap(fd))

        def linearize(X, U):
            A, Bm = fd_jac(X, U)
            return fd_batch(X, U), A, Bm
    else:
        linearize = jax.vmap(jax.vmap(fd_jac3))

    def pad_b(x):
        return jnp.pad(x, [(0, B_pad - B)] + [(0, 0)] * (x.ndim - 1))

    big = jnp.asarray(BOUND_INF, dtype)

    def body(carry, _):
        X, U, converged, step_norm, qp_gap, n_iters = carry
        X = X.at[:, 0, :].set(x0)

        fnext, A, Bm = linearize(X[:, :-1], U)  # (B,T,nx), (B,T,nx,nx), (B,T,nx,nu)
        defect = fnext - X[:, 1:]

        ex = X - cost.xref
        eu = U - cost.uref
        qx = qdiag[None] * ex  # (B, T+1, nx)
        ru = rdiag[None] * eu

        lx = bounds.lx - X
        ux = bounds.ux - X
        lx = lx.at[:, 0, :].set(-big)
        ux = ux.at[:, 0, :].set(big)
        lu = bounds.lu - U
        uu = bounds.uu - U

        tiles = LanesQp(
            A=_to_lane_tiles(pad_b(A), n_tiles, lanes),
            B=_to_lane_tiles(pad_b(Bm), n_tiles, lanes),
            r=_to_lane_tiles(pad_b(defect), n_tiles, lanes),
            qdiag=_to_lane_tiles(pad_b(jnp.broadcast_to(qdiag[None], (B,) + qdiag.shape)), n_tiles, lanes),
            qx=_to_lane_tiles(pad_b(qx), n_tiles, lanes),
            rdiag=_to_lane_tiles(pad_b(jnp.broadcast_to(rdiag[None], (B,) + rdiag.shape)), n_tiles, lanes),
            ru=_to_lane_tiles(pad_b(ru), n_tiles, lanes),
            lx=_to_lane_tiles(pad_b(lx), n_tiles, lanes),
            ux=_to_lane_tiles(pad_b(ux), n_tiles, lanes),
            lu=_to_lane_tiles(pad_b(lu), n_tiles, lanes),
            uu=_to_lane_tiles(pad_b(uu), n_tiles, lanes),
        )
        dx_t, du_t, gap_t = jax.lax.map(
            lambda t: solve_ocp_qp_lanes(
                t, n_ip=cfg.qp_iters, adaptive_tol=cfg.qp_tol,
                mehrotra=cfg.qp_mehrotra, interpret=interpret,
            ),
            tiles,
        )
        dx = _from_lane_tiles(dx_t, B)  # (B, T+1, nx)
        du = _from_lane_tiles(du_t, B)
        gap = gap_t.reshape(-1)[:B]  # (B,) per-scenario complementarity gap

        new_step = jnp.maximum(
            jnp.max(jnp.abs(dx), axis=(1, 2)), jnp.max(jnp.abs(du), axis=(1, 2))
        )  # (B,)
        active = jnp.logical_not(converged)[:, None, None]
        X_new = jnp.where(active, X + dx, X)
        U_new = jnp.where(active, U + du, U)
        step_norm = jnp.where(active[:, 0, 0], new_step, step_norm)
        qp_gap = jnp.where(active[:, 0, 0], gap, qp_gap)
        n_iters = n_iters + active[:, 0, 0].astype(jnp.int32)
        converged = jnp.logical_or(converged, new_step < cfg.step_tol)
        return (X_new, U_new, converged, step_norm, qp_gap, n_iters), None

    init = (
        X_init,
        U_init,
        jnp.zeros((B,), bool),
        jnp.full((B,), jnp.inf, dtype),
        jnp.full((B,), jnp.inf, dtype),
        jnp.zeros((B,), jnp.int32),
    )
    if cfg.early_exit:
        def cond(carry):
            _, _, converged, _, _, n_iters = carry
            return jnp.logical_and(
                jnp.max(n_iters) < cfg.sqp_iters, jnp.logical_not(jnp.all(converged))
            )

        (X, U, _, step_norm, qp_gap, n_iters) = jax.lax.while_loop(
            cond, lambda c: body(c, None)[0], init
        )
    else:
        (X, U, _, step_norm, qp_gap, n_iters), _ = jax.lax.scan(
            body, init, None, length=cfg.sqp_iters
        )
    X = X.at[:, 0, :].set(x0)
    return SqpSolution(
        X=X, U=U, step_norm=step_norm, qp_gap=qp_gap, n_iters=n_iters
    )
