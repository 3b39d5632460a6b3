"""Fused GP posterior mean + variance as a Pallas TPU kernel.

The BASELINE.json "GP-inference kernel" deliverable: one VMEM-resident pass that,
for a tile of query points, builds the SE kernel row block k(z, X), the posterior
mean k @ alpha, and the predictive variance sf2 - rowsum((k @ K_inv) * k) — the
two matmuls hit the MXU (M = padded dataset capacity is the 128 lane dimension),
and the distance/exp/mask work fuses into the same kernel instead of separate HBM
round-trips.

Uses the explicit K_inv = (K + sigma^2 I)^-1 cache (computed once per GP training,
≙ GaussianProcess.compute_covariances at /root/reference/gpmpc/gp.py:43-46).

Wiring: the batched tightening path routes through this kernel on TPU
(control/gpmpc.py::batched_variances, backend="pallas"/"auto"); parity vs the
jnp quadratic form is locked by tests/test_pallas_gp.py. Isotropic AND ARD
lengthscales (per-dimension reciprocal squares). It is inference-only (no AD);
the in-dynamics residual mean keeps the jnp path, which must be differentiable
for the SQP linearizer (or the closed-form kernel in ops/pallas_linearize.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QUERY_TILE = 128


def _gp_posterior_kernel(
    z_ref,  # (TILE, D) query tile
    Zt_ref,  # (D, M) training inputs, transposed
    alpha_ref,  # (M, 1) posterior weights
    Kinv_ref,  # (M, M)
    hyp_ref,  # (1, 3 + D) [sf2, noise, include_noise, inv_ell2_0 .. inv_ell2_{D-1}]
    mask_ref,  # (1, M)
    mean_ref,  # (TILE, 1) out
    var_ref,  # (TILE, 1) out
):
    sf2 = hyp_ref[0, 0]
    noise = hyp_ref[0, 1]
    add_noise = hyp_ref[0, 2]

    d = Zt_ref.shape[0]
    dist2 = jnp.zeros((z_ref.shape[0], Zt_ref.shape[1]), jnp.float32)
    for i in range(d):  # D is small (3): unrolled at trace time
        diff = z_ref[:, i : i + 1] - Zt_ref[i : i + 1, :]
        # per-dimension reciprocal square lengthscale: ARD costs one extra
        # scalar multiply per dim (identical scalars for isotropic kernels)
        dist2 = dist2 + (diff * diff) * hyp_ref[0, 3 + i]
    k = sf2 * jnp.exp(-0.5 * dist2) * mask_ref[0:1, :]

    mean_ref[:, :] = jnp.dot(k, alpha_ref[:, :], preferred_element_type=jnp.float32)
    t = jnp.dot(k, Kinv_ref[:, :], preferred_element_type=jnp.float32)
    var = sf2 - jnp.sum(t * k, axis=1, keepdims=True)
    var = jnp.maximum(var, 1e-12)
    var_ref[:, :] = var + noise * add_noise


@functools.partial(jax.jit, static_argnames=("include_noise", "interpret"))
def gp_mean_var(
    z: jax.Array,  # (N, D) query points
    Z: jax.Array,  # (M, D) training inputs (padded)
    alpha: jax.Array,  # (M,)
    K_inv: jax.Array,  # (M, M)
    lengthscale: jax.Array,
    outputscale: jax.Array,
    noise: jax.Array,
    mask: jax.Array,  # (M,)
    include_noise: bool = False,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Posterior mean and variance at N query points, fused on-chip.

    `lengthscale` may be a scalar (isotropic) or a (D,) ARD vector — both feed
    the kernel as D reciprocal squares.
    """
    n, d = z.shape
    m = Z.shape[0]
    n_pad = (-n) % QUERY_TILE
    z_p = jnp.pad(z.astype(jnp.float32), ((0, n_pad), (0, 0)))
    inv_ell2 = jnp.broadcast_to(
        1.0 / (jnp.asarray(lengthscale) ** 2), (d,)
    ).astype(jnp.float32)
    hyp = jnp.concatenate(
        [
            jnp.stack(
                [outputscale, noise, jnp.asarray(1.0 if include_noise else 0.0)]
            ).astype(jnp.float32),
            inv_ell2,
        ]
    )[None, :]

    grid = ((n + n_pad) // QUERY_TILE,)
    mean, var = pl.pallas_call(
        _gp_posterior_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((QUERY_TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 + d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((QUERY_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((QUERY_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n + n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n + n_pad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(
        z_p,
        Z.T.astype(jnp.float32),
        alpha.astype(jnp.float32)[:, None],
        K_inv.astype(jnp.float32),
        hyp,
        mask.astype(jnp.float32)[None, :],
    )
    return mean[:n, 0], var[:n, 0]


def gp_mean_var_reference(
    z, Z, alpha, K_inv, lengthscale, outputscale, noise, mask, include_noise=False
):
    """Plain-jnp reference implementation (used for parity tests and as the
    fallback on non-TPU backends)."""
    diff = (z[:, None, :] - Z[None, :, :]) / lengthscale
    k = outputscale * jnp.exp(-0.5 * jnp.sum(diff * diff, axis=-1)) * mask[None, :]
    mean = k @ alpha
    var = outputscale - jnp.einsum("nm,mk,nk->n", k, K_inv, k)
    var = jnp.maximum(var, 1e-12)
    if include_noise:
        var = var + noise
    return mean, var
