"""Squared-exponential (RBF) kernels as jnp expressions.

≙ /root/reference/gpmpc/gp.py:12-21 (`covSE_single`, `covSE_vectorized`) — CasADi
symbolic kernels rebuilt as traced JAX functions — and the GPyTorch
ScaleKernel(RBFKernel) Gram assembly (`gp.py:34,45`).

Padding convention used across the GP stack: variable-size datasets are stored in
fixed-size buffers; padded *rows* carry a 0 entry in an accompanying mask, and
padded *feature columns* are zero in both arguments, so they contribute nothing to
the squared distance. This keeps every shape static — the reference recompiles its
solver whenever the GP dataset grows (/root/reference/gpmpc/gpmpc.py:97-108,213-218);
here dataset growth is a pure data change.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def se_kernel(
    x1: jax.Array, x2: jax.Array, lengthscale: jax.Array, outputscale: jax.Array
) -> jax.Array:
    """K[i, j] = sf2 * exp(-0.5 * sum_d (x1[i,d] - x2[j,d])^2 / ell^2).

    x1: (n, d), x2: (m, d); lengthscale scalar (or (d,) for ARD); returns (n, m).
    """
    diff = (x1[:, None, :] - x2[None, :, :]) / lengthscale
    dist2 = jnp.sum(diff * diff, axis=-1)
    return outputscale * jnp.exp(-0.5 * dist2)


def se_kernel_diag(x: jax.Array, outputscale: jax.Array) -> jax.Array:
    """diag K(x, x) = sf2 (stationary kernel). x: (n, d) -> (n,)."""
    return jnp.full(x.shape[:-1], 1.0, x.dtype) * outputscale
