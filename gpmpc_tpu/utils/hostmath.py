"""Host-side eager math: run one-off setup computations on the local CPU backend.

Controller construction needs a handful of tiny eager computations (equilibrium
Jacobians, exact discretization, an LQR gain). Under a REMOTE accelerator
backend (the axon TPU tunnel used here) every eager op is a device round-trip,
and fetching its result can block for minutes when the service is congested —
this was the round-3 `bench.py` timeout: the driver's run sat inside
`GPMPC.__init__` waiting on a scalar quantile fetch, not in the big compile
(VERDICT.md round 3, item 1; stack-dump evidence in docs/BENCH_NOTES.md).

Everything constructed here is O(nx²) host work with no reuse on the hot path,
so the right placement is the local CPU backend: `host_default_device()` makes
eager ops inside the context run on CPU (falling back to the default device if
no CPU backend exists, e.g. under JAX_PLATFORMS pinning that excludes it).
"""

from __future__ import annotations

import contextlib

import jax


def cpu_device():
    """A PROCESS-LOCAL CPU device, or None if the CPU backend is unavailable.

    `local_devices`, not `devices`: under multi-process `jax.distributed`
    (tests/test_multihost.py) `jax.devices("cpu")` enumerates the global mesh
    and index 0 is non-addressable on every process but 0 — eager setup math
    placed there cannot be fetched."""
    try:
        return jax.local_devices(backend="cpu")[0]
    except Exception:
        return None


def host_default_device():
    """Context manager: eager ops inside run on the local CPU backend.

    Inputs should be numpy/python (uncommitted); outputs should be pulled out
    with `np.asarray` INSIDE the calling scope — fetching from the local CPU
    costs nothing, which is the whole point.
    """
    cpu = cpu_device()
    if cpu is None:
        return contextlib.nullcontext()
    return jax.default_device(cpu)
