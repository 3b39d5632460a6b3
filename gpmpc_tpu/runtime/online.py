"""Online GP learning for the serving runtime: collect -> refit -> hot-swap.

The production learning loop the reference cannot run: its retrain path
regenerates and recompiles an acados solver (gpmpc.py:97-108), so learning
online would stall serving for the codegen+compile time. Here the GP is a
runtime argument of the jitted dispatch (padded buffers), so a background
refit produces a new `GpModel` pytree and `ControlServer.update_gp` swaps it
in between dispatches with zero recompiles and zero downtime.

Usage (see tests/test_server.py::test_online_learning_loop):

    server = ControlServer(..., record_capacity=4096)
    learner = OnlineLearner(model, prior_params, capacity=max_gp_points,
                            max_inducing=max_gp_samples)
    ...
    learner.ingest(*server.drain_transitions())   # periodically, any thread
    server.update_gp(learner.refit())

Shape contract: `capacity` must equal the serving GpModel's padded dataset
capacity (the controller's `max_gp_points`) and `max_inducing` its inducing
count (`max_gp_samples`) — otherwise the swapped pytree would change traced
shapes and recompile the dispatch; `ControlServer.update_gp` rejects that.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.control.gpmpc import (
    GpModel,
    model_spec,
    pack_training_buffers,
    preprocess_data_jnp,
    train_gp_models,
)
from gpmpc_tpu.models.symbolic import SymbolicModel

_INGEST_CHUNK = 256  # fixed preprocess shape -> one compile, any drain size


class OnlineLearner:
    """Accumulate served transitions into a ring buffer and refit the GP ensemble.

    All device work is two jitted programs with fixed shapes: a chunked
    transition preprocessor and the refit (whose active-row count is a traced
    mask) — ingesting more data or wrapping the ring never recompiles either.
    Thread-safety: call `ingest`/`refit` from one trainer thread (the server's
    own threads are independent).
    """

    def __init__(
        self,
        model: SymbolicModel,
        prior_params: dict | None = None,
        capacity: int = 4096,
        max_inducing: int = 40,
        sparse: bool = True,
        n_train: int = 100,
        lr: float = 0.05,
        seed: int = 0,
    ):
        spec = model_spec(model)
        self._x = np.zeros((capacity, spec.z_dim), np.float32)
        self._y = np.zeros((capacity, spec.num_gps), np.float32)
        self._capacity = capacity
        self._write = 0  # ring head
        self._count = 0  # rows filled (saturates at capacity)
        self._key = jax.random.PRNGKey(seed)
        if spec.name == "quadrotor" and prior_params is not None:
            # legacy contract: the thrust map comes from the caller's prior fit
            self._preprocess = jax.jit(
                partial(preprocess_data_jnp, model,
                        float(prior_params["a"]), float(prior_params["b"]))
            )
        else:
            self._preprocess = jax.jit(partial(spec.make_targets, model))

        def refit(bufx, bufy, count, key):
            return train_gp_models(
                pack_training_buffers(bufx, bufy, count, spec), key, sparse=sparse,
                max_inducing=min(max_inducing, capacity),
                n_train=n_train, lr=lr,
            )

        self._refit = jax.jit(refit)

    @property
    def n_points(self) -> int:
        return self._count

    def ingest(self, x: np.ndarray, u: np.ndarray, x_next: np.ndarray) -> int:
        """Preprocess raw transitions into GP residual targets and buffer them.

        Returns the number of rows ingested. Inputs are padded to a fixed
        chunk shape so the jitted preprocessor compiles once.
        """
        n = x.shape[0]
        for lo in range(0, n, _INGEST_CHUNK):
            hi = min(lo + _INGEST_CHUNK, n)
            m = hi - lo
            pad = _INGEST_CHUNK - m
            xp = np.pad(x[lo:hi].astype(np.float32), ((0, pad), (0, 0)))
            up = np.pad(u[lo:hi].astype(np.float32), ((0, pad), (0, 0)))
            np_ = np.pad(x_next[lo:hi].astype(np.float32), ((0, pad), (0, 0)))
            xi, ti = jax.device_get(self._preprocess(xp, up, np_))
            # Vectorized ring write: head segment + wraparound segment.
            w, cap = self._write, self._capacity
            if m >= cap:  # chunk alone overwrites the whole ring
                self._x[:], self._y[:] = xi[m - cap:m], ti[m - cap:m]
                self._write, self._count = 0, cap
                continue
            head = min(m, cap - w)
            self._x[w:w + head], self._y[w:w + head] = xi[:head], ti[:head]
            if m > head:
                self._x[:m - head], self._y[:m - head] = xi[head:m], ti[head:m]
            self._write = (w + m) % cap
            self._count = min(self._count + m, cap)
        return n

    def refit(self) -> GpModel:
        """Refit the 3-GP ensemble on everything buffered; returns the new model
        (pass it to ControlServer.update_gp). Raises if nothing was ingested."""
        if self._count == 0:
            raise RuntimeError("no transitions ingested yet")
        self._key, sub = jax.random.split(self._key)
        return self._refit(
            jnp.asarray(self._x), jnp.asarray(self._y),
            jnp.asarray(self._count, jnp.int32), sub,
        )
