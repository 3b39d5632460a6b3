"""Micro-batching GP-MPC serving runtime.

Production serving for the controller: many concurrent control loops (drones,
simulation workers, HIL rigs) share ONE chip by packing their per-step solves
into a single lane tile. The classic dynamic-batching inference-server design
(collect requests for up to `max_wait_ms`, run one fixed-shape device program,
scatter results) maps cleanly onto this framework because the batched GP-MPC
step is already one compiled program over a padded scenario axis
(`parallel/batch.py::batched_gpmpc_step`): batch occupancy is data, not shape,
so every dispatch — 1 request or `tile` requests — reuses the same executable.

The reference has no serving story at all: one acados solve per process per
step through a ctypes boundary (SURVEY.md §3.5). Here one v5e chip serves
~91k solves/s at full occupancy (README), and a half-empty tile costs the same
wall-clock as a full one — idle slots simply re-solve their stale observation
and their results are discarded (their warm-start state is NOT committed, so
session semantics are exact).

Design notes:
  * Sessions are slots in the tile. Each slot owns an `MpcState` (SQP warm
    start + trajectory position) living on-device; a step commits the new
    state ONLY for slots that actually requested this dispatch.
  * The GP model is hot-swappable (`update_gp`) between dispatches: padded GP
    buffers make the swap a pure data update — no recompile, no downtime.
    This is the online-learning serving loop: collect transitions at the
    edge, refit centrally, push the new GpModel.
  * Thread model: client threads block in `step()` on a per-request event;
    one dispatcher thread owns all device-state mutation. The GIL is released
    during device execution, so client-side env stepping overlaps the solve.
"""

from __future__ import annotations

import queue
import threading
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.control import mpc as mpc_mod
from gpmpc_tpu.control.gpmpc import GpModel, GpMpcConsts
from gpmpc_tpu.models.symbolic import SymbolicModel
from gpmpc_tpu.ops.sqp import SqpConfig
from gpmpc_tpu.parallel.batch import batched_gpmpc_step, cfg_horizon


class ServerStats(NamedTuple):
    n_requests: int
    n_batches: int

    @property
    def mean_batch_size(self) -> float:
        return self.n_requests / self.n_batches if self.n_batches else 0.0


class _Request(NamedTuple):
    slot: int
    obs: np.ndarray
    done: threading.Event
    out: dict


_SHUTDOWN = None  # queue sentinel

# Per-solve diagnostics, in the exact order the dispatch program stacks them —
# the single definition both the stack and the result dict are built from.
# eq_res/stat_res/converged are the round-3 KKT residual telemetry (acados
# residual semantics, ops/sqp.py::kkt_residuals) — a serving client can see a
# non-converged solve the same way a local caller sees MpcInfo.converged.
DIAG_FIELDS = ("qp_gap", "n_iters", "soft_viol", "eq_res", "stat_res", "converged")
_DIAG_INT = {"n_iters"}
_DIAG_BOOL = {"converged"}


class ControlServer:
    """Serve GP-MPC actions to concurrent control sessions with micro-batching.

    Usage:
        server = ControlServer(model, cfg, consts, gp, tile=128)
        sid = server.open_session()
        u = server.step(sid, obs)          # thread-safe, blocking
        server.update_gp(new_gp)           # hot-swap after a retrain
        server.close_session(sid); server.close()
    """

    def __init__(
        self,
        model: SymbolicModel,
        cfg: SqpConfig,
        consts: GpMpcConsts,
        gp: GpModel,
        tile: int = 128,
        backend: str = "lanes",
        max_wait_ms: float = 2.0,
        pipeline_depth: int = 2,
        record_capacity: int = 0,
        actions_per_step: int = 1,
    ):
        self._consts, self._gp = consts, gp
        self._tile = tile
        self._max_wait_s = max_wait_ms / 1e3
        T, nx, nu = cfg_horizon(consts), model.nx, model.nu
        # N-step action-horizon replies (round-5 verdict item 6): the MPC
        # already computes the full open-loop plan U (T, nu) every solve, so
        # returning its first N actions amortizes the per-request round-trip
        # (the ~25 ms tunnel fetch on remote-attached TPUs) over N control
        # steps — the client applies them open-loop and comes back after N
        # plant steps. Staleness guard: N is capped well inside the horizon
        # (the plan is recomputed from a fresh observation every dispatch, so
        # the oldest action a client ever applies is N-1 steps stale).
        if not 1 <= actions_per_step <= T:
            raise ValueError(
                f"actions_per_step={actions_per_step} must be in [1, horizon={T}]"
            )
        if actions_per_step > 1 and record_capacity > 0:
            raise ValueError(
                "transition recording requires actions_per_step=1: with N-step "
                "replies consecutive observations are N plant steps apart, which "
                "would poison the one-step residual targets the GP trains on"
            )
        self._n_act = actions_per_step
        self._state0 = mpc_mod.init_state(T, nx, nu)
        self._states = jax.tree.map(
            lambda l: jnp.tile(l[None], (tile,) + (1,) * l.ndim), self._state0
        )
        # Benign placeholder obs for never-used slots: the trajectory start.
        self._obs = jnp.tile(
            jnp.asarray(consts.mpc.traj[0], jnp.float32)[None], (tile, 1)
        )
        self._nx, self._nu = nx, nu

        step_fn = partial(batched_gpmpc_step, model, cfg, backend=backend)

        def dispatch(consts_, gp_, states, obs_buf, slots, obs_new):
            """One fixed-shape device program per dispatch, any occupancy.

            `slots` is always (tile,) — real requests first, padding = `tile`
            (out of range). Padded scatters are dropped (`mode="drop"`), so a
            1-request dispatch and a full-tile dispatch run the SAME compiled
            executable: occupancy is data, not shape. Crucially this keeps the
            whole dispatch as one jitted call — per-request eager index ops
            would cost a host<->device round-trip each (catastrophic through
            the remote-TPU tunnel, measured 3.2 s/dispatch vs ~5 ms jitted).
            """
            obs_buf = obs_buf.at[slots].set(obs_new, mode="drop")
            u, new_states, info = step_fn(consts_, gp_, states, obs_buf)
            n_act = self._n_act
            if n_act > 1:
                # Reply with the plan head U[:N] (u IS U_warm[:, 0] — both
                # step backends return sol.U[:, 0] and warm-start on sol.U)
                # and advance the session by N: the trajectory clock jumps N
                # reference steps, and the warm start shifts by the extra N-1
                # (clipped-index gather ≙ the usual shift-and-hold-last) so
                # the next solve's initial guess stays time-aligned.
                u = new_states.U_warm[:, :n_act]
                shift = n_act - 1
                Th = new_states.U_warm.shape[1]
                idx_u = jnp.clip(jnp.arange(Th) + shift, 0, Th - 1)
                idx_x = jnp.clip(jnp.arange(Th + 1) + shift, 0, Th)
                new_states = new_states._replace(
                    traj_step=new_states.traj_step + shift,
                    U_warm=new_states.U_warm[:, idx_u],
                    X_warm=new_states.X_warm[:, idx_x],
                )
            # Per-session solver health, rides the same result fetch (the
            # reference exposes the analogous acados diagnostics per solve).
            # Stacked in DIAG_FIELDS order.
            diag = jnp.stack(
                [getattr(info, f).astype(u.dtype) for f in DIAG_FIELDS], axis=-1
            )
            safe = jnp.clip(slots, 0, tile - 1)
            # Commit warm-start state ONLY for stepped slots: idle slots'
            # recomputed states are discarded so their session clocks
            # (traj_step) don't advance.
            states = jax.tree.map(
                lambda old, new: old.at[slots].set(
                    jnp.take(new, safe, axis=0), mode="drop"
                ),
                states,
                new_states,
            )
            return u, diag, states, obs_buf

        self._dispatch = jax.jit(dispatch)

        self._lock = threading.Lock()  # guards device state + slot pool + gp
        self._stats_lock = threading.Lock()
        self._free = list(range(tile))
        self._queue: queue.Queue = queue.Queue()
        self._n_requests = 0
        self._n_batches = 0
        self._pipeline_depth = max(1, pipeline_depth)
        self._fetch_pool = ThreadPoolExecutor(
            max_workers=self._pipeline_depth, thread_name_prefix="gpmpc-fetch"
        )
        # Online-learning hooks: with record_capacity > 0 the server keeps the
        # most recent (x, u, x_next) transitions observed across all sessions —
        # the raw material for a background GP refit + update_gp() hot-swap
        # (runtime/online.py::OnlineLearner).
        self._record_lock = threading.Lock()
        self._transitions: deque = deque(maxlen=record_capacity or None)
        self._record = record_capacity > 0
        self._pending_rec: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._closed = False
        self._close_lock = threading.Lock()
        self._dispatcher = threading.Thread(target=self._run, daemon=True)
        self._dispatcher.start()

    # -- session management ------------------------------------------------

    def open_session(self) -> int:
        """Claim a slot; its warm-start state is reset to a fresh controller."""
        with self._lock:
            if not self._free:
                raise RuntimeError(f"all {self._tile} session slots in use")
            slot = self._free.pop()
            self._states = jax.tree.map(
                lambda s, s0: s.at[slot].set(s0), self._states, self._state0
            )
        with self._record_lock:
            self._pending_rec.pop(slot, None)  # no cross-session transitions
        return slot

    def close_session(self, slot: int) -> None:
        with self._lock:
            if slot in self._free:
                raise ValueError(f"session {slot} is not open")
            self._free.append(slot)
        with self._record_lock:
            self._pending_rec.pop(slot, None)

    def drain_transitions(self):
        """Pop all recorded (x, u, x_next) transitions as three stacked arrays
        (empty (0, .) arrays if none). Requires record_capacity > 0."""
        with self._record_lock:
            items = list(self._transitions)
            self._transitions.clear()
        if not items:
            nx, nu = self._nx, self._nu
            return (np.zeros((0, nx), np.float32), np.zeros((0, nu), np.float32),
                    np.zeros((0, nx), np.float32))
        x, u, x_next = (np.stack(c) for c in zip(*items))
        return x, u, x_next

    def update_gp(self, gp: GpModel) -> None:
        """Hot-swap the GP model.

        Zero recompiles REQUIRES the new model's padded buffer shapes to match
        the serving model's (capacity == max_gp_points, inducing == Ms) — a
        shape change would silently retrace the whole dispatch program under
        the lock, stalling every session for the compile. Enforced here.
        """
        new_leaves, new_tree = jax.tree.flatten(gp)
        old_leaves, old_tree = jax.tree.flatten(self._gp)
        sig = lambda ls: [(jnp.shape(x), jnp.result_type(x)) for x in ls]  # noqa: E731
        if new_tree != old_tree or sig(new_leaves) != sig(old_leaves):
            raise ValueError(
                "GP hot-swap would change traced shapes (recompile + serving "
                "stall); refit with buffers sized to the serving model "
                "(capacity == max_gp_points, inducing == max_gp_samples)"
            )
        with self._lock:
            self._gp = gp

    @property
    def stats(self) -> ServerStats:
        with self._stats_lock:  # consistent snapshot vs concurrent _deliver
            return ServerStats(self._n_requests, self._n_batches)

    # -- session checkpoint/restore -----------------------------------------

    def save_sessions(self, path) -> None:
        """Persist every session's device-side state (warm starts, trajectory
        clocks, last observations, slot occupancy) plus the serving GP via
        utils/checkpoint.py — a server restart resumes every control session
        exactly where it left off (the drone does not care that the server
        moved hosts). Quiescent by construction: taken under the device lock,
        so no dispatch is mutating state mid-snapshot."""
        from gpmpc_tpu.utils.checkpoint import save_pytree

        with self._lock:
            tree = {"states": self._states, "obs": self._obs, "gp": self._gp}
            free = list(self._free)
        save_pytree(path, tree, metadata={"free": free, "tile": self._tile})

    def restore_sessions(self, path) -> None:
        """Restore a `save_sessions` snapshot into this server (same tile size
        and GP buffer shapes — enforced by the pytree shape check)."""
        from gpmpc_tpu.utils.checkpoint import load_metadata, load_pytree

        meta = load_metadata(path)
        if int(meta["tile"]) != self._tile:
            raise ValueError(
                f"snapshot tile {meta['tile']} != server tile {self._tile}"
            )
        with self._lock:
            tree = load_pytree(
                path, {"states": self._states, "obs": self._obs, "gp": self._gp}
            )
            self._states, self._obs, self._gp = (
                tree["states"], tree["obs"], tree["gp"],
            )
            self._free = [int(s) for s in meta["free"]]

    # -- serving -----------------------------------------------------------

    def step(self, slot: int, obs) -> np.ndarray:
        """Request actions for session `slot` at observation `obs` (blocking).

        Returns one action (nu,) with the default actions_per_step=1; with
        actions_per_step=N>1, the first N actions (N, nu) of the freshly
        solved open-loop plan — apply them in order and call again after N
        plant steps (the per-request round-trip amortizes over N actions)."""
        return self.step_with_diag(slot, obs)[0]

    def step_with_diag(self, slot: int, obs) -> tuple[np.ndarray, dict]:
        """Like `step`, also returning per-solve solver health: qp_gap (final
        complementarity gap), n_iters (SQP iterations), soft_viol (largest
        state-box violation — the graceful-degradation telemetry). Costs
        nothing extra: the diagnostics ride the same device fetch."""
        obs = np.asarray(obs, np.float32)
        if obs.shape != (self._nx,):  # fail in the caller, not the dispatcher
            raise ValueError(f"obs shape {obs.shape} != ({self._nx},)")
        req = _Request(slot, obs, threading.Event(), {})
        # The closed-check and the enqueue are one atomic step vs close():
        # either this request precedes the shutdown sentinel in the queue (and
        # is served/failed by the dispatcher) or close() won and we raise —
        # an unsynchronized check could enqueue after the dispatcher exited,
        # blocking this caller forever.
        with self._close_lock:
            if self._closed:
                raise RuntimeError("server is closed")
            self._queue.put(req)
        req.done.wait()
        if "error" in req.out:
            raise req.out["error"]
        return req.out["action"], req.out["diag"]

    def close(self) -> None:
        with self._close_lock:  # atomic vs step()'s check-then-enqueue
            self._closed = True
            self._queue.put(_SHUTDOWN)
        self._dispatcher.join()

    # -- dispatcher thread ---------------------------------------------------

    def _collect(self, block: bool) -> list[_Request] | None:
        """Gather a batch: first request (blocking or not), then drain arrivals
        for max_wait_ms. Returns None on shutdown, [] if non-blocking and idle."""
        try:
            first = self._queue.get() if block else self._queue.get_nowait()
        except queue.Empty:
            return []
        if first is _SHUTDOWN:
            return None
        batch = [first]
        seen = {first.slot}
        deferred: list[_Request] = []
        t_end = time.monotonic() + self._max_wait_s
        while len(batch) < self._tile:
            remaining = t_end - time.monotonic()
            if remaining <= 0:
                break
            try:
                req = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if req is _SHUTDOWN:
                self._queue.put(_SHUTDOWN)  # re-post for the outer loop
                break
            if req.slot in seen:
                # Duplicate-index device scatters have an unspecified winner,
                # so one batch never carries two requests for one slot: the
                # second defers to the next dispatch (its x_{k+1} depends on
                # the first's action anyway). Deferring — rather than breaking
                # the gather — keeps OTHER sessions' queued requests in this
                # dispatch (round-2 review: the early break cost throughput
                # under contention). Re-posted after the drain so the loop
                # cannot pick the same request up again and spin.
                deferred.append(req)
                continue
            seen.add(req.slot)
            batch.append(req)
        for req in deferred:
            self._queue.put(req)
        return batch

    def _launch(self, batch: list[_Request]):
        """Issue one dispatch (async on device) for `batch`; no host sync here.

        jax dispatch is asynchronous, so consecutive launches queue on the
        device back-to-back — the device never waits for the host-side result
        fetch of an earlier batch.
        """
        # _collect guarantees slot-uniqueness within a batch.
        n = len(batch)
        slots = np.full(self._tile, self._tile, np.int32)  # pad = dropped
        slots[:n] = [r.slot for r in batch]
        obs_new = np.zeros((self._tile, self._nx), np.float32)
        obs_new[:n] = [r.obs for r in batch]
        with self._lock:
            u, diag, self._states, self._obs = self._dispatch(
                self._consts, self._gp, self._states, self._obs,
                jnp.asarray(slots), jnp.asarray(obs_new),
            )
        return batch, slots[:n], u, diag

    def _deliver(self, batch: list[_Request], slots: np.ndarray, u, diag) -> None:
        """Fetch a dispatched batch's actions and wake its waiters.

        Runs on the fetch pool: device->host fetch latency dominates per-batch
        cost on remote-attached TPUs (~25 ms through the tunnel vs ~3 ms of
        device compute, measured), so concurrent fetches of pipelined batches
        overlap their round-trips instead of serializing behind one another.
        """
        try:
            actions_full, diag_full = jax.device_get((u, diag))
            actions, diags = actions_full[slots], diag_full[slots]
            with self._stats_lock:
                self._n_requests += len(batch)
                self._n_batches += 1
            if self._record:
                # A transition (x_k, u_k, x_{k+1}) completes when the SAME
                # session's next observation arrives; per-slot ordering is
                # guaranteed by the one-in-flight-request-per-session contract.
                with self._record_lock:
                    for req, a in zip(batch, actions):
                        prev = self._pending_rec.get(req.slot)
                        if prev is not None:
                            self._transitions.append((prev[0], prev[1], req.obs))
                        self._pending_rec[req.slot] = (req.obs, np.asarray(a))
            for req, a, d in zip(batch, actions, diags):
                req.out["action"] = a
                req.out["diag"] = {
                    name: (
                        int(v) if name in _DIAG_INT
                        else bool(v) if name in _DIAG_BOOL
                        else float(v)
                    )
                    for name, v in zip(DIAG_FIELDS, d)
                }
                req.done.set()
        except Exception as e:  # surface device errors to every waiter
            for req in batch:
                req.out["error"] = e
                req.done.set()

    def _run(self) -> None:
        inflight: deque = deque()
        stop = False
        while True:
            # Keep up to `pipeline_depth` batches in flight: the device (and
            # the fetch pool) stay busy while clients of delivered batches
            # compute their next observation.
            while not stop and len(inflight) < self._pipeline_depth:
                batch = self._collect(block=not inflight and not stop)
                if batch is None:
                    stop = True
                elif not batch:
                    break
                else:
                    try:
                        launched = self._launch(batch)
                    except Exception as e:  # fail the batch, keep serving
                        for req in batch:
                            req.out["error"] = e
                            req.done.set()
                        continue
                    inflight.append(self._fetch_pool.submit(self._deliver, *launched))
            if not inflight:
                if stop:
                    self._fetch_pool.shutdown(wait=True)
                    # Fail any requests that raced past the closed-flag check —
                    # a silent drop would block their step() callers forever.
                    while True:
                        try:
                            req = self._queue.get_nowait()
                        except queue.Empty:
                            return
                        if req is not _SHUTDOWN:
                            req.out["error"] = RuntimeError("server is closed")
                            req.done.set()
                continue
            inflight.popleft().result()
