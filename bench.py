"""Headline benchmark: GP-MPC solves/sec on one chip.

Runs the full per-step GP-MPC pipeline (chance-constraint covariance propagation +
residual-GP-augmented SQP with interior-point QPs) for a batch of scenarios as one
jitted program, and reports aggregate solves/sec.

Problem size matches the reference default config (SURVEY.md §6): horizon T=25,
nx=12, nu=4, 3 GPs with 40 FITC inducing points. The reference publishes no
numbers (BASELINE.md); vs_baseline is measured against this project's north-star
target of 1e4 solves/s aggregate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

NORTH_STAR = 1.0e4  # solves/s, BASELINE.json north_star

_T0 = time.perf_counter()


def _progress(msg: str):
    """Phase progress to stderr: a timeout must leave diagnosable evidence
    (round-3 failure mode: the driver's run timed out in remote compile with an
    empty tail — no way to tell importing from compiling from hanging)."""
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    _progress("importing jax")
    import jax

    # Honor JAX_PLATFORMS=cpu (the env var alone does not beat a
    # site-registered PJRT plugin): enables the CPU smoke test of this whole
    # script (tests/test_bench_smoke.py) at tiny sizes.
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # Decide from the ACTUAL backend, not the env request: a machine whose
    # default platform is CPU (no TPU plugin) must also skip the persistent
    # cache, or its host-specific XLA:CPU AOT entries corrupt the shared dir.
    on_cpu = jax.default_backend() == "cpu"

    # Persistent compilation cache: the remote-compile service behind the axon
    # tunnel can take minutes per new program; cache executables across runs.
    # NOT on the CPU backend: XLA:CPU AOT entries are host-feature-specific
    # and .jax_cache outlives the machine that wrote it.
    try:
        if on_cpu:
            raise RuntimeError("no persistent cache on cpu")
        cache_dir = str(Path(__file__).resolve().parent / ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        # Only cache slow-to-compile programs (the jitted closed-loop step —
        # minutes cold through the remote-compile tunnel, the round-3 timeout).
        # Trivial host-CPU programs must NOT land in the cache: XLA:CPU AOT
        # results are host-feature-specific and this directory persists across
        # rounds on different machines (observed: cpu_aot_loader feature-
        # mismatch warnings loading another box's entries).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from gpmpc_tpu.control import mpc as mpc_mod
    from gpmpc_tpu.control.gpmpc import GPMPC
    from gpmpc_tpu.envs.drone import DroneFigureEightEnv
    from gpmpc_tpu.models.symbolic import symbolic_attitude
    from gpmpc_tpu.parallel.batch import batched_gpmpc_step
    from gpmpc_tpu.utils.benchkit import Q_MPC, R_MPC, reference_prior_dict, synthetic_gp_model

    # Problem-size overrides (BASELINE configs): defaults are the reference
    # problem (T=25, 128-capacity GP, 40 FITC inducing). Config 4 ("2x horizon,
    # >=5k-point GP"): BENCH_HORIZON=50 BENCH_GP_POINTS=5120 BENCH_GP_INDUCING=128.
    horizon = int(os.environ.get("BENCH_HORIZON", "25"))
    gp_points = int(os.environ.get("BENCH_GP_POINTS", "128"))
    gp_inducing = int(os.environ.get("BENCH_GP_INDUCING", "40"))
    gp_data = int(os.environ.get("BENCH_GP_DATA", str(min(gp_points, 5000))))

    # BENCH_MODEL=cartpole|twolink benches the other families through the
    # identical pipeline (fused kernel-linearize lanes path included — the
    # family registry in ops/pallas_linearize.py); default is the reference's
    # quadrotor problem.
    bench_model = os.environ.get("BENCH_MODEL", "quadrotor")

    def build_problem():
      if bench_model == "twolink":
          from gpmpc_tpu.envs import twolink_env
          from gpmpc_tpu.models import twolink as twolink_mod
          from gpmpc_tpu.utils.benchkit import synthetic_twolink_gp_model

          env = twolink_env.TwoLinkTrackEnv(twolink_env.EnvParams.default())
          model = twolink_mod.symbolic_twolink(dt=0.02)
          ctrl = GPMPC(
              model, env.trajectory, None, horizon=horizon,
              q_mpc=[20.0, 20.0, 0.5, 0.5], r_mpc=[0.1, 0.1],
              sparse_gp=True, prob=0.95, max_gp_samples=gp_inducing, seed=1,
              max_gp_points=gp_points, sqp_iters=6, qp_iters=10, lm_reg=0.5,
              bounds=(twolink_mod.state_bounds(), twolink_mod.input_bounds()),
          )
          gp = synthetic_twolink_gp_model(
              max_points=gp_points, max_inducing=gp_inducing,
              n_data=min(gp_data, gp_points), n_train=50,
          )
          env_p = env.p
          env_step_fn = twolink_env.env_step
          env_reset_fn = twolink_env.env_reset
      elif bench_model == "cartpole":
          from gpmpc_tpu.envs import cartpole_env
          from gpmpc_tpu.models import cartpole as cartpole_mod
          from gpmpc_tpu.utils.benchkit import synthetic_cartpole_gp_model

          env = cartpole_env.CartpoleTrackEnv(cartpole_env.EnvParams.default())
          model = cartpole_mod.symbolic_cartpole(dt=0.02)
          ctrl = GPMPC(
              model, env.trajectory, None, horizon=horizon,
              q_mpc=[5.0, 0.1, 20.0, 0.5], r_mpc=[0.05],
              sparse_gp=True, prob=0.95, max_gp_samples=gp_inducing, seed=1,
              max_gp_points=gp_points, sqp_iters=6, qp_iters=10,
              bounds=(cartpole_mod.state_bounds(), cartpole_mod.input_bounds()),
          )
          gp = synthetic_cartpole_gp_model(
              max_points=gp_points, max_inducing=gp_inducing,
              n_data=min(gp_data, gp_points), n_train=50,
          )
          env_p = env.p
          env_step_fn = cartpole_env.env_step
          env_reset_fn = cartpole_env.env_reset
      else:
          prior_params = reference_prior_dict()
          env = DroneFigureEightEnv()
          model = symbolic_attitude(dt=0.02, params=prior_params)
          ctrl = GPMPC(
              model, env.trajectory, prior_params, horizon=horizon, q_mpc=Q_MPC, r_mpc=R_MPC,
              sparse_gp=True, prob=0.95, max_gp_samples=gp_inducing, seed=1,
              max_gp_points=gp_points, sqp_iters=6, qp_iters=10,
          )
          # Train the GPs on a synthetic residual dataset at the requested scale so
          # the bench exercises the real augmented dynamics + tightening path.
          gp = synthetic_gp_model(
              max_points=gp_points, max_inducing=gp_inducing,
              n_data=min(gp_data, gp_points), n_train=50,
          )
          from gpmpc_tpu.envs import drone

          env_p = env.p
          env_step_fn = drone.env_step
          env_reset_fn = drone.env_reset

      return env, model, ctrl, gp, env_p, env_step_fn, env_reset_fn

    env, model, ctrl, gp, env_p, env_step_fn, env_reset_fn = build_problem()

    # BENCH_REAL_GP=1: replace the synthetic GP with one trained from a REAL
    # prior-controller rollout — collection, preprocessing, and GP training
    # all run on the LOCAL CPU backend (a second controller instance built
    # under host_default_device), so the opt-in path adds zero remote-compile
    # programs or tunnel round-trips to the timed TPU window; the trained
    # model crosses over as numpy leaves.
    if os.environ.get("BENCH_REAL_GP", "0") == "1":
        _progress("BENCH_REAL_GP=1: prior rollout + GP training on host CPU")
        from gpmpc_tpu.utils.hostmath import host_default_device

        with host_default_device():
            env_c, model_c, ctrl_c, _, env_p_c, step_c, reset_c = build_problem()
            n_collect = int(os.environ.get("BENCH_REAL_GP_STEPS", "120"))
            key = jax.random.PRNGKey(7)
            st, ob = reset_c(env_p_c, key)
            X, U = [np.asarray(ob)], []
            for _ in range(n_collect):
                u = ctrl_c.prior_ctrl.select_action(np.asarray(ob))
                st, ob, _, _, _ = step_c(env_p_c, st, jnp.asarray(u))
                X.append(np.asarray(ob))
                U.append(u)
            xi, ti = ctrl_c.preprocess_data(
                np.asarray(X[:-1]), np.asarray(U), np.asarray(X[1:])
            )
            ctrl_c.train_gp(xi, ti, lr=0.05, iterations=100)
            gp = jax.tree.map(lambda l: np.asarray(l), ctrl_c.gp_model)
        # One push to the accelerator — numpy leaves would re-transfer on
        # every timed step otherwise.
        gp = jax.device_put(gp)
        _progress(f"BENCH_REAL_GP: trained on {len(U)} real transitions")
    # B=1024 is the measured single-chip throughput sweet spot (87.0k solves/s
    # vs 77.9k at B=512; B=4096 regresses slightly — HBM working set).
    B = int(os.environ.get("BENCH_BATCH", "1024"))
    # Default window: 60 steps at B=1024 ≈ 0.7 s of work — the ~27-50 ms fixed
    # device_get RTT of the axon tunnel (measured) stays ~4% of the window
    # (measured 91.6k solves/s at 60 steps vs 92.6k at 120 — converged).
    # Smaller batches keep the SAME window duration by scaling the step count
    # (B=256 at 60 steps is a 0.36 s window where the fixed RTT alone reads as
    # a ~10% throughput loss — measured 42.3k vs 48.9k at config 4).
    n_timed_steps = int(
        os.environ.get("BENCH_STEPS", str(max(60, (60 * 1024) // max(B, 1))))
    )
    backend = os.environ.get("BENCH_BACKEND", "lanes")  # lanes | xla
    # In-kernel adaptive IP exit (acados semantics: exit at tolerance, max_iter
    # as cap). Warm-started solves converge in 2-3 IP iterations and the kernel
    # predicates the rest away — measured 77.9k vs 38.1k solves/s at the
    # round-2 default config. Default gap tolerance is 1e-6 since round 5:
    # acados's own default NLP tolerances are 1e-6 and the reference never
    # overrides them (/root/reference/gpmpc/mpc.py:113-120 sets only max
    # iterations), and the measured closed-loop difference vs 1e-7 is
    # control RMSE 8.9e-6 / episode-cost delta 5.8e-6 (docs/EXPERIMENTS_r5.md
    # section 5) — 100x inside the 1e-3 parity bar — for +20% throughput
    # (165.4k vs 137.6k). BENCH_QP_TOL=0 disables (fixed iterations).
    qp_tol = os.environ.get("BENCH_QP_TOL", "1e-6")
    if qp_tol and float(qp_tol) > 0:
        ctrl.cfg = ctrl.cfg._replace(qp_tol=float(qp_tol))
    if os.environ.get("BENCH_KERNEL_LIN", "1") == "1":
        # In-kernel linearization: closed-form Jacobians inside a lanes Pallas
        # kernel; X/U stay in lanes layout across the SQP loop. Default-on:
        # measured 33.6k vs 30.8k solves/s at the default config (honest
        # device_get barrier), parity-locked by tests/test_pallas_linearize.py.
        ctrl.cfg = ctrl.cfg._replace(kernel_linearize=True)
    if os.environ.get("BENCH_MEHROTRA", "1") == "1":
        ctrl.cfg = ctrl.cfg._replace(qp_mehrotra=True)
    if os.environ.get("BENCH_PSCAN", "0") == "1":
        # O(log T) associative-scan Riccati inside the XLA backend's Newton
        # solves (ops/riccati_parallel.py) — the long-horizon candidate past
        # the lanes cap. Measurements: docs/EXPERIMENTS_r5.md §2.
        ctrl.cfg = ctrl.cfg._replace(parallel_scan=True)
    if os.environ.get("BENCH_WARM_SHIFT", "0") == "1":
        # RTI-style time-aligned warm start (ops/sqp.py SqpConfig.warm_shift).
        ctrl.cfg = ctrl.cfg._replace(warm_shift=True)
    if os.environ.get("BENCH_ANALYTIC_JAC", "0") == "1":
        # analytic dynamics Jacobians (models/jacobians.py). Measured SLOWER on
        # TPU at B=512 (19.9k vs 30.8k solves/s): the RK4 Jacobian chain's 12x12
        # matmuls hit XLA's batched-small-matmul weakness, while jacfwd's
        # elementwise tangents vectorize well. Kept for CPU/host paths.
        ctrl.cfg = ctrl.cfg._replace(analytic_jac=True)

    # Closed-loop step: controller solve + plant integration, so every timed
    # solve sees a genuinely new observation (honest steady-state MPC load —
    # with early-exit SQP, re-solving an unchanged problem would be free).
    var_backend = os.environ.get("BENCH_VAR_BACKEND", "auto")  # auto | pallas | xla
    var_bf16 = os.environ.get("BENCH_VAR_BF16", "0") == "1"

    def closed_loop_step(consts, gpm, env_states, ctrl_states, obs):
        u, ctrl_states, _ = batched_gpmpc_step(
            model, ctrl.cfg, consts, gpm, ctrl_states, obs, backend=backend,
            var_backend=var_backend, var_bf16=var_bf16,
        )
        env_states, obs, _, _, _ = jax.vmap(lambda s, a: env_step_fn(env_p, s, a))(
            env_states, u
        )
        return env_states, ctrl_states, obs, u

    # BENCH_FUSED=1: scan the whole timed window inside ONE jitted program
    # (a lax.scan of closed-loop steps, the batched_episode deployment shape).
    # Measured SLOWER than the chained Python loop (41.1k vs 91.6k solves/s at
    # B=1024, same trajectory steps), and a FULLY UNROLLED window — identical
    # HLO to the chained steps, zero loop machinery — is still ~2x slower
    # (36.2k vs 72.5k at an 8-step window): XLA schedules the monolithic
    # program worse than the runtime executes the chained small ones. Chained
    # host dispatch is the recommended deployment; this knob documents the
    # zero-host-involvement alternative. BENCH_FUSED_UNROLL=<n|full> controls
    # scan unrolling.
    fused = os.environ.get("BENCH_FUSED", "0") == "1"
    if fused:
        fused_unroll = os.environ.get("BENCH_FUSED_UNROLL", "1")
        unroll = True if fused_unroll == "full" else int(fused_unroll)

        def fused_window(consts, gpm, env_states, ctrl_states, obs, n):
            def body(carry, _):
                env_states, ctrl_states, obs = carry
                env_states, ctrl_states, obs, u = closed_loop_step(
                    consts, gpm, env_states, ctrl_states, obs
                )
                return (env_states, ctrl_states, obs), u[0, 0]

            (env_states, ctrl_states, obs), u_trace = jax.lax.scan(
                body, (env_states, ctrl_states, obs), None, length=n, unroll=unroll
            )
            return env_states, ctrl_states, obs, u_trace

        window = jax.jit(fused_window, static_argnames="n")

    step = jax.jit(closed_loop_step)

    _progress("building initial state (first small compiles through the tunnel)")
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    env_states, obs = jax.vmap(lambda k: env_reset_fn(env_p, k))(keys)
    ctrl_states = jax.vmap(
        lambda _: mpc_mod.init_state(horizon, model.nx, model.nu)
    )(jnp.arange(B))

    # Warm-up: compile + two steps (past the cold-start solve into the
    # warm-started tightening-active regime).
    _progress("compiling closed_loop_step (the big program; minutes cold, fast on cache hit)")
    # First fetch after ONE step, not two: the remote service can queue the
    # first executions behind other tenants for minutes (observed 0.6s-824s,
    # uncorrelated with local load) — barrier as early as possible so the
    # provisional number lands at the earliest instant the service allows.
    env_states, ctrl_states, obs, u = step(ctrl.consts, gp, env_states, ctrl_states, obs)
    _progress("closed_loop_step compiled; executing first step (service-queue wait shows here)")
    jax.device_get(u)
    _progress("first step done; second warmup step")
    env_states, ctrl_states, obs, u = step(ctrl.consts, gp, env_states, ctrl_states, obs)
    jax.device_get(u)
    _progress("warmup done; provisional window starts")

    def emit(sps, provisional=False):
        payload = {
            "metric": "gpmpc_solves_per_sec_1chip"
            + ("" if bench_model == "quadrotor" else f"_{bench_model}"),
            "value": round(sps, 2),
            "unit": "solves/s",
            "vs_baseline": round(sps / NORTH_STAR, 4),
        }
        if provisional:
            # Mechanical marker so a forward-scanning parser can distinguish
            # the noisier early-safety-net line from the final measurement.
            payload["provisional"] = True
        line = json.dumps(payload)
        print(line, flush=True)
        if provisional:
            _progress("provisional JSON emitted (superseded by the final line if it lands)")

    # Staged output (round-3 lesson): a short timed window FIRST, its JSON line
    # printed immediately — if tunnel congestion eats the rest of the budget,
    # the driver still captures an honest (slightly noisier) number. A
    # backward-scanning parser picks up the final line; a forward-scanning one
    # gets this conservative measurement. Both are real.
    # The provisional always uses the chained `step` program (already warmed
    # above) — BENCH_FUSED only changes the FINAL window, so fused runs keep
    # the early-number safety net too.
    prov_steps = int(os.environ.get("BENCH_PROV_STEPS", "8"))
    if prov_steps > 0:
        t0 = time.perf_counter()
        for _ in range(prov_steps):
            env_states, ctrl_states, obs, u = step(ctrl.consts, gp, env_states, ctrl_states, obs)
        jax.device_get(u)
        emit(B * prov_steps / (time.perf_counter() - t0), provisional=True)

    # Budget guard: if construction + compile already consumed the driver's
    # patience, stop here — the provisional line IS the result.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "480"))
    if time.perf_counter() - _T0 > budget_s:
        _progress(f"over budget ({budget_s:.0f}s); keeping provisional result")
        return
    _progress("timing window starts")

    # Timing barrier: device_get, NOT block_until_ready — under the remote
    # (axon) TPU tunnel block_until_ready returns immediately (measured: a 6 s
    # matmul chain "completes" in 0.1 ms), so only a device->host fetch of the
    # final step's output proves the whole data-chained sequence executed.
    if fused:
        # warm the scan program too, then time one fused window
        env_states, ctrl_states, obs, _ = window(
            ctrl.consts, gp, env_states, ctrl_states, obs, n_timed_steps
        )
        t0 = time.perf_counter()
        env_states, ctrl_states, obs, u_trace = window(
            ctrl.consts, gp, env_states, ctrl_states, obs, n_timed_steps
        )
        jax.device_get(u_trace)
        dt_total = time.perf_counter() - t0
    else:
        t0 = time.perf_counter()
        for _ in range(n_timed_steps):
            env_states, ctrl_states, obs, u = step(ctrl.consts, gp, env_states, ctrl_states, obs)
        jax.device_get(u)
        dt_total = time.perf_counter() - t0
    _progress(f"timing window done ({dt_total:.3f}s); printing result")

    emit(B * n_timed_steps / dt_total)


if __name__ == "__main__":
    main()
