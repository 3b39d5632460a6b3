"""Decompose the headline closed-loop GP-MPC step into its device-time parts.

The round-4 verdict's top item: the single-chip headline has sat at 88-92k
solves/s for three rounds while docs/ROOFLINE.md estimates the kernel at
~10-20% of VPU speed-of-light. Before touching the kernel, this script answers
*where the 11-12 ms per batched step actually goes* on real TPU:

  step        full closed-loop step (controller + plant), the bench.py program
  prepare     batched_prepare_step: GP variances + lane-packed tightening
  sqp         the fused SQP solve alone (linearize+QP kernels, early-exit loop)
  qp1         ONE resident QP kernel launch (solve_ocp_qp_lanes, warm iterate)
  lin1        ONE linearize kernel launch (linearize_ocp_lanes)
  env         vmapped plant integration alone

All segments are data-chained (each call's input depends on the previous
call's output) and closed with a `jax.device_get` barrier —
`block_until_ready` is a no-op through the axon tunnel (docs/ROOFLINE.md).

Prints one JSON line per segment: {"segment", "ms_per_call", "calls"}.
Results recorded in docs/EXPERIMENTS_r5.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    try:
        if jax.default_backend() != "cpu":
            jax.config.update(
                "jax_compilation_cache_dir",
                str(Path(__file__).resolve().parents[1] / ".jax_cache"),
            )
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from gpmpc_tpu.control import gpmpc as gpmpc_mod
    from gpmpc_tpu.control import mpc as mpc_mod
    from gpmpc_tpu.control.gpmpc import GPMPC
    from gpmpc_tpu.envs import drone
    from gpmpc_tpu.envs.drone import DroneFigureEightEnv
    from gpmpc_tpu.models.symbolic import symbolic_attitude
    from gpmpc_tpu.ops import sqp_lanes as sqp_lanes_mod
    from gpmpc_tpu.parallel.batch import batched_gpmpc_step
    from gpmpc_tpu.utils.benchkit import (
        Q_MPC, R_MPC, reference_prior_dict, synthetic_gp_model,
    )

    B = int(os.environ.get("BENCH_BATCH", "1024"))
    horizon = int(os.environ.get("BENCH_HORIZON", "25"))
    n_calls = int(os.environ.get("BENCH_CALLS", "30"))

    prior_params = reference_prior_dict()
    env = DroneFigureEightEnv()
    model = symbolic_attitude(dt=0.02, params=prior_params)
    ctrl = GPMPC(
        model, env.trajectory, prior_params, horizon=horizon, q_mpc=Q_MPC,
        r_mpc=R_MPC, sparse_gp=True, prob=0.95, max_gp_samples=40, seed=1,
        max_gp_points=128, sqp_iters=6, qp_iters=10,
    )
    gp = synthetic_gp_model(max_points=128, max_inducing=40, n_data=128, n_train=50)
    ctrl.cfg = ctrl.cfg._replace(
        qp_tol=1e-7, kernel_linearize=True, qp_mehrotra=True
    )
    cfg = ctrl.cfg
    consts = ctrl.consts
    env_p = env.p

    def closed_loop_step(env_states, ctrl_states, obs):
        u, ctrl_states, _ = batched_gpmpc_step(
            model, cfg, consts, gp, ctrl_states, obs, backend="lanes"
        )
        env_states, obs, _, _, _ = jax.vmap(
            lambda s, a: drone.env_step(env_p, s, a)
        )(env_states, u)
        return env_states, ctrl_states, obs, u

    step = jax.jit(closed_loop_step)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    env_states, obs = jax.vmap(lambda k: drone.env_reset(env_p, k))(keys)
    ctrl_states = jax.vmap(
        lambda _: mpc_mod.init_state(horizon, model.nx, model.nu)
    )(jnp.arange(B))

    def progress(msg):
        print(f"[breakdown] {msg}", file=sys.stderr, flush=True)

    progress("warmup (compile + 3 steps into warm-started regime)")
    for _ in range(3):
        env_states, ctrl_states, obs, u = step(env_states, ctrl_states, obs)
    jax.device_get(u)

    def emit(segment, ms, calls):
        print(json.dumps({
            "segment": segment, "ms_per_call": round(ms, 4), "calls": calls,
        }), flush=True)

    # ---- A) full closed-loop step ----
    progress("timing: step")
    t0 = time.perf_counter()
    es, cs, ob = env_states, ctrl_states, obs
    for _ in range(n_calls):
        es, cs, ob, u = step(es, cs, ob)
    jax.device_get(u)
    emit("step", (time.perf_counter() - t0) / n_calls * 1e3, n_calls)

    # ---- B) prepare (GP variances + tightening + bounds) ----
    soft = cfg.soft_x_penalty is not None

    @jax.jit
    def prep(states, obs):
        xref, bounds, X_init, U_init, clamp = gpmpc_mod.batched_prepare_step(
            model, consts, gp, states, obs, soft=soft
        )
        # chain: returned obs depends on this call's output (all inside jit —
        # eager ops through the axon tunnel cost a ~25 ms RTT each)
        return xref, bounds, X_init, U_init, obs + 0.0 * X_init[:, 0]

    progress("timing: prepare")
    xref, bounds, X_init, U_init, ob = prep(ctrl_states, obs)
    jax.device_get(X_init[0, 0])
    t0 = time.perf_counter()
    for _ in range(n_calls):
        xref, bounds, X_init, U_init, ob = prep(ctrl_states, ob)
    jax.device_get(X_init[0, 0])
    emit("prepare", (time.perf_counter() - t0) / n_calls * 1e3, n_calls)

    # ---- C) fused SQP solve alone (realistic warm inputs from the loop) ----
    spec = gpmpc_mod.model_spec(model)
    params8 = spec.kernel_params(model.params)
    ell = jax.nn.softplus(gp.hypers.raw_lengthscale)
    sf2 = jax.nn.softplus(gp.hypers.raw_outputscale)
    G, D = gp.Zs.shape[0], gp.Zs.shape[-1]
    inv_ell2 = jnp.broadcast_to((1.0 / (ell * ell)).reshape(G, -1), (G, D))
    lin = sqp_lanes_mod.LanesLinearizer(
        params8=params8,
        hyp=jnp.concatenate([sf2[:, None], inv_ell2], axis=1),
        Zs=gp.Zs, alpha=gp.alpha_s, use_gp=True, family=spec.name,
    )
    c = consts.mpc
    cost = mpc_mod.OcpCost(xref=xref, uref=c.uref, Q=c.Q, R=c.R, Qe=c.Q, scale=c.scale)

    @jax.jit
    def sqp_only(x0, X_init, U_init):
        sol = sqp_lanes_mod.sqp_solve_batch_lanes_fused(
            lin, model.dt, cost, bounds, x0, X_init, U_init, cfg
        )
        return sol.X, sol.U, x0 + 0.0 * sol.X[:, 0]

    progress("timing: sqp")
    Xs, Us, x0 = sqp_only(obs, X_init, U_init)
    jax.device_get(Us[0, 0])
    t0 = time.perf_counter()
    for _ in range(n_calls):
        Xs, Us, x0 = sqp_only(x0, X_init, U_init)
    jax.device_get(Us[0, 0])
    emit("sqp", (time.perf_counter() - t0) / n_calls * 1e3, n_calls)

    # ---- D/E) single QP + single linearize kernel launches on one tile ----
    from gpmpc_tpu.ops.boxqp import BOUND_INF
    from gpmpc_tpu.ops.pallas_linearize import linearize_ocp_lanes
    from gpmpc_tpu.ops.pallas_ocp import LanesQp, solve_ocp_qp_lanes

    lanes = sqp_lanes_mod.LANES
    n_tiles = B // lanes
    pack = lambda x: sqp_lanes_mod._to_lane_tiles(x, n_tiles, lanes)
    X_l = pack(X_init)[0]  # first tile: (T+1, nx, L)
    U_l = pack(U_init)[0]
    xref_l = pack(xref)[0]
    lx_l, ux_l = pack(bounds.lx)[0], pack(bounds.ux)[0]
    lu_l, uu_l = pack(bounds.lu)[0], pack(bounds.uu)[0]
    q_diag = jnp.diagonal(c.Q)
    r_diag = jnp.diagonal(c.R)
    scale = c.scale
    qdiag = jnp.concatenate(
        [scale[:-1, None] * q_diag[None], (scale[-1] * jnp.diagonal(c.Q))[None]],
        axis=0,
    )
    qdiag_l = jnp.broadcast_to(qdiag[:, :, None], (horizon + 1, model.nx, lanes))
    rdiag_l = jnp.broadcast_to(
        (scale[:-1, None] * r_diag[None])[:, :, None], (horizon, model.nu, lanes)
    )
    uref_l = jnp.broadcast_to(c.uref[:, :, None], (horizon, model.nu, lanes))
    big = jnp.asarray(BOUND_INF, jnp.float32)

    @jax.jit
    def lin1(X, U):
        fnext, A, Bm = linearize_ocp_lanes(
            lin.params8, lin.hyp, lin.Zs, lin.alpha, X, U,
            dt=model.dt, use_gp=True, family=lin.family,
        )
        Xn = X + 0.0 * jnp.concatenate([fnext[:1], fnext], axis=0)
        return fnext, A, Bm, Xn

    progress("timing: lin1")
    fnext, A_l, B_l, Xc = lin1(X_l, U_l)
    jax.device_get(fnext[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(n_calls):
        fnext, A_l, B_l, Xc = lin1(Xc, U_l)
    jax.device_get(fnext[0, 0, 0])
    emit("lin1", (time.perf_counter() - t0) / n_calls * 1e3, n_calls)

    defect = fnext - X_l[1:]
    qx = qdiag_l * (X_l - xref_l)
    ru = rdiag_l * (U_l - uref_l)
    qp = LanesQp(
        A=A_l, B=B_l, r=defect, qdiag=qdiag_l, qx=qx, rdiag=rdiag_l, ru=ru,
        lx=(lx_l - X_l).at[0].set(-big), ux=(ux_l - X_l).at[0].set(big),
        lu=lu_l - U_l, uu=uu_l - U_l,
    )

    @jax.jit
    def qp1(qp):
        dx, du, gap = solve_ocp_qp_lanes(
            qp, n_ip=cfg.qp_iters, adaptive_tol=cfg.qp_tol, mehrotra=cfg.qp_mehrotra,
            soft_rho=cfg.soft_x_penalty,
        )
        return dx, du, gap, qp._replace(qx=qp.qx + 0.0 * dx)

    progress("timing: qp1 (warm-started iterate: adaptive exit active)")
    dx, du, gap, qpc = qp1(qp)
    jax.device_get(gap[0])
    t0 = time.perf_counter()
    for _ in range(n_calls):
        dx, du, gap, qpc = qp1(qpc)
    jax.device_get(gap[0])
    emit("qp1_warm", (time.perf_counter() - t0) / n_calls * 1e3, n_calls)

    # Cold iterate: bounds far from the solution (first SQP iteration shape).
    qp_cold = qp._replace(qx=qx * 0 + 1.0)
    progress("timing: qp1 cold")
    dx, du, gap, qpc = qp1(qp_cold)
    jax.device_get(gap[0])
    t0 = time.perf_counter()
    for _ in range(n_calls):
        dx, du, gap, qpc = qp1(qpc)
    jax.device_get(gap[0])
    emit("qp1_cold", (time.perf_counter() - t0) / n_calls * 1e3, n_calls)

    # ---- F) env step alone ----
    @jax.jit
    def env_only(env_states, u):
        env_states, obs, _, _, _ = jax.vmap(
            lambda s, a: drone.env_step(env_p, s, a)
        )(env_states, u)
        return env_states, obs, u + 0.0 * obs[:, :4]

    progress("timing: env")
    es2, ob2, uu2 = env_only(env_states, u)
    jax.device_get(ob2[0, 0])
    t0 = time.perf_counter()
    for _ in range(n_calls):
        es2, ob2, uu2 = env_only(es2, uu2)
    jax.device_get(ob2[0, 0])
    emit("env", (time.perf_counter() - t0) / n_calls * 1e3, n_calls)


if __name__ == "__main__":
    main()
