"""Multi-host / multi-chip scale-out driver (BASELINE config 5: 64k scenarios).

Shards a large scenario batch over every available device (ICI within a slice,
DCN across hosts after `jax.distributed.initialize`) and runs closed-loop GP-MPC
steps; per-device work is the lane-packed Pallas solve, cross-device reductions
(mean tracking error, aggregate solves/s) ride XLA collectives.

Run modes:
  * real TPU slice, multi-host:   python scripts/run_multihost.py --distributed
  * real TPU, single host:        python scripts/run_multihost.py
  * local validation (no TPU):    python scripts/run_multihost.py --virtual 8 \
                                      --scenarios 64 --steps 2 --backend xla

The driver's `__graft_entry__.dryrun_multichip` exercises the same sharded path
in CI; this script is the operational entry point.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenarios", type=int, default=65536)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--backend", default="lanes", choices=["lanes", "xla"])
    ap.add_argument("--horizon", type=int, default=25)
    ap.add_argument("--distributed", action="store_true", help="jax.distributed.initialize()")
    ap.add_argument("--virtual", type=int, default=0, help="force N virtual CPU devices")
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + f" --xla_force_host_platform_device_count={args.virtual}"
        )
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    if args.distributed:
        from gpmpc_tpu.parallel.mesh import init_distributed

        init_distributed()
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gpmpc_tpu.control import mpc as mpc_mod
    from gpmpc_tpu.control.gpmpc import GPMPC, pack_training_data, train_gp_models
    from gpmpc_tpu.envs import drone
    from gpmpc_tpu.envs.drone import DroneFigureEightEnv
    from gpmpc_tpu.models.symbolic import symbolic_attitude
    from gpmpc_tpu.parallel.batch import batched_gpmpc_step
    from gpmpc_tpu.parallel.mesh import make_mesh

    n_dev = len(jax.devices())
    B = args.scenarios - (args.scenarios % n_dev) or n_dev
    mesh = make_mesh(n_dev)
    shard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    from gpmpc_tpu.utils.benchkit import Q_MPC as q, R_MPC as r, reference_prior_dict, synthetic_gp_model

    prior = reference_prior_dict()
    env = DroneFigureEightEnv()
    model = symbolic_attitude(dt=0.02, params=prior)
    ctrl = GPMPC(model, env.trajectory, prior, horizon=args.horizon, q_mpc=q, r_mpc=r,
                 sparse_gp=True, max_gp_samples=40, seed=1, max_gp_points=128,
                 sqp_iters=6, qp_iters=10)
    gp = synthetic_gp_model(max_points=128, max_inducing=40, n_train=20)

    env_p = env.p
    traj = env.trajectory

    def closed_loop(consts, gpm, env_states, ctrl_states, obs):
        u, ctrl_states, _ = batched_gpmpc_step(
            model, ctrl.cfg, consts, gpm, ctrl_states, obs, backend=args.backend
        )
        env_states, obs, _, _, _ = jax.vmap(lambda s, a: drone.env_step(env_p, s, a))(env_states, u)
        # Cross-device reduction over the sharded scenario axis (ICI/DCN collective).
        ref = traj[jnp.mod(ctrl_states.traj_step[0], traj.shape[0])]
        err = jnp.sqrt((obs[:, 0] - ref[0]) ** 2 + (obs[:, 2] - ref[2]) ** 2 + (obs[:, 4] - ref[4]) ** 2)
        return env_states, ctrl_states, obs, jnp.mean(err)

    step = jax.jit(
        closed_loop,
        in_shardings=(repl, repl, shard, shard, shard),
        out_shardings=(shard, shard, shard, repl),
    )

    keys = jax.random.split(jax.random.PRNGKey(1), B)
    env_states, obs = jax.vmap(lambda k: drone.env_reset(env_p, k))(keys)
    ctrl_states = jax.vmap(lambda _: mpc_mod.init_state(args.horizon, 12, 4))(jnp.arange(B))
    env_states = jax.device_put(env_states, shard)
    ctrl_states = jax.device_put(ctrl_states, shard)
    obs = jax.device_put(obs, shard)

    for _ in range(2):
        env_states, ctrl_states, obs, err = step(ctrl.consts, gp, env_states, ctrl_states, obs)
    err.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        env_states, ctrl_states, obs, err = step(ctrl.consts, gp, env_states, ctrl_states, obs)
    err.block_until_ready()
    dt = time.perf_counter() - t0
    sps = B * args.steps / dt
    print(json.dumps({
        "metric": f"solves_per_sec[multihost_{n_dev}dev_B{B}_{args.backend}]",
        "value": round(sps, 1), "unit": "solves/s",
        "vs_baseline": round(sps / 1e4, 4),
        "mean_tracking_err_m": round(float(err), 4),
    }))


if __name__ == "__main__":
    main()
