"""Multi-seed GP-MPC learning evaluation: S independent learning runs on-device.

Statistical counterpart of scripts/run_gp_mpc.py: where the reference driver
(and its ancestor, /root/reference/scripts/run_gp_mpc.py) evaluates learning on
ONE seed per process, this script runs S full learning cycles (collect ->
sample -> accumulate -> GP refit -> held-out eval) in parallel as vmapped jitted
programs (gpmpc_tpu/parallel/sweep.py) and reports the learning curve as a
mean +/- std band across seeds, with per-seed improvement statistics.

Artifacts (in <save_dir>): learning_curve_seeds.png/csv.

Usage:
  python scripts/eval_seeds.py [--platform cpu|axon] [--seeds 16] [--epochs 3]
                               [--steps 160] [--fast]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None, help="jax platform override (cpu for local)")
    p.add_argument("--config", default=str(Path(__file__).parent / "gp_mpc_config.yaml"))
    p.add_argument("--seeds", type=int, default=16, help="number of parallel learning runs")
    p.add_argument("--epochs", type=int, default=None, help="override run.num_epochs")
    p.add_argument("--steps", type=int, default=None, help="override episode length")
    p.add_argument("--master-seed", type=int, default=None, help="override config seed")
    p.add_argument("--fast", action="store_true", help="tiny shapes (smoke run)")
    p.add_argument(
        "--backend", default="auto", choices=["auto", "lanes", "xla"],
        help="controller-step backend for every episode: 'lanes' packs the QP "
        "and tightening into the Pallas lane kernels (per-seed GP algebra runs "
        "vmapped under XLA); 'auto' picks lanes on TPU",
    )
    return p.parse_args()


def main():
    args = parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from gpmpc_tpu.config import load_config
    from gpmpc_tpu.control.gpmpc import GPMPC
    from gpmpc_tpu.envs.drone import DroneFigureEightEnv
    from gpmpc_tpu.models.symbolic import symbolic_attitude
    from gpmpc_tpu.parallel.sweep import seed_sweep
    from gpmpc_tpu.utils.plotting import plot_learning_curve_band

    config = load_config(args.config)
    g = config.gpmpc
    n_epochs = config.run.num_epochs if args.epochs is None else args.epochs
    samples = config.train.samples_per_epoch
    gp_iters = config.train.iterations if not args.fast else 50
    gp_lr = config.train.lr if not args.fast else 0.05
    master_seed = config.seed if args.master_seed is None else args.master_seed

    env = DroneFigureEightEnv()
    n_steps = env.p.n_steps if not args.fast else 60
    if args.steps is not None:
        n_steps = args.steps

    model = symbolic_attitude(dt=0.02, params=g.prior_params)
    cap = n_epochs * samples
    ctrl = GPMPC(
        model, env.trajectory, g.prior_params, horizon=g.horizon,
        q_mpc=g.q_mpc, r_mpc=g.r_mpc, sparse_gp=g.sparse_gp, prob=g.prob,
        max_gp_samples=g.max_gp_samples, seed=master_seed,
        max_gp_points=max(cap, 1), sqp_iters=g.sqp_iters, qp_iters=g.qp_iters,
        soft_constraints=g.soft_constraints,
    )

    backend = args.backend
    if backend == "auto":
        backend = "lanes" if jax.default_backend() == "tpu" else "xla"
    print(f"seed sweep: {args.seeds} seeds x {n_epochs} epochs x {n_steps} steps "
          f"({samples} samples/epoch, {gp_iters} GP iters, backend={backend})")
    t0 = time.perf_counter()
    res = seed_sweep(
        model, ctrl.cfg, env.p, ctrl.consts, g.prior_params,
        n_seeds=args.seeds, n_epochs=n_epochs, n_steps=n_steps,
        samples_per_epoch=samples,
        max_inducing=g.max_gp_samples if g.sparse_gp else cap,
        sparse=g.sparse_gp, gp_iters=gp_iters, gp_lr=gp_lr,
        master_seed=master_seed, backend=backend,
    )
    costs = np.asarray(jax.device_get(res.costs))  # (n_epochs+1, S)
    wall = time.perf_counter() - t0
    episodes = args.seeds * (2 * n_epochs + 1)  # collect + eval per epoch, + baseline
    print(f"done in {wall:.1f} s ({episodes} episodes, "
          f"{episodes * n_steps / wall:.0f} closed-loop GP-MPC steps/s incl. GP refits)")

    rmse = np.sqrt(costs / n_steps)  # per-step position RMSE, interpretable units
    print("\nepoch | tracking RMSE [m]: mean +/- std (min .. max over seeds)")
    for e in range(costs.shape[0]):
        r = rmse[e]
        tag = "prior" if e == 0 else f"  {e:3d}"
        print(f" {tag} | {r.mean():.4f} +/- {r.std():.4f} ({r.min():.4f} .. {r.max():.4f})")

    improved = rmse[-1] < rmse[0]
    reduction = 1.0 - rmse[-1] / rmse[0]
    print(f"\nseeds improved over prior: {improved.sum()}/{args.seeds} "
          f"(mean RMSE reduction {100 * reduction.mean():.1f}%)")

    save_dir = Path(config.save_dir)
    plot_learning_curve_band(costs, np.asarray(res.n_points),
                             "learning_curve_seeds", save_dir)
    print(f"artifacts: {save_dir}/learning_curve_seeds.png/.csv")


if __name__ == "__main__":
    main()
