"""Plotting / telemetry surface.

Re-implements the observability layer of the reference (/root/reference/gpmpc/
plotting.py:10-228): per-epoch runtime statistics (first step dropped), runtime
plot + CSV, per-state/per-input trajectory overlays across epochs, learning curves,
XY/XZ/YZ path plots, and the orchestrators `make_quad_plots` / `plot_quad_eval`.
Output filenames match the reference (runtime.png/csv, x{i}.png, u{i}.png,
xyz_path.png, state_trajectories.png) so downstream tooling is drop-in.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib.ticker import FormatStrFormatter  # noqa: E402

# Canonical 12-state label list (≙ plotting.py:198-211) — single source of truth.
from gpmpc_tpu.models.quadrotor import STATE_LABELS  # noqa: E402


def get_runtime(test_runs: dict, train_runs: dict) -> dict:
    """Mean/std/max of per-step inference time per epoch, first (warm-up) step
    dropped. ≙ plotting.py:10-37."""
    num_epochs = len(train_runs)
    mean_rt, std_rt, max_rt = (np.zeros(num_epochs) for _ in range(3))
    n_samples = []
    for epoch in range(num_epochs):
        n_samples.append(len(train_runs[epoch]))
        runtime = np.asarray(test_runs[epoch]["inference_time_data"][1:])
        mean_rt[epoch] = runtime.mean()
        std_rt[epoch] = runtime.std()
        max_rt[epoch] = runtime.max()
    return {"mean": mean_rt, "std": std_rt, "max": max_rt, "num_train_samples": n_samples}


def plot_runtime(runtime: dict, num_points_per_epoch, save_dir: Path):
    """≙ plotting.py:40-62 (runtime.png + runtime.csv)."""
    mean_rt, std_rt, max_rt = runtime["mean"], runtime["std"], runtime["max"]
    plt.plot(num_points_per_epoch, mean_rt, label="mean")
    plt.fill_between(
        num_points_per_epoch, mean_rt - std_rt, mean_rt + std_rt, alpha=0.3, label="1-std"
    )
    plt.plot(num_points_per_epoch, max_rt, label="max", color="r")
    plt.legend()
    plt.xlabel("Train Steps")
    plt.ylabel("Runtime (s) ")
    plt.savefig(save_dir / "runtime.png")
    plt.cla()
    plt.clf()
    data = np.vstack((num_points_per_epoch, mean_rt, std_rt, max_rt)).T
    np.savetxt(save_dir / "runtime.csv", data, delimiter=",", header="Train Steps, Mean, Std, Max")


def plot_runs(all_runs, num_epochs, ind=0, ylabel="x position", save_dir=None, traj=None):
    """Per-state trajectory overlays across epochs. ≙ plotting.py:65-86."""
    if traj is not None:
        plt.plot(traj[:, ind], label="Reference", color="gray", linestyle="--")
    plt.plot(all_runs[0]["obs"][:, ind], label="prior MPC")
    for epoch in range(1, num_epochs):
        plt.plot(all_runs[epoch]["obs"][:, ind], label=f"GP-MPC {epoch}")
    plt.title(ylabel)
    plt.xlabel("Step")
    plt.ylabel(ylabel)
    plt.legend()
    if save_dir is not None:
        plt.savefig(save_dir / f"x{ind}.png")
    else:
        plt.show()
    plt.cla()
    plt.clf()


def plot_runs_input(all_runs, num_epochs, ind=0, ylabel="input", save_dir=None):
    """Per-input overlays. ≙ plotting.py:89-104."""
    plt.plot(all_runs[0]["action"][:, ind], label="prior MPC")
    for epoch in range(1, num_epochs):
        plt.plot(all_runs[epoch]["action"][:, ind], label=f"GP-MPC {epoch}")
    plt.title(ylabel)
    plt.xlabel("Step")
    plt.ylabel(ylabel)
    plt.legend()
    if save_dir is not None:
        plt.savefig(save_dir / f"u{ind}.png")
    else:
        plt.show()
    plt.clf()


def plot_learning_curve(avg_rewards, num_points_per_epoch, stem, save_dir: Path):
    """≙ plotting.py:107-118."""
    rewards = np.asarray(avg_rewards)
    plt.plot(num_points_per_epoch, rewards)
    plt.title("Avg Episode" + stem)
    plt.xlabel("Training Steps")
    plt.ylabel(stem)
    plt.savefig(save_dir / (stem + ".png"))
    plt.cla()
    plt.clf()
    data = np.vstack((num_points_per_epoch, rewards)).T
    np.savetxt(save_dir / (stem + ".csv"), data, delimiter=",", header="Train steps,Cost")


def plot_xyz_trajectory(runs, ref, save_dir: Path):
    """XY / XZ / YZ path overlays. ≙ plotting.py:121-155."""
    num_epochs = len(runs)
    fig, ax = plt.subplots(3, 1)
    planes = [(0, 2, "X-Y plane path", "X [m]", "Y [m]"),
              (0, 4, "X-Z plane path", "X [m]", "Z [m]"),
              (2, 4, "Y-Z plane path", "Y [m]", "Z [m]")]
    for a, (i, j, title, xl, yl) in zip(ax, planes):
        a.plot(ref[:, i], ref[:, j], label="Reference", color="gray", linestyle="--")
        a.plot(runs[0]["obs"][:, i], runs[0]["obs"][:, j], label="prior MPC")
        for epoch in range(1, num_epochs):
            a.plot(runs[epoch]["obs"][:, i], runs[epoch]["obs"][:, j], label=f"GP-MPC {epoch}")
        a.set_title(title)
        a.set_xlabel(xl)
        a.set_ylabel(yl)
        a.legend()
    fig.savefig(save_dir / "xyz_path.png")
    plt.cla()
    plt.clf()
    plt.close(fig)


def make_quad_plots(test_runs, train_runs, trajectory, save_dir: Path):
    """Epoch-comparison plot bundle. ≙ plotting.py:158-181."""
    num_steps, nx = test_runs[0]["obs"].shape
    nu = test_runs[0]["action"].shape[1]
    trajectory = trajectory[:num_steps, :]
    num_epochs = len(test_runs)
    fig_dir = Path(save_dir) / "figs"
    fig_dir.mkdir(parents=True, exist_ok=False)
    plot_xyz_trajectory(test_runs, trajectory, fig_dir)
    for ind in range(nx):
        plot_runs(test_runs, num_epochs, ind=ind, ylabel=f"x{ind}", save_dir=fig_dir, traj=trajectory)
    for ind in range(nu):
        plot_runs_input(test_runs, num_epochs, ind=ind, ylabel=f"u{ind}", save_dir=fig_dir)
    num_points_per_epoch = [0]
    num_points = 0
    for epoch in range(1, num_epochs):
        num_points += train_runs[epoch]["obs"].shape[0]
        num_points_per_epoch.append(num_points)
    runtime_result = get_runtime(test_runs, train_runs)
    plot_runtime(runtime_result, num_points_per_epoch, fig_dir)


def plot_quad_eval(trajectories, reference, dt: float, save_path: Path):
    """Final-eval state trajectory panel. ≙ plotting.py:184-228."""
    state_stack = np.asarray(trajectories["obs"])
    input_stack = np.asarray(trajectories["action"])
    nx = state_stack.shape[1]
    reference = np.asarray(reference)
    if reference.shape[0] != nx:  # accept (N, nx) too
        reference = reference.T

    plot_length = min(input_stack.shape[0], state_stack.shape[0])
    times = np.linspace(0, dt * plot_length, plot_length)
    assert len(STATE_LABELS) == nx

    fig, axs = plt.subplots(nx, figsize=(8, nx * 1))
    for k in range(nx):
        axs[k].plot(times, state_stack.T[k, :plot_length], label="actual")
        ref_row = reference[k, :plot_length]
        if ref_row.shape[0] < plot_length:  # wrap the periodic reference
            reps = int(np.ceil(plot_length / reference.shape[1]))
            ref_row = np.tile(reference[k], reps)[:plot_length]
        axs[k].plot(times, ref_row, color="r", label="desired")
        axs[k].set(ylabel=STATE_LABELS[k])
        axs[k].yaxis.set_major_formatter(FormatStrFormatter("%.1f"))
        if k != nx - 1:
            axs[k].set_xticks([])
    axs[0].set_title("State Trajectories")
    axs[-1].legend(ncol=3, bbox_transform=fig.transFigure, bbox_to_anchor=(1, 0), loc="lower right")
    axs[-1].set(xlabel="time (sec)")
    fig.tight_layout()
    plt.savefig(Path(save_path) / "state_trajectories.png")
    plt.close(fig)
