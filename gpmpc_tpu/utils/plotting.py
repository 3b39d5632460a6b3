"""Plotting / telemetry surface.

Provides the observability layer that the reference keeps in
/root/reference/gpmpc/plotting.py (behavioral spec, not code source): per-epoch
runtime statistics with the warm-up step excluded, runtime plot + CSV, per-state
and per-input trajectory overlays across learning epochs, learning curves,
XY/XZ/YZ path projections, and the orchestrators `make_quad_plots` /
`plot_quad_eval`. Artifact filenames are kept identical (runtime.png/csv,
x{i}.png, u{i}.png, xyz_path.png, state_trajectories.png, <stem>.png/csv) so
downstream tooling is drop-in; the implementation is this repo's own — every
figure goes through the object-oriented matplotlib API via one `_new_figure`
helper, and the state/input/plane overlays share a single `_overlay_epochs`
routine instead of three hand-unrolled plot loops.
"""

from __future__ import annotations

from contextlib import contextmanager
from pathlib import Path

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib.ticker import FormatStrFormatter  # noqa: E402

# Canonical 12-state label list — single source of truth lives with the model.
from gpmpc_tpu.models.quadrotor import STATE_LABELS  # noqa: E402

# Label conventions shared by every epoch-overlay figure: epoch 0 is the prior
# (GP-free) controller, epochs >= 1 are successive GP-MPC retrainings.
_PRIOR_LABEL = "prior MPC"
_REF_STYLE = dict(label="Reference", color="gray", linestyle="--")


def _epoch_label(epoch: int) -> str:
    return _PRIOR_LABEL if epoch == 0 else f"GP-MPC {epoch}"


@contextmanager
def _new_figure(out_file: Path | None, **subplots_kw):
    """Yield (fig, ax); on exit, save to `out_file` (or show) and close.

    Keeps all figure lifecycle handling in one place — no global pyplot state.
    """
    fig, ax = plt.subplots(**subplots_kw)
    try:
        yield fig, ax
        if out_file is None:
            plt.show()
        else:
            fig.savefig(out_file)
    finally:
        plt.close(fig)


def _overlay_epochs(ax, runs, series_fn, **plot_kw):
    """Draw one line per epoch on `ax`; `series_fn(run) -> (x, y) | y`."""
    for epoch in range(len(runs)):
        series = series_fn(runs[epoch])
        xy = series if isinstance(series, tuple) else (series,)
        ax.plot(*xy, label=_epoch_label(epoch), **plot_kw)


def _write_csv(path: Path, header: str, *columns) -> None:
    np.savetxt(path, np.column_stack(columns), delimiter=",", header=header)


def get_runtime(test_runs: dict, train_runs: dict) -> dict:
    """Per-epoch inference-time stats (mean/std/max), warm-up step excluded.

    The first step of each test episode carries jit/solver warm-up cost, so it
    is dropped before computing statistics — same artifact semantics as the
    reference's runtime report.
    """
    stats = {"mean": [], "std": [], "max": [], "num_train_samples": []}
    for epoch in sorted(test_runs):
        steady = np.asarray(test_runs[epoch]["inference_time_data"])[1:]
        stats["mean"].append(steady.mean())
        stats["std"].append(steady.std())
        stats["max"].append(steady.max())
        stats["num_train_samples"].append(len(train_runs[epoch]))
    return {k: (np.asarray(v) if k != "num_train_samples" else v) for k, v in stats.items()}


def plot_runtime(runtime: dict, num_points_per_epoch, save_dir: Path):
    """runtime.png (mean ± std band, max) + runtime.csv vs. training-set size."""
    x = np.asarray(num_points_per_epoch)
    mean, std, peak = runtime["mean"], runtime["std"], runtime["max"]
    with _new_figure(save_dir / "runtime.png") as (fig, ax):
        ax.plot(x, mean, label="mean")
        ax.fill_between(x, mean - std, mean + std, alpha=0.3, label="1-std")
        ax.plot(x, peak, color="r", label="max")
        ax.set_xlabel("Train Steps")
        ax.set_ylabel("Runtime (s)")
        ax.legend()
    _write_csv(save_dir / "runtime.csv", "train_steps,mean,std,max", x, mean, std, peak)


def plot_runs(all_runs, num_epochs, ind=0, ylabel="x position", save_dir=None, traj=None):
    """Overlay state channel `ind` across epochs (plus the reference path)."""
    out = None if save_dir is None else save_dir / f"x{ind}.png"
    with _new_figure(out) as (fig, ax):
        if traj is not None:
            ax.plot(np.asarray(traj)[:, ind], **_REF_STYLE)
        _overlay_epochs(ax, [all_runs[e] for e in range(num_epochs)],
                        lambda run: np.asarray(run["obs"])[:, ind])
        ax.set(title=ylabel, xlabel="Step", ylabel=ylabel)
        ax.legend()


def plot_runs_input(all_runs, num_epochs, ind=0, ylabel="input", save_dir=None):
    """Overlay input channel `ind` across epochs."""
    out = None if save_dir is None else save_dir / f"u{ind}.png"
    with _new_figure(out) as (fig, ax):
        _overlay_epochs(ax, [all_runs[e] for e in range(num_epochs)],
                        lambda run: np.asarray(run["action"])[:, ind])
        ax.set(title=ylabel, xlabel="Step", ylabel=ylabel)
        ax.legend()


def plot_learning_curve(avg_rewards, num_points_per_epoch, stem, save_dir: Path):
    """<stem>.png + <stem>.csv: scalar learning metric vs. training-set size."""
    x = np.asarray(num_points_per_epoch)
    y = np.asarray(avg_rewards)
    with _new_figure(save_dir / f"{stem}.png") as (fig, ax):
        ax.plot(x, y)
        ax.set(title=f"Avg Episode{stem}", xlabel="Training Steps", ylabel=stem)
    _write_csv(save_dir / f"{stem}.csv", f"train_steps,{stem.lower()}", x, y)


def plot_learning_curve_band(costs, num_points_per_epoch, stem, save_dir: Path,
                             ylabel: str = "Cost"):
    """<stem>.png + <stem>.csv for a multi-seed sweep (parallel/sweep.py).

    `costs` is (n_epochs+1, S): row 0 the prior controller's evaluation cost,
    rows 1.. the per-epoch GP-MPC costs, one column per seed. The figure shows
    the mean with a +/-1 std band plus faint per-seed traces; the CSV carries
    the full distribution summary per epoch.
    """
    costs = np.asarray(costs)
    x = np.asarray(num_points_per_epoch)
    mean, std = costs.mean(axis=1), costs.std(axis=1)
    with _new_figure(save_dir / f"{stem}.png") as (fig, ax):
        ax.plot(x, costs, color="tab:blue", alpha=0.2, linewidth=0.8)
        ax.plot(x, mean, color="tab:blue", label=f"mean ({costs.shape[1]} seeds)")
        ax.fill_between(x, mean - std, mean + std, color="tab:blue", alpha=0.3,
                        label="+/- 1 std")
        ax.set(title=f"Avg Episode {ylabel} ({costs.shape[1]} seeds)",
               xlabel="Training Steps", ylabel=ylabel)
        ax.legend()
    _write_csv(save_dir / f"{stem}.csv", "train_steps,mean,std,min,max",
               x, mean, std, costs.min(axis=1), costs.max(axis=1))


def plot_xyz_trajectory(runs, ref, save_dir: Path):
    """xyz_path.png: XY / XZ / YZ plane projections of every epoch's path."""
    ref = np.asarray(ref)
    planes = [  # (state index pairs) -> axis annotations
        ((0, 2), ("X-Y plane path", "X [m]", "Y [m]")),
        ((0, 4), ("X-Z plane path", "X [m]", "Z [m]")),
        ((2, 4), ("Y-Z plane path", "Y [m]", "Z [m]")),
    ]
    with _new_figure(save_dir / "xyz_path.png", nrows=3, ncols=1) as (fig, axes):
        for ax, ((i, j), (title, xl, yl)) in zip(axes, planes):
            ax.plot(ref[:, i], ref[:, j], **_REF_STYLE)
            _overlay_epochs(ax, [runs[e] for e in range(len(runs))],
                            lambda run, i=i, j=j: (np.asarray(run["obs"])[:, i],
                                                   np.asarray(run["obs"])[:, j]))
            ax.set(title=title, xlabel=xl, ylabel=yl)
            ax.legend()


def make_quad_plots(test_runs, train_runs, trajectory, save_dir: Path):
    """Write the full epoch-comparison bundle into <save_dir>/figs/."""
    num_steps, nx = np.asarray(test_runs[0]["obs"]).shape
    nu = np.asarray(test_runs[0]["action"]).shape[1]
    trajectory = np.asarray(trajectory)[:num_steps]
    num_epochs = len(test_runs)

    fig_dir = Path(save_dir) / "figs"
    fig_dir.mkdir(parents=True, exist_ok=False)

    plot_xyz_trajectory(test_runs, trajectory, fig_dir)
    for ind in range(nx):
        plot_runs(test_runs, num_epochs, ind=ind, ylabel=f"x{ind}",
                  save_dir=fig_dir, traj=trajectory)
    for ind in range(nu):
        plot_runs_input(test_runs, num_epochs, ind=ind, ylabel=f"u{ind}", save_dir=fig_dir)

    # Cumulative training-set size at each epoch (epoch 0 = prior, no data yet).
    per_epoch = [np.asarray(train_runs[e]["obs"]).shape[0] for e in range(1, num_epochs)]
    cumulative_points = np.concatenate([[0], np.cumsum(per_epoch)]).tolist()
    plot_runtime(get_runtime(test_runs, train_runs), cumulative_points, fig_dir)


def plot_quad_eval(trajectories, reference, dt: float, save_path: Path,
                   state_labels=None):
    """state_trajectories.png: per-state actual-vs-desired panel for one episode.

    `state_labels` defaults to the quadrotor's canonical 12-state list (the
    reference's plot contract, plotting.py:198-211); other model families pass
    their own (len == nx) — e.g. ["x", "x_dot", "theta", "theta_dot"] for the
    cartpole."""
    states = np.asarray(trajectories["obs"])
    inputs = np.asarray(trajectories["action"])
    nx = states.shape[1]
    reference = np.asarray(reference)
    if reference.shape[0] != nx:  # accept (N, nx) layout too
        reference = reference.T
    labels = STATE_LABELS if state_labels is None else list(state_labels)
    assert len(labels) == nx

    n = min(len(inputs), len(states))
    times = np.linspace(0.0, dt * n, n)

    with _new_figure(Path(save_path) / "state_trajectories.png",
                     nrows=nx, figsize=(8, nx)) as (fig, axes):
        for k, (ax, label) in enumerate(zip(axes, labels)):
            ax.plot(times, states[:n, k], label="actual")
            desired = reference[k]
            if desired.shape[0] < n:  # wrap the periodic reference
                desired = np.tile(desired, -(-n // desired.shape[0]))
            ax.plot(times, desired[:n], color="r", label="desired")
            ax.set(ylabel=label)
            ax.yaxis.set_major_formatter(FormatStrFormatter("%.1f"))
            if k < nx - 1:
                ax.set_xticks([])
        axes[0].set_title("State Trajectories")
        axes[-1].set(xlabel="time (sec)")
        axes[-1].legend(ncol=3, bbox_transform=fig.transFigure,
                        bbox_to_anchor=(1, 0), loc="lower right")
        fig.tight_layout()
