"""End-to-end test of the flagship experiment driver (scripts/run_gp_mpc.py).

Exercises the full L4 layer as a subprocess the way a user runs it
(≙ /root/reference/scripts/run_gp_mpc.py:140-189): config loading, the learn()
epoch loop (prior rollout -> sample -> preprocess -> train GP -> test ->
collect), the plotting bundle, the final evaluation, and the checkpoint
save/resume cycle.
"""

import os
import subprocess
import sys
from pathlib import Path

import yaml
import pytest

REPO = Path(__file__).resolve().parents[1]


def run_driver(tmp_path: Path, extra_args, timeout=900):
    cfg = {
        "save_dir": str(tmp_path / "saves"),
        "seed": 1,
        "gpmpc": {"max_gp_points": 64, "sqp_iters": 4, "qp_iters": 8},
        "run": {"num_epochs": 2},
        "train": {"iterations": 30, "lr": 0.05, "samples_per_epoch": 10},
    }
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    (tmp_path / "saves").mkdir(exist_ok=True)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "scripts/run_gp_mpc.py", "--platform", "cpu",
         "--fast", "--steps", "25", "--config", str(cfg_path)] + extra_args,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout,
    )


def latest_save_dir(tmp_path: Path) -> Path:
    dirs = sorted((tmp_path / "saves").iterdir(), key=lambda p: p.stat().st_mtime)
    assert dirs, "driver created no save dir"
    return dirs[-1]


@pytest.mark.slow
def test_driver_end_to_end_artifacts_and_summary(tmp_path):
    r = run_driver(tmp_path, ["--epochs", "1"])
    assert r.returncode == 0, r.stderr[-3000:]
    # Summary lines on stdout.
    assert "mean position error" in r.stdout, r.stdout[-2000:]
    assert "total experiment wall time" in r.stdout, r.stdout[-2000:]
    # Full artifact bundle (filenames are the reference-parity surface).
    save = latest_save_dir(tmp_path)
    figs = save / "figs"
    for name in (["xyz_path.png", "runtime.png", "runtime.csv"]
                 + [f"x{i}.png" for i in range(12)] + [f"u{i}.png" for i in range(4)]):
        assert (figs / name).exists(), name
    assert (save / "state_trajectories.png").exists()


@pytest.mark.slow
def test_driver_checkpoint_resume_cycle(tmp_path):
    ckpt = tmp_path / "ckpt"
    first = run_driver(tmp_path, ["--epochs", "1", "--checkpoint-dir", str(ckpt)])
    assert first.returncode == 0, first.stderr[-3000:]
    assert any(ckpt.iterdir()), "no checkpoint written"
    # Re-run with one more epoch: must resume from epoch 1, not restart.
    second = run_driver(tmp_path, ["--epochs", "2", "--checkpoint-dir", str(ckpt)])
    assert second.returncode == 0, second.stderr[-3000:]
    assert "resumed from checkpoint epoch 1" in second.stdout, second.stdout[-2000:]
