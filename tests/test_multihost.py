"""Multi-host (DCN) init path, executed for real with local processes.

The reference has no distributed layer at all (SURVEY.md §2.3); for the TPU
build, multi-host scale-out is a target capability (BASELINE.md: solves/s at
N>=2 hosts). Real multi-host hardware is not available in CI, so this test
runs the genuine code path — `parallel/mesh.py::init_distributed`
(`jax.distributed.initialize`) + a globally-sharded `batched_gpmpc_step` —
across TWO LOCAL PROCESSES with a 127.0.0.1 coordinator and cross-process Gloo
collectives, via `scripts/run_multihost.py --virtual-hosts 2 --parity`.

Each worker asserts sharded-vs-local parity of the full control trace
(process_allgather of the sharded actions vs an unsharded recompute), so this
covers correctness of the DCN sharding, not just that init doesn't crash.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_two_process_distributed_parity():
    env = dict(os.environ)
    # The workers set their own JAX_PLATFORMS=cpu / XLA_FLAGS before importing
    # jax (scripts/run_multihost.py --virtual); scrub the suite's forced flags
    # so the worker's device count is its own.
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [
            sys.executable, "scripts/run_multihost.py",
            "--virtual-hosts", "2", "--scenarios", "16", "--steps", "1",
            "--backend", "xla", "--horizon", "10", "--gp-points", "32",
            "--parity",
        ],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=850,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    # Both hosts must report parity (worker exits 3 on mismatch, but assert
    # the positive signal too).
    assert "PARITY pid=0" in r.stdout and "ok=True" in r.stdout, r.stdout
    assert "PARITY pid=1" in r.stdout, r.stdout
    assert '"metric": "solves_per_sec[multihost_2proc_4dev_B16_xla]"' in r.stdout, r.stdout


@pytest.mark.slow
def test_four_process_distributed_window():
    """Round-4 verdict item 4: scale the exercise from 'proves init' to
    'measures a program' — 4 processes (2 devices each), B=256, a 20-step
    timed window, and 4-way parity. The recorded artifact is
    MULTIHOST_r05.json; this test keeps the run green."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [
            sys.executable, "scripts/run_multihost.py",
            "--virtual-hosts", "4", "--virtual", "2",
            "--scenarios", "256", "--steps", "20",
            "--backend", "xla", "--horizon", "10", "--gp-points", "32",
            "--parity",
        ],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=850,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    for pid in range(4):
        assert f"PARITY pid={pid}" in r.stdout, r.stdout
    assert "ok=True" in r.stdout and "ok=False" not in r.stdout, r.stdout
    assert '"metric": "solves_per_sec[multihost_4proc_8dev_B256_xla]"' in r.stdout, r.stdout


@pytest.mark.slow
def test_two_process_seed_sweep_parity():
    """Round-4 verdict item 4: the seed sweep sharded across PROCESSES —
    `parallel/sweep.py::seed_sweep` with a 2-process global mesh (the
    make_array_from_callback sharding path), sharded-vs-unsharded parity of
    the full learning-cycle cost matrix."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [
            sys.executable, "scripts/run_multihost.py",
            "--virtual-hosts", "2", "--virtual", "2",
            "--sweep", "4", "--steps", "20",
            "--backend", "xla", "--horizon", "10", "--gp-points", "64",
            "--parity",
        ],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=850,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "SWEEP-PARITY pid=0" in r.stdout and "SWEEP-PARITY pid=1" in r.stdout, r.stdout
    assert "ok=True" in r.stdout and "ok=False" not in r.stdout, r.stdout
    assert '"metric": "sweep[multihost_2proc_4dev_S4_xla]"' in r.stdout, r.stdout
