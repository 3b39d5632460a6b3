"""Checkpoint / resume.

The reference persists nothing but plots and acados artifacts — a crashed run loses
everything (SURVEY.md §5). Here the full experiment state checkpoints to a single
npz + JSON sidecar: GP training buffers and hyperparameters, the controller's
RNG/inducing keys, the accumulated dataset, epoch counters, and numpy RNG state —
everything needed to resume `learn()` mid-experiment bit-exactly.

Format: flattened pytree leaves keyed by path in one .npz; structure + metadata in
a JSON sidecar. No framework dependency (orbax-compatible layouts can be layered
on later); loads are host-side and cheap at these sizes.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_paths(tree) -> dict[str, np.ndarray]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_pytree(path: Path, tree, metadata: dict[str, Any] | None = None):
    """Save a pytree of arrays to `<path>.npz` (+ `<path>.json` metadata)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = _flatten_with_paths(tree)
    np.savez(str(path) + ".npz", **arrays)
    treedef = jax.tree_util.tree_structure(tree)
    meta = {"treedef": str(treedef), "metadata": metadata or {}}
    with open(str(path) + ".json", "w") as f:
        json.dump(meta, f, indent=2, default=str)


def load_pytree(path: Path, like):
    """Load arrays saved by `save_pytree` into the structure of `like`."""
    path = Path(path)
    with np.load(str(path) + ".npz") as data:
        arrays = {k: data[k] for k in data.files}
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for p, leaf in flat:
        key = "/".join(str(q) for q in p)
        if key not in arrays:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = arrays[key]
        if hasattr(leaf, "dtype"):
            leaves.append(jnp.asarray(arr, leaf.dtype))
        else:
            leaves.append(arr)
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like), leaves
    )


def load_metadata(path: Path) -> dict[str, Any]:
    with open(str(Path(path)) + ".json") as f:
        return json.load(f)["metadata"]


def save_runs(path: Path, runs: dict[int, dict]):
    """Persist {epoch: episode_data} dicts (obs/action/reward arrays + timing).

    One level of dict nesting (e.g. the per-step `controller_data` diagnostics)
    is flattened into dotted keys so every stored value is a plain array —
    never a pickled object array.
    """
    arrays: dict[str, np.ndarray] = {}
    for epoch, run in runs.items():
        for key, val in run.items():
            if isinstance(val, dict):
                for sub, sub_val in val.items():
                    arrays[f"{epoch}|{key}.{sub}"] = np.asarray(sub_val)
            else:
                arrays[f"{epoch}|{key}"] = np.asarray(val)
    np.savez(str(path) + ".npz", **arrays)


def load_runs(path: Path) -> dict[int, dict]:
    runs: dict[int, dict] = {}
    with np.load(str(path) + ".npz") as data:
        for name in data.files:
            epoch_s, key = name.split("|", 1)
            run = runs.setdefault(int(epoch_s), {})
            val = data[name]
            if "." in key:
                outer, sub = key.split(".", 1)
                run.setdefault(outer, {})[sub] = val
            else:
                run[key] = list(val) if key == "inference_time_data" else val
    # Episodes recorded without any controller diagnostics still need the key.
    for run in runs.values():
        run.setdefault("controller_data", {})
    return runs


class ExperimentCheckpoint:
    """Save/restore the GPMPC learning-loop state: GP model + accumulated
    dataset + the episode runs so far + the numpy RNG state (bit-exact resume)."""

    def __init__(self, directory: Path):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)

    def save(
        self,
        epoch: int,
        ctrl,
        x_train: np.ndarray,
        y_train: np.ndarray,
        rng: np.random.Generator | None = None,
        train_runs: dict | None = None,
        test_runs: dict | None = None,
    ):
        tree = {
            "gp_model": ctrl.gp_model,
            "gp_key": ctrl._gp_key,
            "x_train": jnp.asarray(x_train),
            "y_train": jnp.asarray(y_train),
        }
        rng_state = None
        if rng is not None:
            rng_state = json.loads(
                json.dumps(
                    rng.bit_generator.state,
                    default=lambda o: int(o) if isinstance(o, np.integer) else o.tolist(),
                )
            )
        save_pytree(
            self.dir / f"ckpt_epoch_{epoch}",
            tree,
            metadata={"epoch": epoch, "sparse": ctrl.sparse, "rng_state": rng_state},
        )
        if train_runs is not None:
            save_runs(self.dir / f"train_runs_{epoch}", train_runs)
        if test_runs is not None:
            save_runs(self.dir / f"test_runs_{epoch}", test_runs)

    def latest_epoch(self) -> int | None:
        epochs = [
            int(p.stem.split("_")[-1])
            for p in self.dir.glob("ckpt_epoch_*.npz")
        ]
        return max(epochs) if epochs else None

    def restore(self, epoch: int, ctrl, rng: np.random.Generator | None = None):
        """Restore GP/dataset state into `ctrl` (and RNG state into `rng`).

        Returns (x_train, y_train, train_runs, test_runs)."""
        like = {
            "gp_model": ctrl.gp_model,
            "gp_key": ctrl._gp_key,
            "x_train": None,
            "y_train": None,
        }
        # x/y buffers have run-dependent shapes: load raw first.
        path = self.dir / f"ckpt_epoch_{epoch}"
        with np.load(str(path) + ".npz") as data:
            x_train = data["['x_train']"]
            y_train = data["['y_train']"]
        like["x_train"] = jnp.asarray(x_train)
        like["y_train"] = jnp.asarray(y_train)
        tree = load_pytree(path, like)
        ctrl.gp_model = tree["gp_model"]
        ctrl._gp_key = tree["gp_key"]
        meta = load_metadata(path)
        if rng is not None and meta.get("rng_state") is not None:
            state = meta["rng_state"]
            # JSON round-trip turns the uint32 key array into a list; restore it.
            if isinstance(state.get("state"), dict) and "key" in state["state"]:
                state["state"]["key"] = np.asarray(state["state"]["key"], dtype=np.uint64)
            rng.bit_generator.state = state
        train_runs = test_runs = None
        if (self.dir / f"train_runs_{epoch}.npz").exists():
            train_runs = load_runs(self.dir / f"train_runs_{epoch}")
        if (self.dir / f"test_runs_{epoch}.npz").exists():
            test_runs = load_runs(self.dir / f"test_runs_{epoch}")
        return (
            np.asarray(tree["x_train"]),
            np.asarray(tree["y_train"]),
            train_runs,
            test_runs,
        )
