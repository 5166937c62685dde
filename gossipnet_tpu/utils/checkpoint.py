"""Checkpoint/resume via orbax.

The reference snapshots with ``tf.train.Saver`` every
``cfg.snapshot_iter`` steps and resumes manually (SURVEY.md §5). The
rebuild checkpoints the FULL resumable state — params, optimizer state,
step, PRNG key, and the data-iterator position — so a restart reproduces
the exact training stream deterministically. A 'best-AP' checkpoint is
kept alongside the periodic ones.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper: periodic + best-AP checkpoints + sidecar JSON
    for host-side state (iterator position, best metric)."""

    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory / "steps",
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self._best = ocp.StandardCheckpointer()
        self._best_metric = self._load_sidecar("best.json").get("metric", -1.0)

    # --- sidecar helpers ---
    def _sidecar_path(self, name: str) -> Path:
        return self.directory / name

    def _load_sidecar(self, name: str) -> dict:
        p = self._sidecar_path(name)
        if p.exists():
            return json.loads(p.read_text())
        return {}

    def _write_sidecar(self, name: str, data: dict) -> None:
        self._sidecar_path(name).write_text(json.dumps(data))

    # --- periodic ---
    def save(self, step: int, state: Any, host_state: dict | None = None) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if host_state is not None:
            self._write_sidecar(f"host_{step}.json", host_state)
        self._mgr.wait_until_finished()
        # prune host sidecars alongside orbax's own retention
        kept = set(self._mgr.all_steps())
        for p in self.directory.glob("host_*.json"):
            try:
                s = int(p.stem.split("_")[1])
            except ValueError:
                continue
            if s not in kept:
                p.unlink(missing_ok=True)

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: int | None = None):
        """Returns (state, host_state_dict). ``state_template`` is a pytree
        with the target structure/shapes (e.g. a freshly-initialized
        state)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )
        return restored, self._load_sidecar(f"host_{step}.json")

    # --- best ---
    def maybe_save_best(self, metric: float, state: Any) -> bool:
        if metric <= self._best_metric:
            return False
        self._best_metric = metric
        best_dir = self.directory / "best"
        if best_dir.exists():
            import shutil

            shutil.rmtree(best_dir)
        self._best.save(best_dir, state)
        self._best.wait_until_finished()
        self._write_sidecar("best.json", {"metric": metric})
        return True

    def close(self) -> None:
        self._mgr.close()


def tree_equal(a, b) -> bool:
    """Exact pytree equality (testing helper)."""
    la, ta = jax.tree.flatten(a)
    lb, tb = jax.tree.flatten(b)
    if ta != tb:
        return False
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))
