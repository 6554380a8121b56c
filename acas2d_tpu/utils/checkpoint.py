"""Orbax checkpointing with true train-resume.

The reference only *saves* (CheckpointCallback / EvalCallback zips,
training_main.py:31-39) and has no resume path (SURVEY.md §5).  Here the
full TrainState — params, optimizer state, batched env state (including the
per-env PRNG keys), and the global step — round-trips through orbax, so a
killed run restarts exactly where it left off, and eval drivers can load any
checkpoint (checkpoint_testing_main.py equivalent).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5,
                 best_fn_key: Optional[str] = "eval_return_mean"):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)
        self._best_key = best_fn_key
        self._best_dir = os.path.join(self.directory, "best")
        # Persist the best metric across process restarts: without this, a
        # --resume relaunch would treat its first (possibly worse) eval as a
        # new best and overwrite best/.
        self._best_meta = os.path.join(self._best_dir, "best_value.json")
        self._best_value = None
        if os.path.exists(self._best_meta):
            import json
            with open(self._best_meta) as f:
                self._best_value = json.load(f).get("value")

    def save(self, step: int, state: Any, metrics: Optional[dict] = None):
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if metrics:
            self.update_best(step, state, metrics)

    def update_best(self, step: int, state: Any, metrics: dict) -> bool:
        """Best-model tracking (EvalCallback's best_model_save_path,
        training_main.py:31-35): overwrite best/ iff metrics beat the
        persisted best value.  Callable independently of the periodic
        save() so best-tracking follows the EVAL cadence while snapshots
        follow --checkpoint-every.  Returns True on a new best."""
        if not (self._best_key and self._best_key in metrics):
            return False
        v = float(metrics[self._best_key])
        if self._best_value is not None and v <= self._best_value:
            return False
        self._best_value = v
        ckpt = ocp.StandardCheckpointer()
        path = os.path.join(self._best_dir, "state")
        if os.path.exists(path):
            import shutil
            shutil.rmtree(path)
        ckpt.save(path, state)
        ckpt.wait_until_finished()
        import json
        with open(self._best_meta, "w") as f:
            json.dump({"value": v, "step": int(step)}, f)
        return True

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, target: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of `target` (an abstract or concrete
        TrainState built with the same config)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(target))

    def restore_best(self, target: Any) -> Any:
        ckpt = ocp.StandardCheckpointer()
        return ckpt.restore(os.path.join(self._best_dir, "state"), target)

    def restore_raw(self, step: Optional[int] = None, best: bool = False
                    ) -> Any:
        """Restore a checkpoint as a raw nested dict (no target structure).

        For consumers that only need a subtree (eval wants params +
        the iteration tag) and must not depend on the training run's optimizer
        topology — e.g. an --anneal-lr run stores a schedule state that a
        constant-lr template cannot mirror."""
        if best:
            ckpt = ocp.StandardCheckpointer()
            return ckpt.restore(os.path.join(self._best_dir, "state"))
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        return self._mgr.restore(step)

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
