"""Teacher+student checkpointing via orbax.

Equivalent of DetectionTSCheckpointer over EnsembleTSModel (reference:
ubteacher/checkpoint/detection_checkpoint.py:10-89,
ubteacher/modeling/meta_arch/ts_ensemble.py:6-16): one checkpoint holds
{student, teacher, opt_state, step}. Resume restores the full train state;
pretrained backbone weights load into the student only (reference:
trainer.py:88-109, detection_checkpoint.py:13-36) via
checkpoint/torch_weights.py.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class TSCheckpointer:
    def __init__(self, output_dir: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(os.path.join(output_dir, "checkpoints"))
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def resume_or_load(self, state: Any, resume: bool) -> Any:
        """If resume and a checkpoint exists, restore the full state
        (teacher+student+opt+step); else return `state` unchanged (the
        caller has already loaded pretrained weights into the student)."""
        if resume:
            step = self._mgr.latest_step()
            if step is not None:
                return self._mgr.restore(
                    step, args=ocp.args.StandardRestore(state)
                )
        return state

    def wait_until_finished(self) -> None:
        self._mgr.wait_until_finished()
