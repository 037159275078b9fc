"""Orbax checkpointing of the whole train state.

Parity with the reference's torch .tar checkpoints every i_weights iters
(global_step + coarse/fine state_dicts + optimizer state,
/root/reference/run.py:1550-1560) and the latest-checkpoint auto-reload scan
(run.py:2075-2093). Divergence, documented: the reference's tcnn resume
reloads only global_step (weight loading commented out, run.py:2199-2202);
we restore everything.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from .state import TrainState


class CheckpointManager:
    def __init__(self, ckpt_dir: str, max_to_keep: int = 3):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: TrainState) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore into the (abstract or concrete) structure of `state`."""
        step = self.latest_step() if step is None else step
        if step is None:
            return state
        restored = self._mgr.restore(
            step,
            args=ocp.args.StandardRestore(jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, state)),
        )
        return restored

    def close(self):
        self._mgr.close()
