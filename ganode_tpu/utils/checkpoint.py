"""Orbax checkpointing: the whole GANState (3 nets' params + BN stats + optimizer
states + step + PRNG key) as one managed pytree.

Replaces the reference's six-state-dict torch.save blobs and manual resume flag
(reference mnist_moco_ode.py:92-103,175-190) with versioned, retention-managed,
atomically-written checkpoints — and because the state includes the PRNG key,
resume is bit-deterministic, which the reference's global-RNG training never was.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, *, max_to_keep: int = 5,
                 save_interval_steps: int = 1):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            save_interval_steps=save_interval_steps,
            create=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, *, wait: bool = False) -> bool:
        saved = self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()
        return saved

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``state_like`` (an abstract or concrete
        GANState used as the target pytree)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_like))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return self._mgr.all_steps()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
