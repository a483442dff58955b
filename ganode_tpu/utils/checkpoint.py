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

import jax
import jax.numpy as jnp
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
        GANState used as the target pytree).

        The ``ema_params`` subtree is reconciled against the checkpoint's own
        metadata: a template built from a config whose ``ema_decay`` differs
        from the training run's (e.g. evaluate.py constructing the default
        config to read an ``--ema``-trained checkpoint) would otherwise hand
        orbax a structure mismatch and fail. EMA mirrors the generator params
        exactly, so the template can always be adapted in place.
        """
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        state_like, patch = self._reconcile_optional_slots(state_like, step)
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_like))
        return patch(restored)

    def _reconcile_optional_slots(self, state_like: Any, step: int):
        """Align the template's optional GANState slots (ema_params, ada) with
        what the checkpoint actually holds, so a template built from a config
        that differs from the training run's (e.g. evaluate.py reading an
        ``--ema``- or ADA-trained checkpoint with default flags, or an
        ``ada_target>0`` run resuming from a pre-ADA checkpoint — the
        documented tunnel-death recovery path) doesn't hand orbax a structure
        mismatch. Returns (template, patch) where ``patch`` post-processes the
        restored state (identity unless a template slot had to be dropped)."""
        identity = lambda s: s
        if not (hasattr(state_like, "ema_params")
                and hasattr(state_like, "replace")
                and hasattr(state_like, "gen")):
            return state_like, identity
        try:
            tree = self._mgr.item_metadata(step).tree
        except Exception:
            return state_like, identity  # older orbax / non-tree item
        saved = tree.get("ema_params")
        if saved is not None and state_like.ema_params is None:
            # Checkpoint carries EMA weights the template didn't plan for:
            # EMA is structurally a copy of the generator params (train/gan.py
            # init_state), so the generator subtree is the correct template.
            state_like = state_like.replace(
                ema_params=jax.tree.map(lambda x: x, state_like.gen.params))
        elif saved is None and state_like.ema_params is not None:
            state_like = state_like.replace(ema_params=None)
        patch = identity
        saved_ada = tree.get("ada")
        if saved_ada is not None and state_like.ada is None:
            state_like = state_like.replace(
                ada={"p_img": jnp.asarray(0.0, jnp.float32),
                     "p_vid": jnp.asarray(0.0, jnp.float32)})
        elif saved_ada is None and state_like.ada is not None:
            # pre-ADA checkpoint into an ADA template: restore without the
            # slot, then reinstate the caller's fresh controller state (p=0)
            # so the resumed run starts adapting from scratch.
            fresh = state_like.ada
            state_like = state_like.replace(ada=None)
            patch = lambda s: s.replace(ada=fresh)
        return state_like, patch

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return self._mgr.all_steps()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
