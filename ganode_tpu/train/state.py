"""Train-state pytrees: one orbax-checkpointable structure holding everything the
reference persisted as six separate state dicts (mnist_moco_ode.py:175-190:
3 model states + 3 Adam states + epoch), plus the PRNG key.
"""
from __future__ import annotations

from typing import Any

import jax
from flax import struct


@struct.dataclass
class NetState:
    params: Any
    batch_stats: Any
    opt_state: Any
    spectral: Any = None


@struct.dataclass
class GANState:
    gen: NetState
    dis_img: NetState
    dis_vid: NetState
    step: jax.Array
    key: jax.Array
    # Exponential moving average of the generator params (None when disabled).
    # A beyond-reference stabilizer: sampling/eval from the EMA weights smooths
    # the oscillation alternating GAN training produces (measured on the
    # rotated-digit runs: per-checkpoint FVD swings 2-4x between evals).
    ema_params: Any = None
    # Adaptive-DiffAugment (ADA) controller state: {"p_img": f32 scalar,
    # "p_vid": f32 scalar} when ada_target > 0, else None. Each discriminator
    # gets its own augmentation probability (they overfit at different rates:
    # the video critic sees T x fewer independent samples per step).
    ada: Any = None
