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
