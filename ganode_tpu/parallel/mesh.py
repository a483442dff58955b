"""Device-mesh parallelism: DP over the batch/frame axis, optional TP on wide
kernels — XLA collectives over ICI, the reference's missing distributed layer.

The reference trained strictly single-process single-GPU (SURVEY.md §2.2); its
only parallelism was DataLoader workers. Here the same jitted train step runs on
one chip or a slice: batches carry a ``NamedSharding`` over the 'data' axis,
parameters are replicated (or tensor-sharded on 'model' for the widest kernels),
and GSPMD inserts the gradient ``psum`` / activation collectives. No NCCL, no
process groups — the program is the parallelism.

Design notes (scaling-book recipe):
* batch is the natural shard axis for this model family — the generator trunk
  flattens (B, T) to B*T frames (reference models/mocogan.py:276-277), so DP over
  B also distributes the frame axis work;
* the ODE/SDE solvers are sequential in time but batched over B — sharding B
  keeps every solver step a full-width MXU op per chip with zero cross-chip
  traffic inside the solve;
* gradient reduction rides ICI via the psums GSPMD inserts for the replicated
  parameter update.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    1-D ('data',) by default; pass shape=(d, m) with axis_names=('data', 'model')
    for a DP x TP mesh.
    """
    devices = jax.devices()[: n_devices or len(jax.devices())]
    if shape is None:
        shape = (len(devices),) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def data_sharding(mesh: Mesh, batch_axis: int = 0, ndim: int = 2) -> NamedSharding:
    """NamedSharding splitting ``batch_axis`` over 'data', replicating the rest."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def shard_batch(batch, mesh: Mesh, batch_axis: int = 0):
    """Place (a pytree of) host arrays with the batch axis split over 'data'."""
    def place(x):
        return jax.device_put(x, data_sharding(mesh, batch_axis, np.ndim(x)))
    return jax.tree.map(place, batch)


def shard_batch_seq(videos, mesh: Mesh, *, batch_axis: int = 1,
                    time_axis: int = 2, data_axis: str = "data",
                    seq_axis: str = "seq"):
    """Shard clips over batch ('data') AND frame/time ('seq') axes — the
    sequence-parallel layout for long clips (SURVEY §5.7: the frame axis plays
    the role of context parallelism in this model family).

    The video discriminator's temporal convolutions then run spatially
    partitioned over 'seq' (GSPMD inserts the halo exchanges), so clips longer
    than one chip's activation memory scale across the mesh instead of
    shrinking the batch. The generator trunk is frame-independent, so its
    B*T-flattened work distributes under the same mesh unchanged.
    """
    def place(x):
        spec = [None] * np.ndim(x)
        spec[batch_axis] = data_axis
        spec[time_axis] = seq_axis
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))
    return jax.tree.map(place, videos)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_params_tp(params, mesh: Mesh, *, axis: str = "model",
                    min_elements: int = 1 << 16):
    """Tensor-shard large kernels: split the output-feature (last) dim of any
    parameter with >= min_elements elements whose last dim divides the axis size.
    Everything else is replicated. Returns the resharded pytree.
    """
    size = mesh.shape[axis]

    def place(x):
        if (np.ndim(x) >= 2 and x.size >= min_elements
                and x.shape[-1] % size == 0):
            spec = [None] * (np.ndim(x) - 1) + [axis]
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(place, params)


def shard_params_ep(params, mesh: Mesh, *, axis: str = "expert"):
    """Expert-parallel placement: shard stacked expert parameters (leaves named
    ``expert_*`` with a leading E axis — nn/moe.py's layout) over the mesh's
    expert axis; replicate everything else. Apply to the optimizer state too —
    EP's payoff is that each device holds only its experts' weights AND moments.

    GSPMD then computes each expert's dispatch einsum on the device owning it
    and reduces the gated combine with one psum over ``axis``.
    """
    size = mesh.shape[axis]

    def place(path, x):
        name = getattr(path[-1], "key", None) if path else None
        if (isinstance(name, str) and name.startswith("expert_")
                and np.ndim(x) >= 1 and x.shape[0] % size == 0):
            spec = [axis] + [None] * (np.ndim(x) - 1)
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, params)


def make_parallel_step(trainer, mesh: Mesh, *, donate: bool = True):
    """jit the trainer's step for the mesh: state replicated, real batches sharded
    over 'data' (axis 1 — batches are (d_iters, B, ...)).

    Returns (step_fn, place_state, place_batch):
      state' , metrics = step_fn(place_state(state), *place_batch(imgs, vids), key)
    """
    def place_state(state):
        return replicate(state, mesh)

    def place_batch(images, videos):
        return (shard_batch(images, mesh, batch_axis=1),
                shard_batch(videos, mesh, batch_axis=1))

    step = jax.jit(trainer.train_step, donate_argnums=(0,) if donate else ())
    return step, place_state, place_batch
