"""Pipeline parallelism: a GPipe microbatch schedule over heterogeneous stages.

The reference trains single-GPU (SURVEY.md §2.2) — PP is new capability. The
object it shards here is the deep generator trunk's *activations*: at the
north-star 128x128/32-frame geometry one decoded clip is 128*128*3*32 floats
per sample and the trunk's intermediate feature maps are larger still, so a
latency-bound serving step (small batch, deep trunk) can spread its stages
over chips that each hold one stage's weights and one in-flight microbatch.
(For *training* at this model family's scale, DP/TP/SP remain the right axes —
the measured argument in docs/DESIGN.md still holds; PP exists for the deep-
trunk serving path and for capability completeness.)

TPU-native formulation: one jitted SPMD program under ``shard_map`` over a
'pipe' mesh axis. Each device owns one stage's parameters (stacked+padded and
sharded over 'pipe', so HBM holds 1/S of the trunk); activations circulate
device-to-device with ``lax.ppermute`` — point-to-point ICI neighbor traffic,
the collective pipeline pattern — inside one ``lax.scan`` over the
M + S - 1 ticks of the GPipe schedule. Stages may have arbitrary distinct
input/output shapes: activations and parameters ride in flat, zero-padded
buffers and each device unpacks with its own stage's static spec via
``lax.switch`` on its pipe index. The whole schedule is differentiable (scan +
ppermute + switch all have transposes), so gradients flow back through the
pipeline in the same program.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def _flatten_size(shape) -> int:
    return int(np.prod(shape, dtype=np.int64)) if shape else 1


def _pack_params(stage_params):
    """Ravel each stage's param pytree to a flat f32 vector, zero-pad to the max
    length, and stack to (S, P). Returns (packed, unravel_fns)."""
    from jax.flatten_util import ravel_pytree

    vecs, unravels = [], []
    for p in stage_params:
        vec, unravel = ravel_pytree(p)
        if vec.dtype != jnp.float32:
            raise ValueError(f"pipeline stage params must be float32, got {vec.dtype}")
        vecs.append(vec)
        unravels.append(unravel)
    pmax = max(v.shape[0] for v in vecs)
    packed = jnp.stack(
        [jnp.pad(v, (0, pmax - v.shape[0])) for v in vecs])
    return packed, unravels, [int(v.shape[0]) for v in vecs]


def pipeline_apply(
    stage_fns: Sequence[Callable[[Any, jax.Array], jax.Array]],
    stage_params: Sequence[Any],
    x: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "pipe",
    data_axis: Optional[str] = None,
    n_microbatches: Optional[int] = None,
) -> jax.Array:
    """Run ``x`` through ``stage_fns[0] ∘ ... ∘ stage_fns[S-1]`` pipelined over
    the mesh's ``axis`` (device i owns stage i), GPipe-scheduled over
    ``n_microbatches`` (default S). Composes with DP: pass ``data_axis`` to
    shard the batch dimension over it as well.

    Exactly equals the sequential composition (same arithmetic, reordered), and
    is differentiable end-to-end. Requires S == mesh.shape[axis], batch
    divisible by n_microbatches, and a single activation dtype across stages.
    """
    S = len(stage_fns)
    if mesh.shape[axis] != S:
        raise ValueError(f"{S} stages need mesh axis {axis!r} of size {S}, "
                         f"got {mesh.shape[axis]}")
    M = n_microbatches or S
    B = x.shape[0]
    if B % M:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")
    m = B // M
    dsize = mesh.shape[data_axis] if data_axis else 1
    if m % dsize:
        raise ValueError(f"microbatch {m} not divisible by data axis {dsize}")

    # static per-stage shape chain (microbatch-sized)
    in_shapes, out_shapes = [], []
    cur = jax.ShapeDtypeStruct((m,) + tuple(x.shape[1:]), x.dtype)
    act_dtype = x.dtype
    for fn, p in zip(stage_fns, stage_params):
        out = jax.eval_shape(fn, p, cur)
        if out.dtype != act_dtype:
            raise ValueError(
                f"pipeline stages must keep one activation dtype; stage "
                f"{len(in_shapes)} maps {act_dtype} -> {out.dtype}")
        in_shapes.append(cur.shape)
        out_shapes.append(out.shape)
        cur = jax.ShapeDtypeStruct(out.shape, out.dtype)
    buf_size = max(max(_flatten_size(s[1:]) for s in in_shapes),
                   max(_flatten_size(s[1:]) for s in out_shapes))
    out_size = _flatten_size(out_shapes[-1][1:])

    packed_params, unravels, param_lens = _pack_params(stage_params)

    # branches: (param_vec (P,), buf (m_loc, buf_size)) -> buf'
    def make_branch(i):
        fn, unravel, plen = stage_fns[i], unravels[i], param_lens[i]
        n_in = _flatten_size(in_shapes[i][1:])
        n_out = _flatten_size(out_shapes[i][1:])

        def branch(pvec, buf):
            m_loc = buf.shape[0]
            params = unravel(pvec[:plen])
            xin = buf[:, :n_in].reshape((m_loc,) + tuple(in_shapes[i][1:]))
            y = fn(params, xin).reshape(m_loc, n_out)
            return jnp.pad(y, ((0, 0), (0, buf_size - n_out)))

        return branch

    branches = [make_branch(i) for i in range(S)]
    ticks = M + S - 1
    perm = [(i, i + 1) for i in range(S - 1)]

    # microbatched, flattened, zero-padded feed: (ticks, m, buf_size)
    x_flat = x.reshape(M, m, -1)
    x_flat = jnp.pad(
        x_flat, ((0, S - 1), (0, 0), (0, buf_size - x_flat.shape[-1])))

    spec_feed = P(None, data_axis, None)   # (ticks, m/dp, buf)
    spec_out = P(None, data_axis, None)    # (M, m/dp, out)

    def body(packed, feed):
        pvec = packed[0]                   # (P,) — this device's stage params
        idx = jax.lax.axis_index(axis)
        m_loc = feed.shape[1]
        buf0 = jnp.zeros((m_loc, buf_size), act_dtype)
        acc0 = jnp.zeros((M, m_loc, out_size), act_dtype)

        def tick(carry, t):
            buf, acc = carry
            incoming = jax.lax.ppermute(buf, axis, perm)
            my_in = jnp.where(idx == 0, feed[t], incoming)
            y = jax.lax.switch(idx, branches, pvec, my_in)
            out_m = t - (S - 1)
            valid = (idx == S - 1) & (out_m >= 0)
            j = jnp.clip(out_m, 0, M - 1)
            cur = jax.lax.dynamic_index_in_dim(acc, j, 0, keepdims=False)
            new = jnp.where(valid, y[:, :out_size], cur)
            acc = jax.lax.dynamic_update_index_in_dim(acc, new, j, 0)
            return (y, acc), None

        (_, acc), _ = jax.lax.scan(tick, (buf0, acc0), jnp.arange(ticks))
        # only the last device wrote into acc; the psum broadcasts its rows
        return jax.lax.psum(acc, axis)

    out = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), spec_feed),
        out_specs=spec_out,
        check_vma=False,
    )(packed_params, x_flat)
    return out.reshape((B,) + tuple(out_shapes[-1][1:]))
