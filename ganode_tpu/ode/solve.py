"""Fixed-grid ODE integration as ``lax.scan`` steppers over pytree state.

This replaces the reference's use of ``torchdiffeq.odeint(_adjoint)`` with fixed-grid
methods (reference models/mocogan_ode.py:48-50 calls ``odeint(func, x,
linspace(0,1,T), method='rk4')``). Semantics matched:

* ``ts`` is the output grid AND the step grid: one RK step is taken per consecutive
  pair ``(ts[i], ts[i+1])`` (optionally subdivided via ``steps_per_interval``).
* The returned trajectory is stacked along a new leading time axis, with
  ``ys[0] == y0`` — exactly torchdiffeq's contract.
* The vector field has signature ``func(t, y, args) -> dy/dt`` over pytrees.

TPU-first design notes:

* The whole solve is a single ``lax.scan`` — XLA compiles it to one fused loop; the
  per-step RK stage math lives in registers/VMEM, not as 60 separate kernel launches
  the way eager torch runs it.
* Backprop is *checkpointed* by default (``jax.checkpoint`` around the step body):
  memory is O(T) in carried states only, the stage intermediates are recomputed in
  the backward sweep. The continuous adjoint (matching ``odeint_adjoint``) lives in
  ``ganode_tpu.ode.adjoint``.
* NFE (number of function evaluations) is a static, exact quantity for fixed-grid
  methods and is reported through ``SolveStats`` — the reference only tracked it
  ad-hoc via a mutable counter (reference stage1/stage_1_ODE_block.ipynb cell 7).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax

from . import tableaus as tb
from .tree import tree_lincomb

VectorField = Callable[..., Any]  # func(t, y, args) -> dy/dt


@dataclasses.dataclass(frozen=True)
class SolveStats:
    """Solver instrumentation. For fixed-grid methods all fields are static ints."""

    nfe: Any           # number of RHS evaluations
    n_steps: Any       # accepted steps
    n_rejected: Any = 0
    # adaptive only: True if any interval hit max_steps before reaching its output
    # time — the returned trajectory is then truncated and must not be trusted.
    steps_exhausted: Any = False


def _normalize_func(func: VectorField, args) -> Callable[[Any, Any], Any]:
    """Accept both func(t, y) and func(t, y, args) signatures."""
    if args is None:
        return lambda t, y: func(t, y)
    return lambda t, y: func(t, y, args)


def rk_step(tableau: tb.ButcherTableau, f, t0, dt, y0, f0=None):
    """One explicit RK step. Returns (y1, k_last, ks) — ks for error estimation.

    ``f0`` optionally supplies the first stage evaluation (FSAL reuse).
    """
    ks = []
    for i in range(tableau.stages):
        if i == 0:
            k = f0 if f0 is not None else f(t0, y0)
        else:
            coeffs = [dt * aij for aij in tableau.a[i]]
            yi = tree_lincomb(coeffs, ks[: len(coeffs)], base=y0)
            k = f(t0 + tableau.c[i] * dt, yi)
        ks.append(k)
    coeffs = [dt * bi for bi in tableau.b]
    y1 = tree_lincomb(coeffs, ks, base=y0)
    return y1, ks


def odeint(
    func: VectorField,
    y0,
    ts,
    args=None,
    *,
    method: str = "rk4",
    steps_per_interval: int = 1,
    checkpoint: bool = True,
    unroll: int = 1,
    return_stats: bool = False,
):
    """Integrate ``dy/dt = func(t, y, args)`` over the grid ``ts``.

    Args:
      func: vector field ``(t, y[, args]) -> dy``, y an arbitrary pytree.
      y0: initial state pytree at ``ts[0]``.
      ts: 1-D array of output times, also the step grid (torchdiffeq fixed-grid
        semantics). Must have static length >= 2 under jit.
      args: optional extra pytree closed over differentiably (e.g. MLP params).
      method: one of euler | midpoint | rk2/heun | rk3 | rk4 | rk38.
      steps_per_interval: subdivide each output interval into this many equal
        internal steps (for accuracy without densifying the output grid).
      checkpoint: rematerialize stage intermediates in the backward pass
        (memory O(T) in carried states). Set False for tiny problems.
      unroll: scan unroll factor — raise for very small state to amortize loop
        overhead on TPU.
      return_stats: also return ``SolveStats``.

    Returns:
      ys: pytree with a new leading axis of size ``len(ts)``; ``ys[0] == y0``.
    """
    if method not in tb.FIXED_GRID:
        raise ValueError(
            f"Unknown fixed-grid method {method!r}; choose from {sorted(tb.FIXED_GRID)} "
            "(for adaptive stepping use ganode_tpu.ode.odeint_adaptive)."
        )
    tableau = tb.FIXED_GRID[method]
    f = _normalize_func(func, args)
    ts = jnp.asarray(ts)
    n_out = ts.shape[0]
    spi = int(steps_per_interval)
    if spi < 1:
        raise ValueError("steps_per_interval must be >= 1")

    def interval(y, t_pair):
        t0, t1 = t_pair
        h = (t1 - t0) / spi
        if spi == 1:
            y1, _ = rk_step(tableau, f, t0, h, y)
        else:
            def sub(carry, j):
                yj = carry
                yj1, _ = rk_step(tableau, f, t0 + j.astype(h.dtype) * h, h, yj)
                return yj1, None
            y1, _ = lax.scan(sub, y, jnp.arange(spi))
        return y1, y1

    body = jax.checkpoint(interval) if checkpoint else interval
    _, ys_tail = lax.scan(body, y0, (ts[:-1], ts[1:]), unroll=unroll)
    ys = jax.tree.map(
        lambda y0_l, tail_l: jnp.concatenate([y0_l[None], tail_l], axis=0),
        y0,
        ys_tail,
    )
    if return_stats:
        stats = SolveStats(
            nfe=tableau.stages * (n_out - 1) * spi,
            n_steps=(n_out - 1) * spi,
        )
        return ys, stats
    return ys


def odeint_final(
    func: VectorField,
    y0,
    t0,
    t1,
    args=None,
    *,
    method: str = "rk4",
    num_steps: int = 1,
    checkpoint: bool = True,
):
    """Integrate from t0 to t1 and return only the final state.

    The memory-lean primitive behind ODE-RNN (one solve per frame, reference
    models/mocogan_ode_rnn.py:47-48 keeps only ``odeint(...)[-1]``) and the
    continuous-depth ODE block.
    """
    tableau = tb.FIXED_GRID[method]
    f = _normalize_func(func, args)
    t0 = jnp.asarray(t0, dtype=jnp.result_type(t0, jnp.float32))
    t1 = jnp.asarray(t1, dtype=t0.dtype)
    h = (t1 - t0) / num_steps

    def step(y, j):
        y1, _ = rk_step(tableau, f, t0 + j.astype(h.dtype) * h, h, y)
        return y1, None

    body = jax.checkpoint(step) if checkpoint else step
    yT, _ = lax.scan(body, y0, jnp.arange(num_steps))
    return yT


def nfe_fixed_grid(method: str, n_outputs: int, steps_per_interval: int = 1) -> int:
    """Exact NFE for a fixed-grid solve — e.g. rk4 over 16 output times = 60."""
    return tb.FIXED_GRID[method].stages * (n_outputs - 1) * steps_per_interval
