"""Stochastic differential equation solvers with splittable-PRNG Brownian paths.

Replaces the reference's use of ``torchsde.sdeint_adjoint`` (reference
models/mocogan_sde.py:4,57-59: Ito SDE, diagonal noise, ``method='euler'``,
``dt=2.5e-2`` over ``linspace(0, 1, T)``). Semantics matched:

* drift ``f(t, y, args)`` and diffusion ``g(t, y, args)`` both map to pytrees of the
  same structure as ``y``; "diagonal" noise means the Brownian motion has one
  independent channel per state element and the diffusion acts elementwise.
* ``dt`` bounds the internal step: each output interval ``(ts[i], ts[i+1])`` is
  subdivided into ``ceil((ts[i+1]-ts[i]) / dt)`` equal Euler-Maruyama substeps —
  for the reference config (T=16 outputs on [0,1], dt=0.025) that is 40 internal
  steps per unit time, 3 per interval.

TPU-first design:

* The Brownian increments are a *pure function* of ``(key, global substep index)``:
  ``dW_k = sqrt(h) * normal(fold_in(key, k))``. Under the checkpointed-scan backward
  pass the increments are regenerated bit-identically, which is exactly the property
  torchsde's BrownianInterval provides for its adjoint — here it falls out of
  counter-based splittable PRNG for free, with no host-side tree structure.
* The whole path is one ``lax.scan``; substep counts are static so XLA sees a fixed
  trip count.
"""
from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax

from .solve import SolveStats


def _substeps(ts, dt) -> int:
    """Static number of substeps per output interval (uniform grid assumed).

    Works on the RAW ts object (numpy / list / concrete jnp array) BEFORE any
    jnp conversion: arithmetic on constants inside a jit trace lifts them to
    tracers, so the host-side count must be taken from host data.
    """
    if dt is None:
        return 1
    import numpy as _np

    try:
        host_ts = _np.asarray(ts)
        interval = float(host_ts[1] - host_ts[0])
        return max(1, math.ceil(round(interval / float(dt), 9)))
    except (TypeError, jax.errors.TracerArrayConversionError,
            jax.errors.ConcretizationTypeError):
        raise ValueError(
            "sdeint requires a concrete (non-traced) ts/dt so the substep count is "
            "static; pass ts as a numpy array or Python floats."
        )


def _diag_normals(key, k, shape, dtype):
    return jax.random.normal(jax.random.fold_in(key, k), shape, dtype)


def _diag_jacobian(g_fn, t, y):
    """Exact diag(J_g): dg_i/dy_i per state element, via basis JVPs vmapped
    over each leaf's trailing axis.

    Diagonal Milstein needs the true diagonal of the diffusion Jacobian; the
    common surrogate (directional derivative of g along g) equals it only for
    elementwise diffusions, and this library's MLP diffusions are dense. The
    basis-JVP construction is exact for any cross-FEATURE dependence; it
    assumes the diffusion does not couple leading (batch) axes, which the
    diagonal-noise contract already implies (one independent Brownian channel
    per state element).
    """
    flat, treedef = jax.tree.flatten(y)

    def diag_for_leaf(leaf_idx, leaf):
        def jvp_at(tangent_leaf):
            tangent = treedef.unflatten([
                tangent_leaf if j == leaf_idx else jnp.zeros_like(l)
                for j, l in enumerate(flat)])
            _, dg = jax.jvp(lambda y_: g_fn(t, y_), (y,), (tangent,))
            return jax.tree.flatten(dg)[0][leaf_idx]

        if leaf.ndim == 0:
            return jvp_at(jnp.ones_like(leaf))
        d = leaf.shape[-1]

        def one(i):
            e = jnp.zeros_like(leaf).at[..., i].set(1.0)
            return jvp_at(e)[..., i]

        cols = jax.vmap(one)(jnp.arange(d))          # (d, *leading)
        return jnp.moveaxis(cols, 0, -1)

    return treedef.unflatten(
        [diag_for_leaf(j, l) for j, l in enumerate(flat)])


def sdeint(
    drift: Callable[..., Any],
    diffusion: Callable[..., Any],
    y0,
    ts,
    key,
    args=None,
    *,
    dt: float | None = None,
    method: str = "euler",
    noise_type: str = "diagonal",
    checkpoint: bool = True,
    return_stats: bool = False,
):
    """Integrate the Ito SDE ``dy = f dt + g dW`` over the output grid ``ts``.

    Args:
      drift, diffusion: ``(t, y[, args]) -> pytree like y``.
      y0: initial state pytree.
      ts: output times (concrete array), also defining interval boundaries.
      key: PRNG key generating the Brownian path (the path is a deterministic
        function of this key — reuse the key to replay the same path).
      dt: max internal step; each interval is split into ceil(interval/dt) equal
        substeps (torchsde fixed-step semantics).
      method: 'euler' (Euler-Maruyama) or 'milstein' (diagonal-noise Milstein).
      noise_type: only 'diagonal' is supported (the reference uses only diagonal,
        reference models/mocogan_sde.py:20).

    Returns:
      ys stacked over a leading time axis (ys[0] == y0), plus SolveStats if asked.
    """
    if noise_type != "diagonal":
        raise NotImplementedError("only diagonal noise is implemented")
    if method not in ("euler", "milstein"):
        raise ValueError(f"unknown SDE method {method!r}")

    f = (lambda t, y: drift(t, y)) if args is None else (lambda t, y: drift(t, y, args))
    g = (lambda t, y: diffusion(t, y)) if args is None else (lambda t, y: diffusion(t, y, args))

    # substep count is host-side and static: compute it from the RAW ts before
    # any jnp conversion (jax 0.9 tracing lifts converted constants to tracers)
    spi = _substeps(ts, dt)
    ts = jnp.asarray(ts)
    flat_y0, treedef = jax.tree.flatten(y0)

    def em_substep(t, h, y, dW):
        fv = f(t, y)
        gv = g(t, y)
        y1 = jax.tree.map(lambda yi, fi, gi, wi: yi + fi * h + gi * wi, y, fv, gv, dW)
        if method == "milstein":
            # Diagonal Milstein: + 0.5 * g_i * (dg_i/dy_i) * (dW_i^2 - h),
            # with the TRUE Jacobian diagonal (exact for dense diffusions).
            diag = _diag_jacobian(g, t, y)
            y1 = jax.tree.map(
                lambda yi, gi, di, wi: yi + 0.5 * gi * di * (wi * wi - h),
                y1, gv, diag, dW,
            )
        return y1

    def interval(carry, t_pair):
        y, k_idx = carry
        t0, t1 = t_pair
        h = (t1 - t0) / spi
        sqrt_h = jnp.sqrt(jnp.abs(h))

        def sub(inner, j):
            yj, kj = inner
            keys = jax.random.split(jax.random.fold_in(key, kj), len(flat_y0))
            dW = treedef.unflatten([
                sqrt_h * jax.random.normal(kk, leaf.shape, leaf.dtype)
                for kk, leaf in zip(keys, jax.tree.leaves(yj))
            ])
            yj1 = em_substep(t0 + j.astype(h.dtype) * h, h, yj, dW)
            return (yj1, kj + 1), None

        (y1, k_idx), _ = lax.scan(sub, (y, k_idx), jnp.arange(spi))
        return (y1, k_idx), y1

    body = jax.checkpoint(interval) if checkpoint else interval
    _, ys_tail = lax.scan(body, (y0, jnp.asarray(0, jnp.int32)), (ts[:-1], ts[1:]))
    ys = jax.tree.map(lambda a, b: jnp.concatenate([a[None], b], 0), y0, ys_tail)
    if return_stats:
        n_steps = (ts.shape[0] - 1) * spi
        if method == "euler":
            per_step = 2  # f, g
        else:
            # f, g, plus one JVP (~2 g-evals) per trailing-dim basis vector
            diag_jvps = sum(
                (l.shape[-1] if getattr(l, "ndim", 0) else 1)
                for l in flat_y0)
            per_step = 2 + 2 * diag_jvps
        return ys, SolveStats(nfe=per_step * n_steps, n_steps=n_steps)
    return ys
