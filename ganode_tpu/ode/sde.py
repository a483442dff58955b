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
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax

from .solve import SolveStats
from .tree import tree_zeros_like


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


def _draw_dW(key, k, y, sqrt_h):
    """Brownian increment for global substep ``k``: a pure function of
    ``(key, k)``, one independent channel per state element (diagonal noise).
    Forward and backward passes call this with the same indices, so the
    reversible backward sweep replays the exact path with no storage."""
    flat, treedef = jax.tree.flatten(y)
    keys = jax.random.split(jax.random.fold_in(key, k), len(flat))
    return treedef.unflatten([
        sqrt_h * jax.random.normal(kk, leaf.shape, leaf.dtype)
        for kk, leaf in zip(keys, flat)])


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


def _reversible_heun_scan(f, g, y0, ts, key, spi, checkpoint_intervals):
    """Forward pass of the reversible Heun scheme (Kidger, Foster, Li & Lyons,
    "Efficient and Accurate Gradients for Neural SDEs", arXiv:2105.13493):

        yhat_{n+1} = 2 y_n - yhat_n + h f(t_n, yhat_n) + g(t_n, yhat_n) dW_n
        y_{n+1}    = y_n + h/2 [f(t_n, yhat_n) + f(t_{n+1}, yhat_{n+1})]
                         + dW_n/2 [g(t_n, yhat_n) + g(t_{n+1}, yhat_{n+1})]

    Carrying (f, g) at yhat_n forward costs ONE drift + ONE diffusion eval per
    substep — the same as Euler-Maruyama — while converging to the
    Stratonovich solution at strong order 0.5 (1.0 for additive noise, where
    Ito and Stratonovich coincide — the motion sampler's learned dynamics are
    reparametrization-invariant either way). The pair (y, yhat) makes the step
    algebraically invertible, which `sdeint_reversible_adjoint` exploits.

    Returns ``(ys, (y_N, yhat_N))`` — the stacked interval-boundary states and
    the final pair the reversible backward sweep starts from.
    """
    fh0, gh0 = f(ts[0], y0), g(ts[0], y0)

    def interval(carry, t_pair):
        t0, t1 = t_pair
        h = (t1 - t0) / spi
        sqrt_h = jnp.sqrt(jnp.abs(h))

        def sub(c, j):
            y, yhat, fh, gh, k = c
            dW = _draw_dW(key, k, y, sqrt_h)
            yhat1 = jax.tree.map(
                lambda yi, yh, fi, gi, wi: 2 * yi - yh + h * fi + gi * wi,
                y, yhat, fh, gh, dW)
            t_next = t0 + (j + 1).astype(h.dtype) * h
            fh1, gh1 = f(t_next, yhat1), g(t_next, yhat1)
            y1 = jax.tree.map(
                lambda yi, fa, fb, ga, gb, wi:
                    yi + (h / 2) * (fa + fb) + (wi / 2) * (ga + gb),
                y, fh, fh1, gh, gh1, dW)
            return (y1, yhat1, fh1, gh1, k + 1), None

        carry, _ = lax.scan(sub, carry, jnp.arange(spi))
        return carry, carry[0]

    body = jax.checkpoint(interval) if checkpoint_intervals else interval
    init = (y0, y0, fh0, gh0, jnp.asarray(0, jnp.int32))
    (y_n, yhat_n, _, _, _), ys_tail = lax.scan(body, init, (ts[:-1], ts[1:]))
    ys = jax.tree.map(lambda a, b: jnp.concatenate([a[None], b], 0), y0, ys_tail)
    return ys, (y_n, yhat_n)


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
    if method not in ("euler", "milstein", "reversible_heun"):
        raise ValueError(f"unknown SDE method {method!r}")

    f = (lambda t, y: drift(t, y)) if args is None else (lambda t, y: drift(t, y, args))
    g = (lambda t, y: diffusion(t, y)) if args is None else (lambda t, y: diffusion(t, y, args))

    # substep count is host-side and static: compute it from the RAW ts before
    # any jnp conversion (jax 0.9 tracing lifts converted constants to tracers)
    spi = _substeps(ts, dt)
    ts = jnp.asarray(ts)
    flat_y0, treedef = jax.tree.flatten(y0)

    if method == "reversible_heun":
        ys, _ = _reversible_heun_scan(f, g, y0, ts, key, spi, checkpoint)
        if return_stats:
            n_steps = (ts.shape[0] - 1) * spi
            # one f + one g per substep (carried evals), plus the initial pair
            return ys, SolveStats(nfe=2 * (n_steps + 1), n_steps=n_steps)
        return ys

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
            dW = _draw_dW(key, kj, yj, sqrt_h)
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


def sdeint_reversible_adjoint(
    drift: Callable[..., Any],
    diffusion: Callable[..., Any],
    y0,
    ts,
    key,
    args=None,
    *,
    dt: float | None = None,
    return_stats: bool = False,
):
    """Reversible-Heun solve with an O(1)-memory, trajectory-exact adjoint.

    The capability the reference outsourced to ``torchsde.sdeint_adjoint``
    (reference models/mocogan_sde.py:4,57-59), upgraded per Kidger, Foster,
    Li & Lyons, "Efficient and Accurate Gradients for Neural SDEs"
    (arXiv:2105.13493, PAPERS.md): because the reversible Heun pair update is
    algebraically invertible,

        yhat_n = 2 y_{n+1} - yhat_{n+1} - h f(t_{n+1}, yhat_{n+1})
                                        - g(t_{n+1}, yhat_{n+1}) dW_n
        y_n    = y_{n+1} - h/2 [f(t_n, yhat_n) + f(t_{n+1}, yhat_{n+1})]
                         - dW_n/2 [g(t_n, yhat_n) + g(t_{n+1}, yhat_{n+1})],

    the backward pass RECONSTRUCTS the forward trajectory step by step instead
    of storing or re-integrating it: no activation storage (unlike backprop
    through the scan), no O(h)-error state re-integration (unlike the
    continuous backsolve adjoint torchsde uses — its reconstructed state
    drifts from the forward path, biasing gradients). Brownian increments are
    regenerated from ``(key, substep index)``, so the reverse sweep replays
    the exact path with no Brownian tree. Gradients are the exact discrete
    adjoint of the scheme, up to float rounding in the state reconstruction.

    Same contract as :func:`sdeint` (diagonal noise, ``ts`` output grid,
    ``dt``-bounded substeps); differentiable in ``y0`` and ``args``;
    ``ts``/``key`` are not differentiated. Select in the SDE motion sampler
    with ``motion_method='reversible_heun_adjoint'``.
    """
    spi = _substeps(ts, dt)
    if args is None:
        fcall = lambda t, y, th: drift(t, y)          # noqa: E731
        gcall = lambda t, y, th: diffusion(t, y)      # noqa: E731
    else:
        fcall = lambda t, y, th: drift(t, y, th)      # noqa: E731
        gcall = lambda t, y, th: diffusion(t, y, th)  # noqa: E731
    ts_arr = jnp.asarray(ts)
    ys = _rev_heun_solve(fcall, gcall, spi, y0, args, ts_arr, key)
    if return_stats:
        n_steps = (ts_arr.shape[0] - 1) * spi
        return ys, SolveStats(nfe=2 * (n_steps + 1), n_steps=n_steps)
    return ys


# Module-level custom_vjp in the same shape as ode.adjoint.odeint_backsolve:
# the vector fields ride in nondiff_argnums and every traced value (y0, params,
# ts, key) is an explicit argument — a per-call `@jax.custom_vjp` closure over
# traced values breaks under grad-of-jit linearization (the captured tracer is
# lowered as an IR constant).
@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _rev_heun_solve(fcall, gcall, spi, y0, th, ts, key):
    ys, _ = _reversible_heun_scan(
        lambda t, y: fcall(t, y, th), lambda t, y: gcall(t, y, th),
        y0, ts, key, spi, False)
    return ys


def _rev_heun_fwd(fcall, gcall, spi, y0, th, ts, key):
    ys, (y_n, yhat_n) = _reversible_heun_scan(
        lambda t, y: fcall(t, y, th), lambda t, y: gcall(t, y, th),
        y0, ts, key, spi, False)
    return ys, (y_n, yhat_n, th, ts, key)


def _rev_heun_bwd(fcall, gcall, spi, res, gbar):
    y_n, yhat_n, th, ts, key_r = res
    n = ts.shape[0]
    ybar = jax.tree.map(lambda l: l[-1], gbar)
    yhatbar = tree_zeros_like(y_n)
    thbar = tree_zeros_like(th)
    t_hi = ts[1:][::-1]                              # ts[n-1] .. ts[1]
    t_lo = ts[:-1][::-1]                             # ts[n-2] .. ts[0]
    g_lo = jax.tree.map(lambda l: l[:-1][::-1], gbar)

    def interval(carry, xs):
        y1, yhat1, ybar, yhatbar, thbar, k = carry
        t1, t0, glo = xs
        h = (t1 - t0) / spi
        sqrt_h = jnp.sqrt(jnp.abs(h))

        def sub(c, j):
            y1, yhat1, ybar, yhatbar, thbar, k = c
            m = k - 1
            t_m = t0 + j.astype(h.dtype) * h
            dW = _draw_dW(key_r, m, y1, sqrt_h)
            # algebraic inverse: recover the pre-step states exactly
            f1 = fcall(t_m + h, yhat1, th)
            g1 = gcall(t_m + h, yhat1, th)
            yhat0 = jax.tree.map(
                lambda yi, yh, fi, gi, wi: 2 * yi - yh - h * fi - gi * wi,
                y1, yhat1, f1, g1, dW)
            f0 = fcall(t_m, yhat0, th)
            g0 = gcall(t_m, yhat0, th)
            y0_ = jax.tree.map(
                lambda yi, fa, fb, ga, gb, wi:
                    yi - (h / 2) * (fa + fb) - (wi / 2) * (ga + gb),
                y1, f0, f1, g0, g1, dW)

            def stepfn(y, yhat, theta):
                fa = fcall(t_m, yhat, theta)
                ga = gcall(t_m, yhat, theta)
                yh1 = jax.tree.map(
                    lambda yi, yh, fi, gi, wi:
                        2 * yi - yh + h * fi + gi * wi,
                    y, yhat, fa, ga, dW)
                fb = fcall(t_m + h, yh1, theta)
                gb = gcall(t_m + h, yh1, theta)
                yn1 = jax.tree.map(
                    lambda yi, fx, fy, gx, gy, wi:
                        yi + (h / 2) * (fx + fy) + (wi / 2) * (gx + gy),
                    y, fa, fb, ga, gb, dW)
                return yn1, yh1

            _, vjp_fn = jax.vjp(stepfn, y0_, yhat0, th)
            dy, dyhat, dth = vjp_fn((ybar, yhatbar))
            thbar1 = jax.tree.map(jnp.add, thbar, dth)
            return (y0_, yhat0, dy, dyhat, thbar1, m), None

        c, _ = lax.scan(sub, (y1, yhat1, ybar, yhatbar, thbar, k),
                        jnp.arange(spi - 1, -1, -1))
        y1, yhat1, ybar, yhatbar, thbar, k = c
        # the forward emitted y at this boundary: add its output cotangent
        ybar = jax.tree.map(jnp.add, ybar, glo)
        return (y1, yhat1, ybar, yhatbar, thbar, k), None

    k_total = jnp.asarray((n - 1) * spi, jnp.int32)
    body = jax.checkpoint(interval)
    (_, _, ybar, yhatbar, thbar, _), _ = lax.scan(
        body, (y_n, yhat_n, ybar, yhatbar, thbar, k_total),
        (t_hi, t_lo, g_lo))
    # y0 seeds BOTH slots of the pair (yhat_0 = y_0)
    y0bar = jax.tree.map(jnp.add, ybar, yhatbar)
    import numpy as _np

    key_zero = _np.zeros(_np.shape(key_r), jax.dtypes.float0)
    return y0bar, thbar, jnp.zeros_like(ts), key_zero


_rev_heun_solve.defvjp(_rev_heun_fwd, _rev_heun_bwd)
