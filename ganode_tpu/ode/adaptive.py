"""Adaptive Dormand-Prince 5(4) with a PI step-size controller, under jit.

This is *new capability* relative to the reference (which only ever used fixed-grid
rk4 / euler via torchdiffeq); the north-star WGAN-GP @ 128x128 config calls for an
adaptive solver. Design for XLA:

* The forward solve is a bounded ``lax.while_loop`` per output interval, nested in a
  ``lax.scan`` over the output grid — no data-dependent Python control flow, static
  shapes throughout. Steps are clipped to land exactly on output times (T is small
  for video latents, so clipping beats dense-output interpolation in both code and
  compute).
* FSAL (first-same-as-last) reuse: an accepted dopri5 step costs 6 new RHS
  evaluations, a rejected one costs 6 as well (the 7th is reused on accept).
* ``lax.while_loop`` is not reverse-differentiable, so gradients flow through the
  continuous adjoint: :func:`odeint_adaptive_adjoint` wraps the forward solve in a
  ``jax.custom_vjp`` whose backward pass is itself an adaptive solve of the
  augmented adjoint system in reverse time (restarting from saved output states).
* NFE / accept / reject counters are carried and returned as ``SolveStats`` — they
  are runtime values here, unlike the static fixed-grid counts.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from . import tableaus as tb
from .solve import SolveStats, rk_step
from .tree import tree_lincomb, tree_zeros_like


class _Controller(NamedTuple):
    rtol: float
    atol: float
    safety: float
    factor_min: float
    factor_max: float
    # PI exponents (Hairer II.4): h *= safety * err^-beta1 * prev_err^beta2
    beta1: float
    beta2: float
    max_steps: int


def _error_norm(y0, y1, y_err, rtol, atol):
    total, count = 0.0, 0
    for e, a, b in zip(jax.tree.leaves(y_err), jax.tree.leaves(y0), jax.tree.leaves(y1)):
        scale = atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(b))
        total = total + jnp.sum(jnp.square(e / scale))
        count += e.size
    return jnp.sqrt(total / count)


def _initial_step(f, t0, y0, order, rtol, atol):
    """Hairer's starting-step heuristic (Solving ODEs I, II.4), simplified."""
    f0 = f(t0, y0)
    def rms(tree, ref):
        total, count = 0.0, 0
        for x, r in zip(jax.tree.leaves(tree), jax.tree.leaves(ref)):
            scale = atol + rtol * jnp.abs(r)
            total = total + jnp.sum(jnp.square(x / scale))
            count += x.size
        return jnp.sqrt(total / count)
    d0 = rms(y0, y0)
    d1 = rms(f0, y0)
    h0 = jnp.where(jnp.minimum(d0, d1) < 1e-5, 1e-6, 0.01 * d0 / jnp.maximum(d1, 1e-12))
    y1 = tree_lincomb([h0], [f0], base=y0)
    f1 = f(t0 + h0, y1)
    d2 = rms(jax.tree.map(jnp.subtract, f1, f0), y0) / h0
    h1 = jnp.where(
        jnp.maximum(d1, d2) <= 1e-15,
        jnp.maximum(1e-6, h0 * 1e-3),
        (0.01 / jnp.maximum(d1, d2)) ** (1.0 / (order + 1.0)),
    )
    return jnp.minimum(100.0 * h0, h1), f0


def odeint_adaptive(
    func: Callable[..., Any],
    y0,
    ts,
    args=None,
    *,
    rtol: float = 1e-5,
    atol: float = 1e-6,
    safety: float = 0.9,
    factor_min: float = 0.2,
    factor_max: float = 10.0,
    beta1: float = 0.7 / 5.0,
    beta2: float = 0.4 / 5.0,
    max_steps: int = 4096,
    return_stats: bool = False,
):
    """Adaptive dopri5 solve over output grid ``ts`` (forward-only; for gradients
    use :func:`odeint_adaptive_adjoint` or a fixed-grid solver).
    """
    ctrl = _Controller(rtol, atol, safety, factor_min, factor_max, beta1, beta2, max_steps)
    f = (lambda t, y: func(t, y)) if args is None else (lambda t, y: func(t, y, args))
    return _solve(f, y0, jnp.asarray(ts), ctrl, return_stats)


def _solve(f, y0, ts, ctrl: _Controller, return_stats: bool):
    tableau = tb.DOPRI5
    t0 = ts[0]
    h_init, f0 = _initial_step(f, t0, y0, tableau.order, ctrl.rtol, ctrl.atol)
    direction = jnp.sign(ts[-1] - ts[0])
    h_init = h_init * direction

    def attempt(t, y, fsal, h):
        """One dopri5 attempt; returns candidate state, error norm, last stage."""
        y1, ks = rk_step(tableau, f, t, h, y, f0=fsal)
        err_coeffs = [h * e for e in tableau.b_err]
        y_err = tree_lincomb(err_coeffs, ks)
        err = _error_norm(y, y1, y_err, ctrl.rtol, ctrl.atol)
        return y1, err, ks[-1]

    def solve_interval(carry, t_target):
        t, y, fsal, h, prev_err, nfe, nacc, nrej, steps = carry

        def cond(st):
            t_, *_rest, steps_ = st
            return jnp.logical_and(direction * (t_target - t_) > 1e-12,
                                   steps_ < ctrl.max_steps)

        def body(st):
            t_, y_, fsal_, h_, prev_err_, nfe_, nacc_, nrej_, steps_ = st
            # clip the step so we land exactly on the output time
            h_clip = jnp.where(
                direction * (t_ + h_ - t_target) > 0, t_target - t_, h_
            )
            y1, err, k_last = attempt(t_, y_, fsal_, h_clip)
            accept = err <= 1.0
            err_c = jnp.maximum(err, 1e-10)
            prev_c = jnp.maximum(prev_err_, 1e-10)
            factor = ctrl.safety * err_c ** (-ctrl.beta1) * prev_c ** (ctrl.beta2)
            factor = jnp.clip(factor, ctrl.factor_min, ctrl.factor_max)
            # Controller acts on the attempted (possibly clipped) step, but an
            # ACCEPTED attempt that was only short because it was clipped to
            # the output time must not shrink the carried step to the interval
            # width — dense output grids would otherwise pay extra NFE on every
            # landing. Keep at least the unclipped proposal in that case.
            was_clipped = jnp.abs(h_clip) < jnp.abs(h_)
            h_next_mag = jnp.abs(h_clip) * factor
            h_next_mag = jnp.where(jnp.logical_and(accept, was_clipped),
                                   jnp.maximum(h_next_mag, jnp.abs(h_)),
                                   h_next_mag)
            h_next = direction * h_next_mag
            t_new = jnp.where(accept, t_ + h_clip, t_)
            y_new = jax.tree.map(lambda a, b: jnp.where(accept, a, b), y1, y_)
            fsal_new = jax.tree.map(lambda a, b: jnp.where(accept, a, b), k_last, fsal_)
            prev_new = jnp.where(accept, err_c, prev_err_)
            return (
                t_new, y_new, fsal_new, h_next, prev_new,
                nfe_ + 6,  # 6 fresh evals per attempt (FSAL supplies the 7th)
                nacc_ + accept.astype(jnp.int32),
                nrej_ + (1 - accept.astype(jnp.int32)),
                steps_ + 1,
            )

        st = lax.while_loop(cond, body, (t, y, fsal, h, prev_err, nfe, nacc, nrej, steps))
        t, y, fsal, h, prev_err, nfe, nacc, nrej, steps_used = st
        # flag silent truncation: reaching max_steps without landing on t_target
        exhausted = jnp.logical_and(steps_used >= ctrl.max_steps,
                                    direction * (t_target - t) > 1e-12)
        return (t, y, fsal, h, prev_err, nfe, nacc, nrej, jnp.asarray(0, jnp.int32)), (y, exhausted)

    init = (
        t0, y0, f0, h_init, jnp.asarray(1.0, jnp.result_type(float)),
        jnp.asarray(2, jnp.int32),  # _initial_step used 2 evals; fsal covers stage 1
        jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
    )
    carry, (ys_tail, exhausted) = lax.scan(solve_interval, init, ts[1:])
    ys = jax.tree.map(lambda a, b: jnp.concatenate([a[None], b], 0), y0, ys_tail)
    if return_stats:
        _, _, _, _, _, nfe, nacc, nrej, _ = carry
        return ys, SolveStats(nfe=nfe, n_steps=nacc, n_rejected=nrej,
                              steps_exhausted=jnp.any(exhausted))
    return ys


@partial(jax.custom_vjp, nondiff_argnums=(0, 4, 5))
def odeint_adaptive_adjoint(func, y0, ts, args, rtol: float = 1e-5, atol: float = 1e-6):
    """Adaptive dopri5 with continuous-adjoint gradients.

    ``func(t, y, args) -> dy``. The backward pass adaptively integrates the
    augmented system (state + state-adjoint + parameter-adjoint) in reverse time,
    restarting each output interval from the saved forward states. Gradients w.r.t.
    ``ts`` are zeros (the model families here never differentiate the time grid).
    """
    return odeint_adaptive(func, y0, ts, args, rtol=rtol, atol=atol)


def _adj_fwd(func, y0, ts, args, rtol, atol):
    ys = odeint_adaptive(func, y0, ts, args, rtol=rtol, atol=atol)
    return ys, (ys, jnp.asarray(ts), args)


def _adj_bwd(func, rtol, atol, residuals, g):
    ys, ts, args = residuals

    def aug_dyn(t, aug):
        y, a, _ = aug
        f_val, vjp_fn = jax.vjp(lambda y_, th: func(t, y_, th), y, args)
        va, vth = vjp_fn(a)
        return (f_val, jax.tree.map(jnp.negative, va), jax.tree.map(jnp.negative, vth))

    a_T = jax.tree.map(lambda gl: gl[-1], g)
    a_args0 = tree_zeros_like(args)

    ys_rev = jax.tree.map(lambda l: l[1:][::-1], ys)
    t_hi = ts[1:][::-1]
    t_lo = ts[:-1][::-1]
    g_rev = jax.tree.map(lambda l: l[:-1][::-1], g)

    def interval(carry, xs):
        a, a_args = carry
        y_i, t1, t0, g_lo = xs
        aug0 = (y_i, a, a_args)
        segment = jnp.stack([t1, t0])
        out = odeint_adaptive(lambda t, x: aug_dyn(t, x), aug0, segment,
                              rtol=rtol, atol=atol)
        _, a, a_args = jax.tree.map(lambda l: l[-1], out)
        a = jax.tree.map(jnp.add, a, g_lo)
        return (a, a_args), None

    (a_0, a_args), _ = lax.scan(interval, (a_T, a_args0), (ys_rev, t_hi, t_lo, g_rev))
    return a_0, jnp.zeros_like(ts), a_args


odeint_adaptive_adjoint.defvjp(_adj_fwd, _adj_bwd)
