"""Cubic-spline control paths for neural CDEs.

Replaces ``torchcde.hermite_cubic_coefficients_with_backward_differences`` +
``torchcde.CubicSpline`` (used by the reference at models/mocogan_cde.py:74-78).
Semantics matched:

* ``hermite_cubic_coefficients`` takes a path ``x`` of shape ``(..., T, C)`` sampled
  at times ``t`` (default ``arange(T)``) and fits a C^1 piecewise cubic whose nodal
  derivatives are *backward differences*: d_i = (x_i - x_{i-1}) / (t_i - t_{i-1}),
  with the forward difference used at i=0. This is torchcde's recommended scheme
  because the spline through point i depends only on the past — causality preserved.
* :class:`CubicSpline` evaluates values and derivatives at arbitrary times, with
  constant extrapolation of the boundary polynomial outside ``[t[0], t[-1]]``.
* ``natural_cubic_coefficients`` (torchcde's other interpolation mode) fits the
  classical natural cubic spline (second derivative zero at both ends) by solving
  the tridiagonal system directly — T is small (video length), so a dense solve is
  cheaper than a sequential Thomas scan on TPU.

Everything is shape-static and jit/vmap friendly; interval lookup is a
``searchsorted`` over the (sorted) knot vector.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CubicSpline:
    """Piecewise cubic p_i(u) = a_i + b_i u + c_i u^2 + d_i u^3, u = t - knots[i].

    Coefficient arrays have shape ``(..., T-1, C)``; ``knots`` has shape ``(T,)``.
    """

    knots: Any
    a: Any
    b: Any
    c: Any
    d: Any

    @property
    def interval(self):
        return self.knots[0], self.knots[-1]

    def _locate(self, t):
        idx = jnp.searchsorted(self.knots, t, side="right") - 1
        idx = jnp.clip(idx, 0, self.knots.shape[0] - 2)
        return idx, t - self.knots[idx]

    def evaluate(self, t):
        """Value of the spline at scalar time ``t`` -> shape ``(..., C)``."""
        idx, u = self._locate(t)
        take = lambda arr: jnp.take(arr, idx, axis=-2)
        return take(self.a) + u * (take(self.b) + u * (take(self.c) + u * take(self.d)))

    def derivative(self, t):
        """dX/dt at scalar time ``t`` -> shape ``(..., C)``."""
        idx, u = self._locate(t)
        take = lambda arr: jnp.take(arr, idx, axis=-2)
        return take(self.b) + u * (2.0 * take(self.c) + u * 3.0 * take(self.d))

    def evaluate_batch(self, ts):
        return jax.vmap(self.evaluate, out_axes=-2)(ts)

    # pytree plumbing so splines can cross jit/scan boundaries
    def tree_flatten(self):
        return (self.knots, self.a, self.b, self.c, self.d), None

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(*children)


def _hermite_from_derivs(x, derivs, t):
    """Per-interval cubic coefficients from nodal values and derivatives."""
    h = t[1:] - t[:-1]                                 # (T-1,)
    shape = (1,) * (x.ndim - 2) + (-1, 1)
    h = h.reshape(shape)
    x0 = x[..., :-1, :]
    x1 = x[..., 1:, :]
    d0 = derivs[..., :-1, :]
    d1 = derivs[..., 1:, :]
    delta = (x1 - x0) / h
    a = x0
    b = d0
    c = (3.0 * delta - 2.0 * d0 - d1) / h
    d = (d0 + d1 - 2.0 * delta) / (h * h)
    return a, b, c, d


def hermite_cubic_coefficients(x, t=None) -> CubicSpline:
    """Hermite cubic spline with backward-difference derivatives.

    Matches ``torchcde.hermite_cubic_coefficients_with_backward_differences``:
    nodal derivative at i>0 is the backward difference over [t_{i-1}, t_i]; at i=0
    the forward difference over [t_0, t_1].
    """
    x = jnp.asarray(x)
    if t is None:
        t = jnp.arange(x.shape[-2], dtype=x.dtype)
    t = jnp.asarray(t, dtype=x.dtype)
    shape = (1,) * (x.ndim - 2) + (-1, 1)
    dt = (t[1:] - t[:-1]).reshape(shape)
    diffs = (x[..., 1:, :] - x[..., :-1, :]) / dt
    derivs = jnp.concatenate([diffs[..., :1, :], diffs], axis=-2)
    a, b, c, d = _hermite_from_derivs(x, derivs, t)
    return CubicSpline(knots=t, a=a, b=b, c=c, d=d)


def linear_coefficients(x, t=None) -> CubicSpline:
    """Piecewise-linear control path (torchcde.linear_interpolation_coeffs analog)."""
    x = jnp.asarray(x)
    if t is None:
        t = jnp.arange(x.shape[-2], dtype=x.dtype)
    t = jnp.asarray(t, dtype=x.dtype)
    shape = (1,) * (x.ndim - 2) + (-1, 1)
    dt = (t[1:] - t[:-1]).reshape(shape)
    b = (x[..., 1:, :] - x[..., :-1, :]) / dt
    a = x[..., :-1, :]
    z = jnp.zeros_like(a)
    return CubicSpline(knots=t, a=a, b=b, c=z, d=z)


def natural_cubic_coefficients(x, t=None) -> CubicSpline:
    """Natural cubic spline (zero second derivative at both boundaries).

    Solves the standard tridiagonal moment system densely — T (the number of knots)
    is the video length here, so a batched ``linalg.solve`` on a (T, T) system maps
    better onto the MXU than a sequential Thomas recurrence would onto the VPU.
    """
    x = jnp.asarray(x)
    if t is None:
        t = jnp.arange(x.shape[-2], dtype=x.dtype)
    t = jnp.asarray(t, dtype=x.dtype)
    n = x.shape[-2]
    h = t[1:] - t[:-1]                                  # (T-1,)

    # Moment system A m = rhs for second derivatives m (natural: m_0 = m_{n-1} = 0).
    main = jnp.concatenate([jnp.ones((1,), x.dtype), 2.0 * (h[:-1] + h[1:]),
                            jnp.ones((1,), x.dtype)])
    lower = jnp.concatenate([h[:-1], jnp.zeros((1,), x.dtype)])
    upper = jnp.concatenate([jnp.zeros((1,), x.dtype), h[1:]])
    A = jnp.diag(main) + jnp.diag(lower, -1) + jnp.diag(upper, 1)

    shape = (1,) * (x.ndim - 2) + (-1, 1)
    hh = h.reshape(shape)
    slope = (x[..., 1:, :] - x[..., :-1, :]) / hh
    rhs_mid = 6.0 * (slope[..., 1:, :] - slope[..., :-1, :])
    zeros = jnp.zeros(x.shape[:-2] + (1, x.shape[-1]), x.dtype)
    rhs = jnp.concatenate([zeros, rhs_mid, zeros], axis=-2)

    flat = rhs.reshape((-1, n, x.shape[-1]))
    m = jax.vmap(lambda r: jnp.linalg.solve(A, r))(flat).reshape(rhs.shape)

    m0 = m[..., :-1, :]
    m1 = m[..., 1:, :]
    x0 = x[..., :-1, :]
    x1 = x[..., 1:, :]
    a = x0
    b = (x1 - x0) / hh - hh * (2.0 * m0 + m1) / 6.0
    c = m0 / 2.0
    d = (m1 - m0) / (6.0 * hh)
    return CubicSpline(knots=t, a=a, b=b, c=c, d=d)
