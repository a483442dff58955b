"""Neural controlled differential equations: cdeint as an ODE reduction.

Replaces ``torchcde.cdeint`` (reference models/mocogan_cde.py:78). A CDE

    dz = f(t, z) dX(t)

with a differentiable control path X is solved as the ODE

    dz/dt = f(t, z) @ dX/dt

where ``f`` returns a matrix field of shape ``(..., hidden, input)`` and the spline
derivative has shape ``(..., input)``. The contraction is a batched matvec — MXU
work when the hidden dim is large, trivially fused by XLA when it is small.
"""
from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp

from .solve import odeint
from .spline import CubicSpline


def cdeint(
    X: CubicSpline,
    z0,
    func: Callable[..., Any],
    ts,
    args=None,
    *,
    method: str = "rk4",
    steps_per_interval: int = 1,
    checkpoint: bool = True,
    return_stats: bool = False,
):
    """Solve dz = f(t, z) dX over output grid ``ts``.

    Args:
      X: control path (a :class:`~ganode_tpu.ode.spline.CubicSpline`).
      z0: initial hidden state ``(..., hidden)``.
      func: matrix vector field ``(t, z[, args]) -> (..., hidden, input)``.
      ts: output times.
      method / steps_per_interval / checkpoint: forwarded to the ODE solver.

    Returns z trajectory ``(T, ..., hidden)`` (and stats if requested).
    """
    f = (lambda t, z: func(t, z)) if args is None else (lambda t, z: func(t, z, args))

    def rhs(t, z):
        mat = f(t, z)                       # (..., hidden, input)
        dX = X.derivative(t)                # (..., input)
        return jnp.einsum("...hi,...i->...h", mat, dX)

    return odeint(
        rhs, z0, ts,
        method=method,
        steps_per_interval=steps_per_interval,
        checkpoint=checkpoint,
        return_stats=return_stats,
    )
