"""Differential-equation solver core: the layer the reference outsourced to
torchdiffeq / torchsde / torchcde, rebuilt as lax.scan / lax.while_loop steppers
over pytree state with checkpointed or continuous-adjoint backprop.
"""
from .adaptive import odeint_adaptive, odeint_adaptive_adjoint
from .adjoint import odeint_backsolve
from .cde import cdeint
from .sde import sdeint, sdeint_reversible_adjoint
from .solve import SolveStats, nfe_fixed_grid, odeint, odeint_final
from .spline import (
    CubicSpline,
    hermite_cubic_coefficients,
    linear_coefficients,
    natural_cubic_coefficients,
)

__all__ = [
    "CubicSpline",
    "SolveStats",
    "cdeint",
    "hermite_cubic_coefficients",
    "linear_coefficients",
    "natural_cubic_coefficients",
    "nfe_fixed_grid",
    "odeint",
    "odeint_adaptive",
    "odeint_adaptive_adjoint",
    "odeint_backsolve",
    "odeint_final",
    "sdeint",
    "sdeint_reversible_adjoint",
]
