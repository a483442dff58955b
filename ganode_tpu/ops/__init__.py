"""Pallas TPU kernels for the hot paths."""
from .fused_gru import fused_gru_motion, reference_gru_motion
from .fused_rk4 import fused_rk4_motion, reference_rk4_motion

__all__ = [
    "fused_gru_motion",
    "fused_rk4_motion",
    "reference_gru_motion",
    "reference_rk4_motion",
]
