"""TPU-tuned ops: Pallas kernels and MXU-folded gradients for the hot paths."""
from .conv3d_grad import (
    conv3d_first,
    conv3d_s122,
    conv3d_s122_dx_tfold,
)
from .fused_gru import fused_gru_motion, reference_gru_motion
from .fused_rk4 import fused_rk4_motion, reference_rk4_motion
from .quant import int8_trunk_apply, quantize_trunk

__all__ = [
    "conv3d_first",
    "conv3d_s122",
    "conv3d_s122_dx_tfold",
    "fused_gru_motion",
    "fused_rk4_motion",
    "int8_trunk_apply",
    "quantize_trunk",
    "reference_gru_motion",
    "reference_rk4_motion",
]
