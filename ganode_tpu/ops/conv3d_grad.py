"""MXU-efficient input-gradient for the video discriminators' first conv.

Profiling (scripts/bench_dvid_layers.py on v5e) shows XLA's autodiff backward
for the discriminator's FIRST 3-D conv — kernel (4,4,4), strides (1,2,2),
padding (0,1,1), 3 input channels (reference models/mocogan.py:129-164 takes
n_channels=3 video input) — running at ~6 TFLOP/s: the data gradient is a
transposed conv whose GEMM has N = C_in = 3 output features, wasting 125 of
the MXU's 128 lanes, and it sits on the step's critical path (the G update
backpropagates through it; the WGAN-GP penalty differentiates through it
twice).

The fix keeps the arithmetic identical but splits the gradient's axes so each
piece hits a lowering XLA is already fast at:

  * spatial: ONE transposed 2-D conv whose output features are the folded
    (kt, ci) pairs (N = 4*C_in) — the same lowering the generator trunk's
    deconvs run at ~94% MFU;
  * time (k=4, stride 1, unpadded): dx[t] = sum_kt sp[t-kt, kt], four shifted
    zero-pads and adds, transpose-free because (kt, ci) is already the minor
    axis.

Measured on v5e at the UCF shapes (B=32, 16x64x64x3): 1.84 ms vs 2.85 ms for
the native gradient. Two denser refoldings (k=2 window fold and a k=3
all-parity fold + depth-to-space) were measured SLOWER — XLA materializes
their interleave intermediates, whose 3-wide minor axis wastes 125/128 vector
lanes; see git history of scripts/bench_dvid_layers.py runs.

Exposed as ``conv3d_first`` — a custom_vjp drop-in for the native conv whose
forward and weight gradient stay on XLA's (already fast) kernels and whose
data gradient uses the split form. The backward is itself built from
differentiable jax ops, so double-backward (the gradient penalty's
grad-of-grad) works through it.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_DN3 = ("NTHWC", "THWIO", "NTHWC")
_DN2 = ("NHWC", "HWIO", "NHWC")


def conv3d_s122(x, w):
    """Native forward: kernel (4,4,4), strides (1,2,2), padding (0,1,1)."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 2, 2), padding=((0, 0), (1, 1), (1, 1)),
        dimension_numbers=_DN3)


def conv3d_s122_dx_tfold(dy, w, t_in: int, h_in: int, w_in: int = None):
    """Data gradient of conv3d_s122: time taps folded into channels, spatial
    gradient left to XLA's native transposed-conv lowering.

    dy: (B, T', H/2, W/2, Co); returns dx (B, t_in, h_in, w_in, Ci).

    Requires EVEN h_in and w_in: the stride-2 transposed spatial conv
    reconstructs 2*floor((s-2)/2 + 1) rows, which equals s only when s is
    even (ADVICE r2). ``conv3d_first`` dispatches odd shapes to the native
    gradient instead of calling this.
    """
    if w_in is None:
        w_in = h_in
    if h_in % 2 or w_in % 2:
        raise ValueError(
            f"conv3d_s122_dx_tfold needs even spatial input, got "
            f"({h_in}, {w_in}); use the native conv gradient instead")
    B, tp, hm, wm, co = dy.shape
    kt_, _, _, ci, _ = w.shape
    # spatial fwd-conv kernel with (kt, ci) folded input features
    w_sp = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(4, 4, kt_ * ci, co)

    def g(x_sp):
        return jax.lax.conv_general_dilated(
            x_sp, w_sp, window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=_DN2)

    zeros = jnp.zeros((B * tp, 2 * hm, 2 * wm, kt_ * ci), dy.dtype)
    _, vjp = jax.vjp(g, zeros)
    (sp,) = vjp(dy.reshape(B * tp, hm, wm, co))   # (B*T', H, W, kt*Ci)
    sp = sp.reshape(B, tp, 2 * hm, 2 * wm, kt_, ci)

    # time combine: dx[t] = sum_kt sp[t - kt, kt]
    dx = sum(jnp.pad(sp[:, :, :, :, kt], ((0, 0), (kt, kt_ - 1 - kt),
                                          (0, 0), (0, 0), (0, 0)))
             for kt in range(kt_))
    return dx[:, :t_in, :h_in, :w_in, :]


@jax.custom_vjp
def _conv3d_first_fast(x, w):
    return conv3d_s122(x, w)


def _fwd(x, w):
    return conv3d_s122(x, w), (x, w)


def _bwd(res, dy):
    x, w = res
    dx = conv3d_s122_dx_tfold(dy, w, x.shape[1], x.shape[2], x.shape[3])
    # weight grad via XLA's own vjp (fast at these shapes)
    _, vjp = jax.vjp(lambda w_: conv3d_s122(x, w_), w)
    (dw,) = vjp(dy)
    return dx, dw


_conv3d_first_fast.defvjp(_fwd, _bwd)


def conv3d_first(x, w):
    """The video discriminators' first (4,4,4)/(1,2,2) conv with an MXU-folded
    data gradient. Forward and weight gradient are XLA-native; only the input
    gradient (the ~6 TFLOP/s pathology at small C_in) is rewritten.

    Odd H or W falls back to the fully-native conv (same values, XLA's own
    gradient): the folded reconstruction is only exact for even spatial sizes
    (ADVICE r2). Shapes are static under jit, so the dispatch costs nothing.
    """
    if x.shape[2] % 2 or x.shape[3] % 2:
        return conv3d_s122(x, w)
    return _conv3d_first_fast(x, w)
