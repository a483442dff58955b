"""Spectral normalization with explicit power-iteration state.

Rebuilds reference stage1/GResBlock.py:10-64: the weight is divided by its
largest singular value, estimated by power iteration on the (out, fan_in)
reshaped matrix; the u/v vectors persist across steps and are refreshed on
every training forward. In JAX the iteration state lives in a dedicated
``'spectral'`` variable collection (mutable during training, frozen at eval),
keeping the whole model a pure function of (params, spectral, inputs).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _l2norm(v, eps=1e-12):
    return v / (jnp.linalg.norm(v) + eps)


def spectral_normalize(w2d, u, n_iter: int = 1):
    """One (or more) power-iteration refinements; returns (sigma, u_new, v_new).

    ``w2d`` is (out, fan_in). Gradients do flow through sigma (as in the
    reference, which recomputes ``w / sigma`` inside the graph each forward) but
    not through the u/v iterates (they are treated as constants, matching the
    reference's ``.data`` updates).
    """
    w_ng = jax.lax.stop_gradient(w2d)
    for _ in range(n_iter):
        v = _l2norm(w_ng.T @ u)
        u = _l2norm(w_ng @ v)
    sigma = u @ (w2d @ v)
    return sigma, u, v


class SNConv(nn.Module):
    """Spectrally-normalized convolution (NHWC / NDHWC).

    kernel shape is flax's (kh, kw, in, out); the power iteration runs on the
    (out, kh*kw*in) matricization — the same matricization torch uses
    (out-first), so sigma estimates match the reference's.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] | int = 1
    padding: str | Sequence[Tuple[int, int]] = "SAME"
    use_bias: bool = True
    n_power_iterations: int = 1

    @nn.compact
    def __call__(self, x, *, update_stats: bool = True):
        ksize = tuple(self.kernel_size)
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), ksize + (in_ch, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None

        fan_in = in_ch
        for k in ksize:
            fan_in *= k
        w2d = jnp.moveaxis(kernel, -1, 0).reshape(self.features, fan_in)

        u_var = self.variable(
            "spectral", "u",
            lambda: _l2norm(jax.random.normal(self.make_rng("params"), (self.features,))),
        )
        sigma, u_new, _ = spectral_normalize(w2d, u_var.value, self.n_power_iterations)
        if update_stats and not self.is_initializing():
            u_var.value = u_new
        w_sn = kernel / sigma

        strides = self.strides if isinstance(self.strides, (tuple, list)) else (self.strides,) * len(ksize)
        padding = self.padding if isinstance(self.padding, str) else tuple(
            tuple(p) for p in self.padding)
        if (ksize == (4, 4, 4) and tuple(strides) == (1, 2, 2)
                and padding == ((0, 0), (1, 1), (1, 1)) and in_ch <= 16):
            # the video critic's first-layer geometry (few input channels —
            # where XLA's native input gradient wastes the MXU lanes): use the
            # MXU-folded input gradient (ops/conv3d_grad.py) — identical
            # arithmetic
            from ..ops import conv3d_first

            y = conv3d_first(x.astype(w_sn.dtype), w_sn)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(w_sn.dtype), w_sn,
                window_strides=tuple(strides),
                padding=padding,
                dimension_numbers=_dim_numbers(len(ksize)),
            )
        if bias is not None:
            y = y + bias
        return y


def _dim_numbers(ndim_spatial: int):
    if ndim_spatial == 2:
        return ("NHWC", "HWIO", "NHWC")
    if ndim_spatial == 3:
        return ("NDHWC", "DHWIO", "NDHWC")
    raise ValueError(f"unsupported spatial rank {ndim_spatial}")


class SNDense(nn.Module):
    """Spectrally-normalized dense layer."""

    features: int
    use_bias: bool = True
    n_power_iterations: int = 1

    @nn.compact
    def __call__(self, x, *, update_stats: bool = True):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        w2d = kernel.T  # (out, in)
        u_var = self.variable(
            "spectral", "u",
            lambda: _l2norm(jax.random.normal(self.make_rng("params"), (self.features,))),
        )
        sigma, u_new, _ = spectral_normalize(w2d, u_var.value, self.n_power_iterations)
        if update_stats and not self.is_initializing():
            u_var.value = u_new
        y = x.astype(kernel.dtype) @ (kernel / sigma)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y
