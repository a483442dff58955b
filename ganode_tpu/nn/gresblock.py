"""BigGAN/DVD-GAN-style residual blocks and their continuous-depth ODE variant.

Rebuilds reference stage1/GResBlock.py:90-167 (CBN -> act -> upsample -> SN-conv
-> CBN -> act -> SN-conv with a 1x1 SN skip projection; time folded into batch so
each frame proceeds independently) and the stage-1 notebook's ODE upsampling block
(Conv2dODE / ODEFunc / ODEBlock, reference stage1/stage_1_ODE_block.ipynb cells
6-9): the residual pair is replaced by an ODE flow in zero-augmented channel space
(ANODE-style), with the conv input scaled by integration time t.

Everything is NHWC. The ODE vector field is built from raw conv kernels (not
submodule calls) so it can run inside the solver's ``lax.scan`` without lifted
transforms; its conditional norm is *stateless* (per-evaluation batch statistics,
which is exactly what train-mode BatchNorm computes inside the reference's func).
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ode import odeint_final
from .norm import ConditionalNorm
from .spectral import SNConv, spectral_normalize, _l2norm


def _upsample_nearest(x, factor: int):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * factor, w * factor, c), method="nearest")


def _avg_pool(x, factor: int):
    return nn.avg_pool(x, (factor, factor), strides=(factor, factor))


class GResBlock(nn.Module):
    """Up/down residual block with spectral norm and conditional BN.

    Input: (B*T, H, W, C_in), condition (B*T, n_condition). Output spatially
    scaled by upsample_factor / downsample_factor with C_out channels.
    """

    out_channels: int
    kernel_size: Sequence[int] = (3, 3)
    n_condition: int = 96
    use_bn: bool = True
    activation: Callable = nn.relu
    upsample_factor: int = 2
    downsample_factor: int = 1

    @nn.compact
    def __call__(self, x, condition=None, *, train: bool = True):
        up = self.upsample_factor if self.downsample_factor == 1 else 1
        down = self.downsample_factor
        bn = self.use_bn and down == 1

        out = x
        if bn:
            out = ConditionalNorm(x.shape[-1])(out, condition, train=train)
        out = self.activation(out)
        if up != 1:
            out = _upsample_nearest(out, up)
        out = SNConv(self.out_channels, self.kernel_size, padding=((1, 1), (1, 1)))(
            out, update_stats=train)
        if bn:
            out = ConditionalNorm(self.out_channels)(out, condition, train=train)
        out = self.activation(out)
        out = SNConv(self.out_channels, self.kernel_size, padding=((1, 1), (1, 1)))(
            out, update_stats=train)
        if down != 1:
            out = _avg_pool(out, down)

        skip = x
        if up != 1:
            skip = _upsample_nearest(skip, up)
        skip = SNConv(self.out_channels, (1, 1), padding="VALID")(skip, update_stats=train)
        if down != 1:
            skip = _avg_pool(skip, down)
        return out + skip


def _stateless_cbn(x, gamma, beta, eps=1e-5):
    """Conditional norm from current-batch statistics (no running state) — what
    train-mode BN computes inside an ODE vector field."""
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x, axes, keepdims=True)
    var = jnp.var(x, axes, keepdims=True)
    h = (x - mean) * jax.lax.rsqrt(var + eps)
    spatial = (1,) * (x.ndim - 2)
    return gamma.reshape(gamma.shape[0], *spatial, -1) * h + \
        beta.reshape(beta.shape[0], *spatial, -1)


class Conv2dODEField(nn.Module):
    """The vector field of the continuous-depth block: two t-scaled SN convs with a
    conditional norm between them (reference notebook ODEFunc, cell 7).

    f(t, y) = SNconv1(t * relu(CBN(SNconv0(t * y), cond)))
    """

    channels: int
    n_condition: int = 96
    activation: Callable = nn.relu

    def setup(self):
        c = self.channels
        init = nn.initializers.lecun_normal()
        self.k0 = self.param("k0", init, (3, 3, c, c))
        self.b0 = self.param("b0", nn.initializers.zeros, (c,))
        self.k1 = self.param("k1", init, (3, 3, c, c))
        self.b1 = self.param("b1", nn.initializers.zeros, (c,))
        self.embed_gamma = self.param("embed_gamma", nn.initializers.normal(0.02),
                                      (self.n_condition, c))
        self.embed_gamma_b = self.param("embed_gamma_b", nn.initializers.ones, (c,))
        self.embed_beta = self.param("embed_beta", nn.initializers.zeros,
                                     (self.n_condition, c))

    def normalized_kernels(self, u0, u1, n_iter: int = 1):
        c = self.channels
        w0 = jnp.moveaxis(self.k0, -1, 0).reshape(c, -1)
        w1 = jnp.moveaxis(self.k1, -1, 0).reshape(c, -1)
        s0, u0n, _ = spectral_normalize(w0, u0, n_iter)
        s1, u1n, _ = spectral_normalize(w1, u1, n_iter)
        return self.k0 / s0, self.k1 / s1, u0n, u1n

    def rhs(self, t, y, condition, k0n, k1n):
        conv = lambda z, k, b: jax.lax.conv_general_dilated(
            z, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        out = conv(y * t, k0n, self.b0)
        gamma = condition @ self.embed_gamma + self.embed_gamma_b
        beta = condition @ self.embed_beta
        out = _stateless_cbn(out, gamma, beta)
        out = self.activation(out)
        out = conv(out * t, k1n, self.b1)
        return out


class ODEGResBlock(nn.Module):
    """Continuous-depth GResBlock: CBN -> act -> upsample -> zero-augment channels
    -> integrate the conv vector field over [0, 1] (reference notebook ODEBlock,
    cell 9). NFE is static: ``4 * num_steps`` for rk4.
    """

    in_channels: int
    out_channels: int
    n_condition: int = 96
    upsample_factor: int = 2
    method: str = "rk4"
    num_steps: int = 4
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x, condition, *, train: bool = True):
        out = ConditionalNorm(self.in_channels)(x, condition, train=train)
        out = self.activation(out)
        if self.upsample_factor != 1:
            out = _upsample_nearest(out, self.upsample_factor)
        if self.in_channels < self.out_channels:
            # ANODE-style zero augmentation (reference notebook cell 9)
            pad = self.out_channels - self.in_channels
            zeros = jnp.zeros(out.shape[:-1] + (pad,), out.dtype)
            out = jnp.concatenate([out, zeros], axis=-1)
        elif self.in_channels > self.out_channels:
            # the reference block assumed in <= out (its test is 3 -> 100);
            # for channel-decreasing stacks project down with a 1x1 SN conv
            # before the flow so the ODE state lives in out_channels space
            out = SNConv(self.out_channels, (1, 1), padding="VALID",
                         name="proj_down")(out, update_stats=train)

        field = Conv2dODEField(self.out_channels, self.n_condition, self.activation)
        u0 = self.variable("spectral", "u0",
                           lambda: _l2norm(jax.random.normal(
                               self.make_rng("params"), (self.out_channels,))))
        u1 = self.variable("spectral", "u1",
                           lambda: _l2norm(jax.random.normal(
                               self.make_rng("params"), (self.out_channels,))))
        # Refresh the power iteration once per block forward from persisted state
        # (the reference refreshes once per NFE from persisted state — same fixed
        # point, one refresh per step is the standard SN-GAN schedule).
        k0n, k1n, u0n, u1n = field.normalized_kernels(u0.value, u1.value)
        if train and not self.is_initializing():
            u0.value, u1.value = u0n, u1n

        y = odeint_final(
            lambda t, y_: field.rhs(t, y_, condition, k0n, k1n),
            out, 0.0, 1.0, method=self.method, num_steps=self.num_steps,
        )
        return y

    @property
    def nfe(self) -> int:
        from ..ode import tableaus as tb
        return tb.FIXED_GRID[self.method].stages * self.num_steps
