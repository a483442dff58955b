"""Core layers: additive noise, GRU cell, small MLPs.

These are the building blocks behind the MoCoGAN zoo (reference models/mocogan.py):
the additive-noise regularizer (reference models/mocogan.py:20-29), the GRU motion
recurrence (reference models/mocogan.py:198,217-229) and the Linear->activation
stacks used as ODE/SDE vector fields and latent warm-up nets (reference
models/mocogan_ode.py:10-14,30-35).
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def leaky_relu(x, negative_slope: float = 0.2):
    return nn.leaky_relu(x, negative_slope=negative_slope)


class Noise(nn.Module):
    """Additive Gaussian noise when enabled; identity otherwise.

    Matches reference models/mocogan.py:20-29. Draws from the module's 'noise'
    RNG stream so training remains a pure function of the step key.
    """

    use_noise: bool = False
    sigma: float = 0.2

    @nn.compact
    def __call__(self, x):
        if not self.use_noise or self.sigma is None:
            return x
        eps = jax.random.normal(self.make_rng("noise"), x.shape, x.dtype)
        return x + self.sigma * eps


class GRUCell(nn.Module):
    """GRU cell with torch gate semantics (reset gate applied to the hidden
    candidate projection): the motion recurrence of MoCoGAN.

        r = sigmoid(x W_ir + h W_hr + b_r)
        z = sigmoid(x W_iz + h W_hz + b_z)
        n = tanh(x W_in + b_in + r * (h W_hn + b_hn))
        h' = (1 - z) * n + z * h

    Both input and hidden projections are fused into single (D, 3D) matmuls so the
    MXU sees two large GEMMs per step instead of six small ones.
    """

    features: int

    @nn.compact
    def __call__(self, h, x):
        d = self.features
        wi = self.param("wi", nn.initializers.lecun_normal(), (x.shape[-1], 3 * d))
        wh = self.param("wh", nn.initializers.orthogonal(), (d, 3 * d))
        bi = self.param("bi", nn.initializers.zeros, (3 * d,))
        bh = self.param("bh", nn.initializers.zeros, (3 * d,))
        gi = x @ wi + bi
        gh = h @ wh + bh
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = nn.sigmoid(i_r + h_r)
        z = nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h


class MLP(nn.Module):
    """Dense stack with an activation between layers and optionally after the last.

    ``features=(64, 16)``, ``activation=tanh``, ``activate_final=False`` gives the
    reference's ODE vector field Linear->Tanh->Linear (models/mocogan_ode.py:10-14).
    """

    features: Sequence[int]
    activation: Callable = jnp.tanh
    activate_final: bool = False

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f)(x)
            if i < len(self.features) - 1 or self.activate_final:
                x = self.activation(x)
        return x


class WarmupMLP(nn.Module):
    """The latent 'linear' warm-up net every NDE motion sampler shares:
    Linear(d, 64) -> LeakyReLU(0.2) -> Linear(64, d) -> LeakyReLU(0.2)
    (reference models/mocogan_ode.py:30-35).
    """

    dim: int
    hidden: int = 64

    @nn.compact
    def __call__(self, x):
        x = leaky_relu(nn.Dense(self.hidden)(x))
        x = leaky_relu(nn.Dense(self.dim)(x))
        return x
