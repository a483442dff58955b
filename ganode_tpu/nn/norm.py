"""Class-conditional batch normalization (reference stage1/GResBlock.py:66-88).

Affine-less batch norm followed by per-sample (gamma, beta) produced from a
condition vector by a single dense layer, initialized so gamma starts near 1 and
beta near 0.
"""
from __future__ import annotations

from flax import linen as nn


class ConditionalNorm(nn.Module):
    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, condition, *, train: bool = True):
        """x: (..., H, W, C) NHWC; condition: (batch, n_condition)."""
        h = nn.BatchNorm(
            use_running_average=not train,
            use_bias=False,
            use_scale=False,
            momentum=self.momentum,
            epsilon=self.epsilon,
        )(x)
        # gamma block initialized ~N(1, 0.02), beta block at zero — the standard
        # conditional-BN warm start the reference uses (GResBlock.py:75-76).
        gamma = nn.Dense(
            self.features,
            kernel_init=nn.initializers.normal(0.02),
            bias_init=nn.initializers.ones,
        )(condition)
        beta = nn.Dense(
            self.features,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )(condition)
        # broadcast (B, C) over spatial dims; x may be (B*T, H, W, C) with the
        # condition repeated per frame by the caller.
        spatial = (1,) * (x.ndim - 2)
        gamma = gamma.reshape(gamma.shape[0], *spatial, self.features)
        beta = beta.reshape(beta.shape[0], *spatial, self.features)
        return gamma * h + beta
