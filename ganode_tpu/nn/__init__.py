"""Module layer: pytree NN building blocks in TPU-native NHWC layouts."""
from .layers import GRUCell, MLP, Noise, WarmupMLP, leaky_relu
from .norm import ConditionalNorm
from .spectral import SNConv, SNDense, spectral_normalize
from .gresblock import Conv2dODEField, GResBlock, ODEGResBlock
from .moe import MoEField

__all__ = [
    "ConditionalNorm",
    "Conv2dODEField",
    "GResBlock",
    "GRUCell",
    "MLP",
    "MoEField",
    "Noise",
    "ODEGResBlock",
    "SNConv",
    "SNDense",
    "WarmupMLP",
    "leaky_relu",
    "spectral_normalize",
]
