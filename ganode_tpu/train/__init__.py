"""Training engines: the jitted alternating-Adam GAN loop and the functional
ODE-GAN (optimizer-as-ODE) trainer."""
from .diffaug import diff_augment, parse_policy, translate2d
from .gan import GANTrainer, reference_adam
from .losses import (
    LOSSES,
    bce_logits,
    d_loss_bce,
    d_loss_hinge,
    d_loss_wasserstein,
    g_loss_bce,
    g_loss_hinge,
    g_loss_wasserstein,
    gradient_penalty,
    r1_penalty,
)
from .odegan import (
    ODEGANTrainer,
    make_mocogan_losses,
    discriminator_regularizer,
    euler_step,
    rk2_step,
    rk4_step,
)
from .state import GANState, NetState

__all__ = [
    "GANState",
    "GANTrainer",
    "LOSSES",
    "NetState",
    "ODEGANTrainer",
    "bce_logits",
    "d_loss_bce",
    "d_loss_hinge",
    "d_loss_wasserstein",
    "diff_augment",
    "discriminator_regularizer",
    "euler_step",
    "g_loss_bce",
    "g_loss_hinge",
    "g_loss_wasserstein",
    "gradient_penalty",
    "make_mocogan_losses",
    "parse_policy",
    "r1_penalty",
    "rk2_step",
    "rk4_step",
    "reference_adam",
    "translate2d",
]
