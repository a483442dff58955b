"""MoCoGAN model zoo with pluggable neural-differential-equation motion."""
from .mocogan import (
    CategoricalVideoDiscriminator,
    SNImageDiscriminator,
    SNVideoDiscriminator,
    DCGANTrunk64,
    ImageDiscriminator,
    MNISTTrunk28,
    PatchImageDiscriminator,
    PatchVideoDiscriminator,
    VideoDiscriminator,
    VideoGenerator,
)
from .motion import (
    MOTION_SAMPLERS,
    MotionCDE,
    MotionGRU,
    MotionMoEODE,
    MotionODE,
    MotionODERNN,
    MotionSDE,
    make_motion_sampler,
)


def make_generator(
    variant: str,
    *,
    n_channels: int,
    dim_z_content: int = 50,
    dim_z_category: int = 0,
    dim_z_motion: int = 16,
    video_length: int = 16,
    trunk: str = "dcgan64",
    ngf: int = 64,
    dtype=None,
    **motion_kwargs,
) -> VideoGenerator:
    """Build the generator for a README variant.

    variant: gru | ode | sde | cde | ode_rnn — mirrors the per-file subclasses of
    the reference (models/mocogan{,_ode,_sde,_cde,_ode_rnn}.py) as one ctor —
    plus moe_ode (mixture-of-experts ODE field, expert-parallel; new capability).
    """
    import jax.numpy as jnp

    motion = make_motion_sampler(variant, dim_z_motion, **motion_kwargs)
    return VideoGenerator(
        motion=motion,
        n_channels=n_channels,
        dim_z_content=dim_z_content,
        dim_z_category=dim_z_category,
        dim_z_motion=dim_z_motion,
        video_length=video_length,
        ngf=ngf,
        trunk=trunk,
        dtype=dtype or jnp.float32,
    )


__all__ = [
    "CategoricalVideoDiscriminator",
    "DCGANTrunk64",
    "ImageDiscriminator",
    "MNISTTrunk28",
    "MOTION_SAMPLERS",
    "MotionCDE",
    "MotionGRU",
    "MotionMoEODE",
    "MotionODE",
    "MotionODERNN",
    "MotionSDE",
    "PatchImageDiscriminator",
    "PatchVideoDiscriminator",
    "SNImageDiscriminator",
    "SNVideoDiscriminator",
    "VideoDiscriminator",
    "VideoGenerator",
    "make_generator",
    "make_motion_sampler",
]
