"""MoCoGAN model zoo: one video generator with pluggable motion samplers, and the
five discriminators (reference models/mocogan.py, rebuilt TPU-first).

Layout convention (TPU-native, channels-last):
  images  (B, H, W, C)         videos  (B, T, H, W, C)
The reference's torch layout is videos (B, C, T, H, W) / images (B, C, H, W);
``ganode_tpu.utils.layout`` converts at the API boundary for parity tooling.

Latent contract (reference models/mocogan.py:196,249-269): per frame
z = [z_content (dim 50, shared across the clip) || z_category (one-hot, optional)
     || z_motion (per-frame, from the motion sampler)], decoded by a 2-D deconv
trunk applied to all B*T frames at once — on TPU that is one big batched GEMM
stack for the MXU, exactly the shape XLA wants.

Trunks:
  dcgan64: 1x1 -> 4 -> 8 -> 16 -> 32 -> 64 deconv pyramid (reference
           models/mocogan.py:200-215)
  mnist28: same pyramid to 32x32, then a 1x1 conv with a 2-pixel crop — the
           algebraic equivalent of the reference's ConvTranspose2d(k=1,s=1,p=2)
           (reference models/mocogan_ode.py:66-84) which maps 32 -> 28.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import Noise, leaky_relu

# DCGAN-style init for GAN convs: N(0, 0.02) keeps early DCGAN training stable.
_conv_init = nn.initializers.normal(0.02)


def _deconv(x, features, kernel=4, stride=2, torch_padding=1, name=None,
            dtype=None):
    """ConvTranspose with torch (k, s, p) semantics: out = (in-1)*s - 2p + k.

    ``dtype`` is the compute dtype (bfloat16 for mixed precision on the MXU);
    parameters always stay float32.
    """
    pad = kernel - 1 - torch_padding
    return nn.ConvTranspose(
        features, (kernel, kernel), strides=(stride, stride),
        padding=((pad, pad), (pad, pad)), use_bias=False, kernel_init=_conv_init,
        name=name, dtype=dtype, param_dtype=jnp.float32,
    )(x)


def _bn(x, train: bool, name=None, dtype=None):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name, dtype=dtype,
                        param_dtype=jnp.float32)(x)


class DCGANTrunk64(nn.Module):
    """z (B', 1, 1, dim_z) -> frames (B', 64, 64, n_channels) in [-1, 1]."""

    n_channels: int
    ngf: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, *, train: bool = True):
        dt = self.dtype
        h = _deconv(z.astype(dt), self.ngf * 8, 4, 1, 0, dtype=dt)  # 1 -> 4
        h = nn.relu(_bn(h, train, dtype=dt))
        h = _deconv(h, self.ngf * 4, dtype=dt)            # 4 -> 8
        h = nn.relu(_bn(h, train, dtype=dt))
        h = _deconv(h, self.ngf * 2, dtype=dt)            # 8 -> 16
        h = nn.relu(_bn(h, train, dtype=dt))
        h = _deconv(h, self.ngf, dtype=dt)                # 16 -> 32
        h = nn.relu(_bn(h, train, dtype=dt))
        h = _deconv(h, self.n_channels, dtype=dt)         # 32 -> 64
        return jnp.tanh(h).astype(jnp.float32)


class MNISTTrunk28(nn.Module):
    """z (B', 1, 1, dim_z) -> frames (B', 28, 28, n_channels) in [-1, 1]."""

    n_channels: int
    ngf: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, *, train: bool = True):
        dt = self.dtype
        h = _deconv(z.astype(dt), self.ngf * 8, 4, 1, 0, dtype=dt)  # 1 -> 4
        h = nn.relu(_bn(h, train, dtype=dt))
        h = _deconv(h, self.ngf * 4, dtype=dt)            # 4 -> 8
        h = nn.relu(_bn(h, train, dtype=dt))
        h = _deconv(h, self.ngf * 2, dtype=dt)            # 8 -> 16
        h = nn.relu(_bn(h, train, dtype=dt))
        h = _deconv(h, self.ngf, dtype=dt)                # 16 -> 32
        h = nn.relu(_bn(h, train, dtype=dt))
        # ConvTranspose2d(k=1, s=1, p=2) == 1x1 conv then crop 2 px per side.
        h = nn.Conv(self.n_channels, (1, 1), use_bias=False,
                    kernel_init=_conv_init, dtype=dt,
                    param_dtype=jnp.float32)(h)
        h = h[:, 2:-2, 2:-2, :]                           # 32 -> 28
        return jnp.tanh(h).astype(jnp.float32)


class DCGANTrunk128(nn.Module):
    """z (B', 1, 1, dim_z) -> frames (B', 128, 128, n_channels) in [-1, 1].

    New capability for the north-star WGAN-GP @ 128x128 config (BASELINE.md) —
    one more doubling stage than the reference's 64x64 trunk.
    """

    n_channels: int
    ngf: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, *, train: bool = True):
        dt = self.dtype
        h = _deconv(z.astype(dt), self.ngf * 16, 4, 1, 0, dtype=dt)  # 1 -> 4
        h = nn.relu(_bn(h, train, dtype=dt))
        h = _deconv(h, self.ngf * 8, dtype=dt)            # 4 -> 8
        h = nn.relu(_bn(h, train, dtype=dt))
        h = _deconv(h, self.ngf * 4, dtype=dt)            # 8 -> 16
        h = nn.relu(_bn(h, train, dtype=dt))
        h = _deconv(h, self.ngf * 2, dtype=dt)            # 16 -> 32
        h = nn.relu(_bn(h, train, dtype=dt))
        h = _deconv(h, self.ngf, dtype=dt)                # 32 -> 64
        h = nn.relu(_bn(h, train, dtype=dt))
        h = _deconv(h, self.n_channels, dtype=dt)         # 64 -> 128
        return jnp.tanh(h).astype(jnp.float32)


class GResTrunk64(nn.Module):
    """DVD-GAN-class generator trunk from GResBlocks: the model the reference's
    stage 1 built blocks for but never assembled (SURVEY.md §2.3 #24-25).

    z (B', 1, 1, dim_z) -> dense 4x4 seed -> 4 up-sampling residual blocks
    (spectral-normed convs + conditional BN, condition = the latent itself)
    -> BN -> relu -> SN 3x3 conv -> tanh, 64x64 output.

    ``continuous_depth=True`` swaps each GResBlock for the stage-1 ODEGResBlock
    (ANODE-style ODE flow in channel-augmented space, notebook cells 6-9).
    """

    n_channels: int
    ngf: int = 64
    dtype: Any = jnp.float32  # blocks run f32 (SN power iteration stability)
    continuous_depth: bool = False
    ode_steps: int = 2

    @nn.compact
    def __call__(self, z, *, train: bool = True):
        from ..nn import GResBlock, ODEGResBlock, SNConv

        bt = z.shape[0]
        zc = z.reshape(bt, -1)
        dim_z = zc.shape[-1]
        ngf = self.ngf
        h = nn.Dense(4 * 4 * ngf * 8, kernel_init=_conv_init)(zc)
        h = h.reshape(bt, 4, 4, ngf * 8)
        channels = (ngf * 8, ngf * 4, ngf * 2, ngf)      # 4->8->16->32->64
        for i, ch in enumerate(channels):
            if self.continuous_depth:
                h = ODEGResBlock(in_channels=h.shape[-1], out_channels=ch,
                                 n_condition=dim_z, num_steps=self.ode_steps,
                                 name=f"block_{i}")(h, zc, train=train)
            else:
                h = GResBlock(out_channels=ch, n_condition=dim_z,
                              name=f"block_{i}")(h, zc, train=train)
        h = nn.relu(_bn(h, train))
        h = SNConv(self.n_channels, (3, 3), padding=((1, 1), (1, 1)))(
            h, update_stats=train)
        return jnp.tanh(h).astype(jnp.float32)


TRUNKS = {"dcgan64": DCGANTrunk64, "mnist28": MNISTTrunk28,
          "dcgan128": DCGANTrunk128, "gres64": GResTrunk64,
          "odegres64": lambda n_channels, ngf=64, dtype=jnp.float32:
              GResTrunk64(n_channels, ngf, dtype, continuous_depth=True)}


class VideoGenerator(nn.Module):
    """MoCoGAN generator with a pluggable motion sampler.

    Attributes mirror the reference ctor (models/mocogan.py:186-198):
    n_channels, dim_z_content, dim_z_category, dim_z_motion, video_length, ngf,
    plus ``trunk`` selecting the output geometry and ``motion`` supplying the
    (n, T, dim_z_motion) latent trajectory.
    """

    motion: nn.Module
    n_channels: int = 3
    dim_z_content: int = 50
    dim_z_category: int = 0
    dim_z_motion: int = 16
    video_length: int = 16
    ngf: int = 64
    trunk: str = "dcgan64"
    dtype: Any = jnp.float32  # trunk compute dtype (bfloat16 for mixed precision)

    def setup(self):
        self.main = TRUNKS[self.trunk](self.n_channels, self.ngf,
                                       dtype=self.dtype)

    def sample_z_video(self, n: int, video_len: int, *, train: bool = True):
        """Per-frame latents (n*video_len, dim_z) + category labels (or None)."""
        key = self.make_rng("sample")
        k_content, k_categ = jax.random.split(key)

        z_content = jax.random.normal(k_content, (n, self.dim_z_content))
        z_content = jnp.repeat(z_content, video_len, axis=0)

        labels = None
        parts = [z_content]
        if self.dim_z_category > 0:
            labels = jax.random.randint(k_categ, (n,), 0, self.dim_z_category)
            one_hot = jax.nn.one_hot(labels, self.dim_z_category)
            parts.append(jnp.repeat(one_hot, video_len, axis=0))

        z_motion = self.motion(n, video_len, train=train)   # (n, T, dim)
        parts.append(z_motion.reshape(n * video_len, self.dim_z_motion))

        return jnp.concatenate(parts, axis=1), labels

    def sample_videos(self, n: int, video_len: Optional[int] = None, *,
                      train: bool = True):
        """-> (videos (n, T, H, W, C) in [-1, 1], category labels or None)."""
        video_len = video_len or self.video_length
        z, labels = self.sample_z_video(n, video_len, train=train)
        h = self.main(z[:, None, None, :], train=train)     # (n*T, H, W, C)
        h = h.reshape(n, video_len, *h.shape[1:])
        return h, labels

    def sample_images(self, n: int, *, train: bool = True):
        """-> (images (n, H, W, C), None): one uniformly-random frame from each of
        n independent motion trajectories.

        The reference (models/mocogan.py:287-295) materializes 2*n*T full
        trajectories and keeps n rows of the latent pool — statistically the same
        marginal (a random frame of a random trajectory) at 2*T times the solver
        cost. We draw n trajectories and index one frame each; the trunk then
        decodes exactly n frames instead of n (after discarding 2*n*T - n).
        """
        video_len = self.video_length
        key = self.make_rng("sample")
        k_content, k_frame, k_categ = jax.random.split(key, 3)

        z_content = jax.random.normal(k_content, (n, self.dim_z_content))
        z_motion = self.motion(n, video_len, train=train)    # (n, T, dim)
        frame_idx = jax.random.randint(k_frame, (n,), 0, video_len)
        z_motion = jnp.take_along_axis(
            z_motion, frame_idx[:, None, None], axis=1
        ).squeeze(1)                                          # (n, dim)

        parts = [z_content]
        if self.dim_z_category > 0:
            # distinct key from the frame draw — the category and frame-index
            # samples must be independent
            one_hot = jax.nn.one_hot(
                jax.random.randint(k_categ, (n,), 0, self.dim_z_category),
                self.dim_z_category)
            parts.append(one_hot)
        parts.append(z_motion)
        z = jnp.concatenate(parts, axis=1)

        h = self.main(z[:, None, None, :], train=train)
        return h, None

    def __call__(self, n: int, *, train: bool = True):
        """Default entry: sample_videos (used for init/tracing)."""
        return self.sample_videos(n, train=train)


# ---------------------------------------------------------------------------
# Discriminators. All return (logits, aux) matching the reference's
# ``forward(x) -> (h, None)`` / categorical ``(labels, categ)`` contract.
# ---------------------------------------------------------------------------


def _conv2d(x, features, k=4, s=2, p=1, dtype=None):
    return nn.Conv(features, (k, k), strides=(s, s), padding=((p, p), (p, p)),
                   use_bias=False, kernel_init=_conv_init, dtype=dtype,
                   param_dtype=jnp.float32)(x)


def _conv3d(x, features, k, s, p, dtype=None):
    """k, s, p are (t, h, w) triples; input NTHWC."""
    return nn.Conv(features, tuple(k), strides=tuple(s),
                   padding=tuple((pi, pi) for pi in p),
                   use_bias=False, kernel_init=_conv_init, dtype=dtype,
                   param_dtype=jnp.float32)(x)


class FastGradConv3D(nn.Module):
    """First video-discriminator conv — kernel (4,4,4), strides (1,2,2),
    padding (0,1,1), no bias — with an MXU-folded input gradient.

    Numerically identical to the nn.Conv it replaces; only the backward's
    data-gradient lowering changes (ops/conv3d_grad.py: XLA's native gradient
    runs at ~6 TFLOP/s when C_in is the 3-channel video input, ~35% of the
    whole-step time lives in this discriminator's backward).

    Compat note (ADVICE r2): introducing this module renamed the first conv's
    param path in PatchVideoDiscriminator / ksize-4 VideoDiscriminator
    (Conv_0 -> FastGradConv3D_0, remaining Conv_i renumbered), so checkpoints
    written before round 2's e0cf300 do not restore. No such checkpoints were
    published; all committed runs/ artifacts postdate it.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops import conv3d_first

        kernel = self.param("kernel", _conv_init,
                            (4, 4, 4, x.shape[-1], self.features), jnp.float32)
        dt = self.dtype or x.dtype
        return conv3d_first(x.astype(dt), kernel.astype(dt))


class ImageDiscriminator(nn.Module):
    """64x64 image discriminator -> scalar logits (reference models/mocogan.py:32-63)."""

    ndf: int = 64
    use_noise: bool = False
    noise_sigma: float | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        dt = self.dtype
        noise = lambda h: Noise(self.use_noise, self.noise_sigma or 0.0)(h)
        h = leaky_relu(_conv2d(noise(x.astype(dt)), self.ndf, dtype=dt))
        h = leaky_relu(_bn(_conv2d(noise(h), self.ndf * 2, dtype=dt), train, dtype=dt))
        h = leaky_relu(_bn(_conv2d(noise(h), self.ndf * 4, dtype=dt), train, dtype=dt))
        h = leaky_relu(_bn(_conv2d(noise(h), self.ndf * 8, dtype=dt), train, dtype=dt))
        h = _conv2d(h, 1, k=4, s=1, p=0, dtype=dt)
        return jnp.squeeze(h).astype(jnp.float32), None


class PatchImageDiscriminator(nn.Module):
    """Patch image discriminator -> per-patch logit map
    (reference models/mocogan.py:66-93)."""

    ndf: int = 64
    use_noise: bool = False
    noise_sigma: float | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        dt = self.dtype
        noise = lambda h: Noise(self.use_noise, self.noise_sigma or 0.0)(h)
        h = leaky_relu(_conv2d(noise(x.astype(dt)), self.ndf, dtype=dt))
        h = leaky_relu(_bn(_conv2d(noise(h), self.ndf * 2, dtype=dt), train, dtype=dt))
        h = leaky_relu(_bn(_conv2d(noise(h), self.ndf * 4, dtype=dt), train, dtype=dt))
        h = _conv2d(noise(h), 1, dtype=dt)
        return jnp.squeeze(h).astype(jnp.float32), None


class PatchVideoDiscriminator(nn.Module):
    """3-D patch video discriminator; input (B, T, H, W, C)
    (reference models/mocogan.py:96-126)."""

    ndf: int = 64
    use_noise: bool = False
    noise_sigma: float | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        dt = self.dtype
        noise = lambda h: Noise(self.use_noise, self.noise_sigma or 0.0)(h)
        k, s, p = (4, 4, 4), (1, 2, 2), (0, 1, 1)
        h = leaky_relu(FastGradConv3D(self.ndf, dtype=dt)(noise(x.astype(dt))))
        h = leaky_relu(_bn(_conv3d(noise(h), self.ndf * 2, k, s, p, dtype=dt), train, dtype=dt))
        h = leaky_relu(_bn(_conv3d(noise(h), self.ndf * 4, k, s, p, dtype=dt), train, dtype=dt))
        h = _conv3d(h, 1, k, s, p, dtype=dt)
        return jnp.squeeze(h).astype(jnp.float32), None


class VideoDiscriminator(nn.Module):
    """Full video discriminator with parametrizable cubic kernel (``ksize=2`` for
    28x28 MNIST clips, 4 for 64x64 UCF101); input (B, T, H, W, C)
    (reference models/mocogan.py:129-164)."""

    n_output_neurons: int = 1
    ndf: int = 64
    ksize: int = 4
    use_noise: bool = False
    noise_sigma: float | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        # five stride-1 unpadded time convs each eat (ksize - 1) frames; a too-
        # short clip silently produces an empty tensor and NaN losses downstream
        min_t = 5 * self.ksize - 4
        if x.shape[1] < min_t:
            raise ValueError(
                f"VideoDiscriminator(ksize={self.ksize}) needs clips with at "
                f"least {min_t} frames, got T={x.shape[1]}")
        dt = self.dtype
        noise = lambda h: Noise(self.use_noise, self.noise_sigma or 0.0)(h)
        k = (self.ksize,) * 3
        s, p = (1, 2, 2), (0, 1, 1)
        if self.ksize == 4:  # the UCF geometry the folded gradient covers
            h = leaky_relu(FastGradConv3D(self.ndf, dtype=dt)(
                noise(x.astype(dt))))
        else:
            h = leaky_relu(_conv3d(noise(x.astype(dt)), self.ndf, k, s, p,
                                   dtype=dt))
        h = leaky_relu(_bn(_conv3d(noise(h), self.ndf * 2, k, s, p, dtype=dt), train, dtype=dt))
        h = leaky_relu(_bn(_conv3d(noise(h), self.ndf * 4, k, s, p, dtype=dt), train, dtype=dt))
        h = leaky_relu(_bn(_conv3d(noise(h), self.ndf * 8, k, s, p, dtype=dt), train, dtype=dt))
        h = _conv3d(h, self.n_output_neurons, k, (1, 1, 1), (0, 0, 0), dtype=dt)
        return jnp.squeeze(h).astype(jnp.float32), None


class SNImageDiscriminator(nn.Module):
    """Spectrally-normalized image discriminator (SN-GAN style, no BatchNorm) —
    the standard critic for the WGAN/WGAN-GP configs, built from the stage-1
    spectral-norm layer (reference stage1/GResBlock.py:10-64). Power-iteration
    state lives in the 'spectral' collection the trainer threads."""

    ndf: int = 64
    use_noise: bool = False
    noise_sigma: float | None = None

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        from ..nn import SNConv

        noise = lambda h: Noise(self.use_noise, self.noise_sigma or 0.0)(h)
        h = x
        for feats in (self.ndf, self.ndf * 2, self.ndf * 4):
            h = SNConv(feats, (4, 4), strides=(2, 2),
                       padding=((1, 1), (1, 1)), use_bias=False)(
                noise(h), update_stats=train)
            h = leaky_relu(h)
        h = SNConv(1, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                   use_bias=False)(h, update_stats=train)
        return jnp.squeeze(h).astype(jnp.float32), None


class SNVideoDiscriminator(nn.Module):
    """Spectrally-normalized video critic (no BatchNorm) — the WGAN-GP-safe
    counterpart of VideoDiscriminator. Same geometry as the reference's
    VideoDiscriminator (models/mocogan.py:129-164: cubic ``ksize`` kernels,
    stride (1, 2, 2), unpadded time) but every conv is spectrally normalized
    via the stage-1 SN layer (reference stage1/GResBlock.py:10-64) and the BN
    layers are dropped: BatchNorm in a WGAN-GP critic correlates samples inside
    the batch and breaks the per-sample gradient penalty. Power-iteration state
    lives in the 'spectral' collection the trainer threads."""

    n_output_neurons: int = 1
    ndf: int = 64
    ksize: int = 4
    use_noise: bool = False
    noise_sigma: float | None = None

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        from ..nn import SNConv

        min_t = 5 * self.ksize - 4
        if x.shape[1] < min_t:
            raise ValueError(
                f"SNVideoDiscriminator(ksize={self.ksize}) needs clips with at "
                f"least {min_t} frames, got T={x.shape[1]}")
        noise = lambda h: Noise(self.use_noise, self.noise_sigma or 0.0)(h)
        k = (self.ksize,) * 3
        s = (1, 2, 2)
        p = ((0, 0), (1, 1), (1, 1))
        h = x
        for feats in (self.ndf, self.ndf * 2, self.ndf * 4, self.ndf * 8):
            h = SNConv(feats, k, strides=s, padding=p, use_bias=False)(
                noise(h), update_stats=train)
            h = leaky_relu(h)
        h = SNConv(self.n_output_neurons, k, strides=(1, 1, 1),
                   padding=((0, 0), (0, 0), (0, 0)), use_bias=False)(
            h, update_stats=train)
        return jnp.squeeze(h).astype(jnp.float32), None


class CategoricalVideoDiscriminator(nn.Module):
    """Video discriminator emitting (realness logits, category logits)
    (reference models/mocogan.py:167-182)."""

    dim_categorical: int
    n_output_neurons: int = 1
    ndf: int = 64
    ksize: int = 4
    use_noise: bool = False
    noise_sigma: float | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        body = VideoDiscriminator(
            n_output_neurons=self.n_output_neurons + self.dim_categorical,
            ndf=self.ndf, ksize=self.ksize,
            use_noise=self.use_noise, noise_sigma=self.noise_sigma,
            dtype=self.dtype,
        )
        h, _ = body(x, train=train)
        # h: (B, ..., n_out + dim_cat); split along the channel axis
        labels = h[..., : h.shape[-1] - self.dim_categorical]
        categ = h[..., h.shape[-1] - self.dim_categorical:]
        return labels, categ
