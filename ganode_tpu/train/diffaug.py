"""Differentiable augmentation of discriminator inputs (DiffAugment).

Implements the DiffAugment recipe (Zhao et al., "Differentiable Augmentation
for Data-Efficient GAN Training", NeurIPS 2020, arXiv:2006.10738): the
discriminator never sees a raw sample — both real and generated batches pass
through the same randomly-parameterized, differentiable transform ``T`` at
every forward (``D(T(real))``, ``D(T(G(z)))``), so the augmentation gradients
flow back into the generator and the discriminator cannot win by memorizing
the finite real set. This is a beyond-reference stabilizer: the reference
never augments discriminator inputs anywhere (its per-clip transforms,
reference ``dataset/transform/spatial_transforms.py``, run dataset-side,
outside the gradient), and discriminator overfitting is the classic failure
mode at its dataset scale (the documented WGAN collapse,
reference ``README.md:16``).

TPU-native design: all transforms are static-shape ``jnp`` programs — color
ops are elementwise affine maps, translation is a clamp-indexed gather into a
1-pixel zero border, cutout is a broadcasted-iota mask — so the whole policy
fuses into the jitted train step with zero host traffic and no data-dependent
shapes. Randomness is keyed per call (no global RNG), and every draw is made
**per clip, shared across its frames** — the keyed per-clip-consistency
protocol of ``data/transforms.py`` carried into the differentiable setting
(a per-frame draw would turn translation into temporal jitter and destroy the
motion signal the video discriminator exists to judge).

Inputs may be image batches ``(B, H, W, C)`` or video batches
``(B, T, H, W, C)``, channels-last, any float dtype (draws are computed at
f32-or-higher precision and cast back to the input dtype).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["diff_augment", "parse_policy", "translate2d", "POLICY_OPS",
           "ada_update"]


def _per_sample(v, x):
    """Reshape a (B,) draw so it broadcasts per sample over x's trailing axes."""
    return v.reshape((x.shape[0],) + (1,) * (x.ndim - 1)).astype(x.dtype)


# --------------------------------------------------------------------- color
def _brightness(x, key):
    """x + u, u ~ U[-0.5, 0.5) per sample (arXiv:2006.10738 rand_brightness)."""
    u = jax.random.uniform(key, (x.shape[0],)) - 0.5
    return x + _per_sample(u, x)


def _saturation(x, key):
    """Scale distance from the per-pixel channel mean by s ~ U[0, 2)."""
    m = jnp.mean(x, axis=-1, keepdims=True)
    s = jax.random.uniform(key, (x.shape[0],)) * 2.0
    return (x - m) * _per_sample(s, x) + m


def _contrast(x, key):
    """Scale distance from the per-sample mean by c ~ U[0.5, 1.5)."""
    m = jnp.mean(x, axis=tuple(range(1, x.ndim)), keepdims=True)
    c = jax.random.uniform(key, (x.shape[0],)) + 0.5
    return (x - m) * _per_sample(c, x) + m


# --------------------------------------------------------------- translation
def _translate_one(x, sh, sw):
    """Shift one sample (..., H, W, C) by (sh, sw) pixels with zero fill.

    Positive sh moves content down, positive sw moves it right: output pixel
    (i, j) reads input (i - sh, j - sw). Out-of-range reads clamp into a
    1-pixel zero border — indices past the border by any amount land on the
    same zero row/column, so a single-pixel pad serves every shift magnitude
    (the DiffAugment gather trick; avoids shift-dependent pad widths, which
    would be dynamic shapes under jit).
    """
    h, w = x.shape[-3], x.shape[-2]
    pad = [(0, 0)] * x.ndim
    pad[-3] = (1, 1)
    pad[-2] = (1, 1)
    xp = jnp.pad(x, pad)
    ri = jnp.clip(jnp.arange(h) - sh + 1, 0, h + 1)
    ci = jnp.clip(jnp.arange(w) - sw + 1, 0, w + 1)
    return xp[..., ri[:, None], ci[None, :], :]


def translate2d(x, shift_h, shift_w):
    """Per-sample integer translation with zero fill.

    x: (B, ..., H, W, C); shift_h / shift_w: (B,) int arrays. Exposed for
    direct use and unit testing; `diff_augment` draws the shifts.
    """
    return jax.vmap(_translate_one)(x, shift_h, shift_w)


def _translation(x, key, ratio: float = 0.125):
    """Shift each clip by up to ``ratio`` of its extent in each spatial axis."""
    b = x.shape[0]
    h, w = x.shape[-3], x.shape[-2]
    mh, mw = max(int(h * ratio), 1), max(int(w * ratio), 1)
    kh, kw = jax.random.split(key)
    sh = jax.random.randint(kh, (b,), -mh, mh + 1)
    sw = jax.random.randint(kw, (b,), -mw, mw + 1)
    return translate2d(x, sh, sw)


# -------------------------------------------------------------------- cutout
def _cutout(x, key, ratio: float = 0.5):
    """Zero a (ratio*H, ratio*W) block per clip; the block may hang off the
    edges (centers cover the image uniformly, matching rand_cutout's clamped
    offsets), so the expected occluded area is below ratio**2."""
    b = x.shape[0]
    h, w = x.shape[-3], x.shape[-2]
    ch, cw = max(int(h * ratio), 1), max(int(w * ratio), 1)
    kh, kw = jax.random.split(key)
    top = jax.random.randint(kh, (b,), -(ch // 2), h - ch // 2 + 1)
    left = jax.random.randint(kw, (b,), -(cw // 2), w - cw // 2 + 1)
    rows = jnp.arange(h)[None, :]                       # (1, H)
    cols = jnp.arange(w)[None, :]                       # (1, W)
    row_in = (rows >= top[:, None]) & (rows < top[:, None] + ch)    # (B, H)
    col_in = (cols >= left[:, None]) & (cols < left[:, None] + cw)  # (B, W)
    mask = ~(row_in[:, :, None] & col_in[:, None, :])   # (B, H, W) True=keep
    mask = mask.reshape((b,) + (1,) * (x.ndim - 4) + (h, w, 1))
    return x * mask.astype(x.dtype)


POLICY_OPS = {
    "brightness": _brightness,
    "saturation": _saturation,
    "contrast": _contrast,
    "translation": _translation,
    "cutout": _cutout,
}

# 'color' is the paper's composite of the three photometric ops, in its order.
_COLOR = ("brightness", "saturation", "contrast")


def parse_policy(policy: str):
    """'color,translation,cutout' -> tuple of op names; raises on unknowns."""
    ops = []
    for name in (p.strip() for p in policy.split(",") if p.strip()):
        if name == "color":
            ops.extend(_COLOR)
        elif name in POLICY_OPS:
            ops.append(name)
        else:
            raise ValueError(
                f"unknown diffaug op {name!r}; choose from "
                f"{sorted(POLICY_OPS) + ['color']}")
    return tuple(ops)


def diff_augment(x, key, policy, p=None):
    """Apply the DiffAugment ``policy`` to a batch with fresh draws from ``key``.

    x: (B, H, W, C) images or (B, T, H, W, C) videos in any float dtype;
    policy: comma-separated op string (see `parse_policy`) or a pre-parsed
    tuple. Empty policy returns x unchanged. Differentiable in x; one draw
    per sample, shared across a clip's frames.

    p: optional augmentation probability (traced scalar in [0, 1]) — the ADA
    gating (Karras et al., "Training GANs with Limited Data", NeurIPS 2020,
    arXiv:2006.06676 §C): each op is applied to each sample independently
    with probability ``p`` (a per-sample Bernoulli gate via ``jnp.where``, so
    shapes stay static and the whole thing still fuses into the jitted step).
    ``p=None`` (the plain-DiffAugment path) is bit-identical to the pre-ADA
    function: op draws come from the same ``fold_in(key, i)`` stream and no
    gate draws are made.
    """
    ops = parse_policy(policy) if isinstance(policy, str) else tuple(policy)
    if not ops:
        return x
    if x.ndim not in (4, 5):
        raise ValueError(f"expected (B,H,W,C) or (B,T,H,W,C), got {x.shape}")
    dtype = x.dtype
    # draws are computed at >= f32 precision, never below the input's: bf16
    # inputs upcast to f32, while f64 inputs (the process-global x64 flag that
    # pytest collection can flip — CLAUDE.md) stay f64 so un-gated samples
    # round-trip bitwise (the ADA p-gate's `jnp.where(keep, aug, x)` must
    # return x EXACTLY for rejected gates).
    x = x.astype(jnp.promote_types(dtype, jnp.float32))
    for i, name in enumerate(ops):
        aug = POLICY_OPS[name](x, jax.random.fold_in(key, i))
        if p is None:
            x = aug
        else:
            # gate keys live on a disjoint fold_in branch (1000+i) so the op
            # draws above stay identical to the ungated stream — p=1 therefore
            # reproduces plain diff_augment exactly.
            u = jax.random.uniform(jax.random.fold_in(key, 1000 + i),
                                   (x.shape[0],))
            keep = (u < p).reshape((x.shape[0],) + (1,) * (x.ndim - 1))
            x = jnp.where(keep, aug, x)
    return x.astype(dtype)


def ada_update(p, rt, *, target: float, step: float, p_max: float = 0.8):
    """One integral-controller update of the ADA probability (arXiv:2006.06676
    §C): nudge ``p`` by ``±step`` toward driving the overfitting heuristic
    ``rt = E[sign(D(aug(real)))]`` to ``target``, clipped to [0, p_max].

    rt > target means the discriminator separates (augmented) reals too
    confidently — it is memorizing the finite real set — so augmentation
    strength rises; rt < target relaxes it. Pure jnp; called inside the jitted
    train step on traced scalars.
    """
    return jnp.clip(p + step * jnp.sign(rt - target), 0.0, p_max)
