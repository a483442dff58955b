"""Int8 post-training quantization for the deconv-trunk serving path.

The v5e MXU runs s8 x s8 -> s32 at roughly twice its bf16 rate; measured on
the DCGAN trunk's three FLOP-dominant deconv shapes at serving batch the
dilated-deconv lowering keeps 1.16-1.28x of that (scripts/bench_int8.py, one
JSON line; the full 2x is capped by the same input-dilated conv emission the
training-side analysis documents in docs/DESIGN.md "Conv lowering on TPU").

Recipe (standard serving PTQ, new capability — the reference has no serving
path at all):

* **weights**: symmetric per-output-channel int8, folded once offline;
* **activations**: dynamic symmetric per-tensor int8 (max-abs of the live
  batch — GAN trunks are ReLU pyramids with well-behaved ranges);
* **accumulate int32 on the MXU**, dequantize in the f32 epilogue where
  eval-mode BatchNorm collapses to a per-channel scale+bias (fold the conv's
  dequant scale and the BN affine into ONE multiply);
* the final tanh runs in f32 — output error vs the f32 path is measured by
  ``tests/test_ops.py`` and reported by ``scripts/bench_generate.py --int8``.

Measured verdict (docs/DESIGN.md "Int8 serving path"): END-TO-END A WASH on
v5e — the bf16 deconvs already sit at ~94% MFU, so quantization's extra HBM
passes consume the isolated 1.16-1.28x MXU gain (dynamic scales 0.64-0.80x,
static calibrated scales 1.00-1.04x). Kept for the 4x weight-memory saving
and for hardware where the trade-off differs; bf16 remains the default.

Usage: ``qp = quantize_trunk(trunk_name, params, batch_stats)`` once, then
``frames = int8_trunk_apply(trunk_name, qp, z)`` inside jit.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["quantize_trunk", "int8_trunk_apply", "calibrate_act_scales",
           "TRUNK_GEOMETRY"]

# (conv param name, BN param name or None, stride, torch padding) per layer;
# geometry matches models/mocogan.py's trunks (reference models/mocogan.py:
# 200-215, mocogan_ode.py:66-84).
TRUNK_GEOMETRY: Dict[str, List[Tuple[str, Optional[str], int, int]]] = {
    "dcgan64": [("ConvTranspose_0", "BatchNorm_0", 1, 0),
                ("ConvTranspose_1", "BatchNorm_1", 2, 1),
                ("ConvTranspose_2", "BatchNorm_2", 2, 1),
                ("ConvTranspose_3", "BatchNorm_3", 2, 1),
                ("ConvTranspose_4", None, 2, 1)],
    "dcgan128": [("ConvTranspose_0", "BatchNorm_0", 1, 0),
                 ("ConvTranspose_1", "BatchNorm_1", 2, 1),
                 ("ConvTranspose_2", "BatchNorm_2", 2, 1),
                 ("ConvTranspose_3", "BatchNorm_3", 2, 1),
                 ("ConvTranspose_4", "BatchNorm_4", 2, 1),
                 ("ConvTranspose_5", None, 2, 1)],
    # mnist28 ends in a 1x1 conv + 2px crop (the reference's k1s1p2 deconv)
    "mnist28": [("ConvTranspose_0", "BatchNorm_0", 1, 0),
                ("ConvTranspose_1", "BatchNorm_1", 2, 1),
                ("ConvTranspose_2", "BatchNorm_2", 2, 1),
                ("ConvTranspose_3", "BatchNorm_3", 2, 1),
                ("Conv_0", None, 1, 0)],
}

_DN = None


def _dn():
    global _DN
    if _DN is None:
        _DN = jax.lax.conv_dimension_numbers(
            (1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
    return _DN


def _fold_bn(bn_params, bn_stats, eps: float = 1e-5):
    inv = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)
    return inv, bn_params["bias"] - bn_stats["mean"] * inv


def _quantize_kernel(k):
    """(kh, kw, Ci, Co) f32 -> (int8 kernel, per-Co f32 scale)."""
    s = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(k / s), -127, 127).astype(jnp.int8)
    return q, s


def quantize_trunk(trunk: str, params: Dict[str, Any],
                   batch_stats: Dict[str, Any]) -> Dict[str, Any]:
    """Fold a trained trunk's f32 params into an int8 serving pytree.

    Per layer: int8 kernel + one fused per-channel epilogue multiply
    (weight-dequant scale x folded-BN scale) and bias. Run once offline; the
    result is an ordinary pytree (checkpointable, shardable).
    """
    if trunk not in TRUNK_GEOMETRY:
        raise ValueError(
            f"no int8 geometry for trunk {trunk!r} "
            f"(have {sorted(TRUNK_GEOMETRY)}); the GRes trunks are "
            "spectral-norm f32 by design")
    out: Dict[str, Any] = {"layers": []}
    for conv_name, bn_name, _, _ in TRUNK_GEOMETRY[trunk]:
        kq, ks = _quantize_kernel(jnp.asarray(params[conv_name]["kernel"],
                                              jnp.float32))
        if bn_name is not None:
            bn_scale, bn_bias = _fold_bn(params[bn_name], batch_stats[bn_name])
            scale, bias = ks * bn_scale, bn_bias
        else:
            scale, bias = ks, jnp.zeros((kq.shape[-1],), jnp.float32)
        out["layers"].append({"kernel_q": kq, "scale": scale, "bias": bias})
    return out


def _act_quantize(x, scale=None):
    """Symmetric int8 activation quantization.

    ``scale=None`` is dynamic (max-abs of the live tensor — one extra
    reduction pass per layer); a calibrated static scale skips that pass
    (values beyond it clip, which the ReLU pyramid tolerates)."""
    s = (jnp.maximum(jnp.max(jnp.abs(x)) / 127.0, 1e-12)
         if scale is None else scale)
    q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    return q, s


def calibrate_act_scales(trunk: str, params: Dict[str, Any],
                         batch_stats: Dict[str, Any], z) -> List[jax.Array]:
    """Per-layer static activation scales from one representative latent batch.

    Replays the eval-mode trunk in f32 (same geometry/folded BN as the int8
    path) and records max-abs of each layer's input. GAN trunks are stationary
    at serving time (fixed weights, z ~ N(0, I)), so one calibration batch
    generalizes; ``int8_trunk_apply(..., act_scales=...)`` then runs without
    any per-batch reduction passes."""
    geometry = TRUNK_GEOMETRY[trunk]
    h = jnp.asarray(z, jnp.float32)
    scales = []
    n_layers = len(geometry)
    for i, (conv_name, bn_name, stride, pad) in enumerate(geometry):
        scales.append(jnp.maximum(jnp.max(jnp.abs(h)) / 127.0, 1e-12))
        k = jnp.asarray(params[conv_name]["kernel"], jnp.float32)
        y = jax.lax.conv_general_dilated(
            h, k, window_strides=(1, 1),
            padding=((k.shape[0] - 1 - pad,) * 2, (k.shape[1] - 1 - pad,) * 2),
            lhs_dilation=(stride, stride), dimension_numbers=_dn())
        if bn_name is not None:
            bn_scale, bn_bias = _fold_bn(params[bn_name], batch_stats[bn_name])
            y = y * bn_scale + bn_bias
        h = jax.nn.relu(y) if i < n_layers - 1 else y
    return scales


def _deconv_i8(xq, kq, stride: int, torch_pad: int):
    k = kq.shape[0]
    pad = k - 1 - torch_pad
    return jax.lax.conv_general_dilated(
        xq, kq, window_strides=(1, 1), padding=((pad, pad), (pad, pad)),
        lhs_dilation=(stride, stride), dimension_numbers=_dn(),
        preferred_element_type=jnp.int32)


def int8_trunk_apply(trunk: str, qparams: Dict[str, Any], z,
                     act_scales: Optional[List[jax.Array]] = None) -> jax.Array:
    """z (B', 1, 1, dim_z) f32 -> frames (B', H, W, C) f32 in [-1, 1].

    Numerically the eval-mode trunk with int8 convs: output error vs the f32
    path is bounded by tests/test_ops.py, far below GAN sample variability.
    ``act_scales`` (from :func:`calibrate_act_scales`) switches activation
    quantization from dynamic to static — no per-batch reduction passes.
    """
    geometry = TRUNK_GEOMETRY[trunk]
    h = jnp.asarray(z, jnp.float32)
    n_layers = len(geometry)
    for i, ((_, _, stride, pad), layer) in enumerate(zip(geometry,
                                                         qparams["layers"])):
        hq, a_scale = _act_quantize(
            h, None if act_scales is None else act_scales[i])
        y = _deconv_i8(hq, layer["kernel_q"], stride, pad)
        h = y.astype(jnp.float32) * (a_scale * layer["scale"]) + layer["bias"]
        if i < n_layers - 1:
            h = jax.nn.relu(h)
    if trunk == "mnist28":
        h = h[:, 2:-2, 2:-2, :]  # the k1s1p2 crop
    return jnp.tanh(h)
