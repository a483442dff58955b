#!/usr/bin/env python
"""Microbenchmark: ConvTranspose (stride 2, k=4, p=1) vs subpixel decomposition.

XLA lowers a transposed conv as a regular conv over the input-dilated
(zero-stuffed) grid. If that lowering doesn't exploit the zeros, it executes
k^2 = 16 MACs per output where the algebra needs only k^2/s^2 = 4 — a 4x
waste on the generator trunk's doubling stages. The subpixel (depth-to-space)
form computes the same map as ONE k=2 conv producing 4*C_out channels on the
1-padded input followed by a parity interleave:

    out[2m+a, 2n+b, c] = conv2x2(xpad, W[:, :, :, (a, b, c)])[m + a, n + b]

with kernel taps W_sub[dy, dx, ci, (a,b,co)] = W_ct[3-a-2dy, 3-b-2dx, ci, co]
(derived from torch's ConvTranspose2d index algebra; ky = oy + p - 2*iy).

This script checks exact equivalence of the two forms and slope-times the
four-stage DCGAN trunk chain (reference models/mocogan.py:200-215 geometry,
B*T = 512 frames) both ways, fwd and fwd+grad, in bf16 on the current backend.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def deconv_native(x, w):
    """flax/torch ConvTranspose(k=4, s=2, p=1) on NHWC; w: (4, 4, Cin, Cout).
    torch pad 1 -> jax transposed-conv padding (2, 2)."""
    return jax.lax.conv_transpose(
        x, w, strides=(2, 2), padding=((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def subpixel_weights(w):
    """(4, 4, Cin, Cout) ConvTranspose kernel -> (2, 2, Cin, 4*Cout) subpixel
    kernel, output channels ordered (a, b, co)."""
    taps = []
    for a in (0, 1):
        for b in (0, 1):
            # flax/lax conv_transpose applies the kernel as correlation
            # (transpose_kernel=False): parity (a, b) reads taps ky = 2*dy + a
            taps.append(jnp.stack([
                jnp.stack([w[2 * dy + a, 2 * dx + b]
                           for dx in (0, 1)], axis=0)
                for dy in (0, 1)], axis=0))
    return jnp.concatenate(taps, axis=-1)  # (2, 2, Cin, 4*Cout)


def deconv_subpixel(x, w_sub, c_out):
    """Same map as deconv_native, as one k=2 conv + parity interleave."""
    B, H, W, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, w_sub, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))    # (B, H+1, W+1, 4*Cout)
    y = y.reshape(B, H + 1, W + 1, 2, 2, c_out)
    # parity (a, b) lives at y[:, m + a, n + b, a, b]
    rows = jnp.stack([y[:, 0:H, :, 0], y[:, 1:H + 1, :, 1]], axis=2)
    rows = rows.reshape(B, 2 * H, W + 1, 2, c_out)
    cols = jnp.stack([rows[:, :, 0:W, 0], rows[:, :, 1:W + 1, 1]], axis=3)
    return cols.reshape(B, 2 * H, 2 * W, c_out)


def slope_time(fn_scalar, x, K=16, n1=2, n2=8):
    def run_k(x, s0):
        def body(acc, _):
            return fn_scalar(x + acc.astype(x.dtype) * 1e-9) * 1e-9, None
        out, _ = jax.lax.scan(body, s0, None, length=K)
        return out

    f = jax.jit(run_k)
    float(f(x, jnp.float32(0)))

    def run(n):
        acc = jnp.float32(0)
        for _ in range(n):
            acc = f(x, acc)
        return acc

    t0 = time.time(); float(run(n1)); ta = time.time() - t0
    t0 = time.time(); float(run(n2)); tb = time.time() - t0
    return (tb - ta) / (n2 - n1) / K


def main():
    BT = 512   # B=32 x T=16 frames through the trunk
    ngf = 64
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    chans = [(ngf * 8, ngf * 4), (ngf * 4, ngf * 2), (ngf * 2, ngf), (ngf, 3)]
    ws = [jnp.asarray(rng.normal(0, 0.02, (4, 4, ci, co)), dtype)
          for ci, co in chans]
    ws_sub = [subpixel_weights(w) for w in ws]
    x0 = jnp.asarray(rng.normal(0, 1, (BT, 4, 4, ngf * 8)), dtype)

    def chain_native(x, ws_):
        h = x
        for i, w in enumerate(ws_):
            h = deconv_native(h, w)
            if i < len(ws_) - 1:
                h = jax.nn.relu(h)
        return h

    def chain_subpixel(x, ws_):
        h = x
        for i, (w, (_, co)) in enumerate(zip(ws_, chans)):
            h = deconv_subpixel(h, w, co)
            if i < len(ws_) - 1:
                h = jax.nn.relu(h)
        return h

    # exact equivalence (identical arithmetic up to reassociation)
    y1 = jax.jit(chain_native)(x0, ws)
    y2 = jax.jit(chain_subpixel)(x0, ws_sub)
    diff = float(jnp.max(jnp.abs(y1.astype(jnp.float32) - y2.astype(jnp.float32))))

    results = {"max_abs_diff": diff}
    for name, fn, w_ in (("native", chain_native, ws),
                         ("subpixel", chain_subpixel, ws_sub)):
        results[f"{name}_fwd_ms"] = slope_time(
            lambda x_, fn=fn, w_=w_: jnp.sum(fn(x_, w_).astype(jnp.float32)),
            x0) * 1e3

        def grad_scalar(x_, fn=fn, w_=w_):
            def loss(wz):
                return jnp.sum(fn(x_, wz).astype(jnp.float32))
            gs = jax.grad(loss)(w_)
            return sum(jnp.sum(g.astype(jnp.float32)) for g in gs)

        results[f"{name}_grad_ms"] = slope_time(grad_scalar, x0) * 1e3

    import json
    results["backend"] = jax.default_backend()
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
