#!/usr/bin/env python
"""Microbenchmark: the D_vid chain's BACKWARD — native Conv3D vs time-folded 2D.

bench.py's per-phase profile shows the video discriminator's forward at ~57%
MFU but its fwd+bwd at only ~25%: XLA's gradient convs for kernel (4,4,4),
stride (1,2,2), unpadded time are poorly tiled. Folding the 4 time taps into
the channel axis turns each 3D conv into ONE standard 2D conv over B*T_out
frames:

    win[b, t, h, w, kt*C + c] = x[b, t + kt, h, w, c]
    out[b, t] = conv2d(win[b, t], W2d),  W2d[ky, kx, kt*C+c, co] = W[kt, ky, kx, c, co]

identical arithmetic, but both the forward and its data/weight gradients are
plain stride-2 2D convs — the shape class XLA already runs at ~94% MFU on the
generator trunk. Costs one materialized 4x window copy per layer (HBM traffic,
~0.3 GB/step at these shapes) against a ~2x backward-compute win.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chain_native(x, ws):
    h = x
    for i, w in enumerate(ws):
        strides = (1, 2, 2) if i < 4 else (1, 1, 1)
        pad = ((0, 0), (1, 1), (1, 1)) if i < 4 else ((0, 0), (0, 0), (0, 0))
        h = jax.lax.conv_general_dilated(
            h, w, window_strides=strides, padding=pad,
            dimension_numbers=("NTHWC", "THWIO", "NTHWC"))
        if i < 4:
            h = jax.nn.leaky_relu(h, 0.2)
    return h


def fold_time(x, kt):
    """(B, T, H, W, C) -> (B, T-kt+1, H, W, kt*C) stacked time windows."""
    t_out = x.shape[1] - kt + 1
    return jnp.concatenate([x[:, j:j + t_out] for j in range(kt)], axis=-1)


def fold_kernel(w):
    """(kt, ky, kx, Ci, Co) -> (ky, kx, kt*Ci, Co) matching fold_time order."""
    kt, ky, kx, ci, co = w.shape
    return jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(ky, kx, kt * ci, co)


def chain_folded(x, ws2d):
    h = x
    for i, w in enumerate(ws2d):
        kt = 4
        win = fold_time(h, kt)
        B, T = win.shape[:2]
        flat = win.reshape(B * T, *win.shape[2:])
        strides = (2, 2) if i < 4 else (1, 1)
        pad = ((1, 1), (1, 1)) if i < 4 else ((0, 0), (0, 0))
        y = jax.lax.conv_general_dilated(
            flat, w, window_strides=strides, padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = y.reshape(B, T, *y.shape[1:])
        if i < 4:
            h = jax.nn.leaky_relu(h, 0.2)
    return h


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
    B, T, S, C = 32, 16, 64, 3
    ndf = 64
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, T, S, S, C)), dtype)
    chans = [(C, ndf), (ndf, ndf * 2), (ndf * 2, ndf * 4), (ndf * 4, ndf * 8),
             (ndf * 8, 1)]
    ws = [jnp.asarray(rng.normal(0, 0.02, (4, 4, 4, ci, co)), dtype)
          for ci, co in chans]
    ws2d = [fold_kernel(w) for w in ws]

    y1 = jax.jit(chain_native)(x, ws)
    y2 = jax.jit(chain_folded)(x, ws2d)
    results = {"max_abs_diff": float(jnp.max(jnp.abs(
        y1.astype(jnp.float32) - y2.astype(jnp.float32))))}

    for name, fn, w_ in (("native", chain_native, ws),
                         ("folded", chain_folded, ws2d)):
        results[f"{name}_fwd_ms"] = slope_time(
            lambda x_, fn=fn, w_=w_: jnp.sum(fn(x_, w_).astype(jnp.float32)),
            x) * 1e3

        # full training-style gradient: wrt input AND weights
        def grad_scalar(x_, fn=fn, w_=w_):
            def loss(xw):
                return jnp.sum(fn(xw[0], xw[1]).astype(jnp.float32))
            gx, gw = jax.grad(loss)((x_, w_))
            return (jnp.sum(gx.astype(jnp.float32))
                    + sum(jnp.sum(g.astype(jnp.float32)) for g in gw))

        results[f"{name}_fwd_bwd_ms"] = slope_time(grad_scalar, x) * 1e3

    import json
    results["backend"] = jax.default_backend()
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
