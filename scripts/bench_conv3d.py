#!/usr/bin/env python
"""Microbenchmark: XLA native 3-D conv vs time-tap decomposition on TPU.

The full-step profile (bench.py phase_ms) is dominated by the ksize-4 video
discriminator (reference models/mocogan.py:129-164): five Conv3D layers with
kernel (4,4,4), stride (1,2,2), unpadded time. A (4,4,4)/(1,2,2) conv is
algebraically the sum over the 4 time taps of a 2-D (4,4)/(2,2) conv applied
to time-shifted frame blocks:

    out[:, t] = sum_kt conv2d(x[:, t + kt], W[kt])

which turns one 3-D conv into 4 large batched 2-D convs over B*T_out frames —
exactly the big-batch MXU shape the generator trunk already uses. This script
slope-times the discriminator conv chain both ways (fwd and fwd+grad, bf16)
to decide which lowering the models should use on TPU.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def conv3d_native(x, ws):
    """Five-layer chain with jax native 3D convs (NTHWC)."""
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


def conv3d_timetap(x, ws):
    """Same chain with each 3D conv as sum-of-4 time taps of 2D convs."""
    h = x
    for i, w in enumerate(ws):
        kt = w.shape[0]
        t_out = h.shape[1] - kt + 1
        strides = (2, 2) if i < 4 else (1, 1)
        pad = ((1, 1), (1, 1)) if i < 4 else ((0, 0), (0, 0))
        acc = None
        for j in range(kt):
            frames = h[:, j:j + t_out]                       # (B, T', H, W, C)
            B, T = frames.shape[:2]
            flat = frames.reshape(B * T, *frames.shape[2:])  # (B*T', H, W, C)
            y = jax.lax.conv_general_dilated(
                flat, w[j], window_strides=strides, padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            acc = y if acc is None else acc + y
        h = acc.reshape(B, T, *acc.shape[1:])
        if i < 4:
            h = jax.nn.leaky_relu(h, 0.2)
    return h


def slope_time(fn_scalar, x, K=16, n1=2, n2=8):
    """fn_scalar(x) -> f32 scalar. Repeats K times inside one jit via scan with
    genuine data-dependent chaining (the accumulator perturbs the next input at
    1e-9 scale, which XLA cannot fold away), then a two-point slope over
    dispatch counts — robust against the remote tunnel's async dispatch."""
    def run_k(x, s0):
        def body(acc, _):
            y = fn_scalar(x + acc.astype(x.dtype) * 1e-9)
            return y * 1e-9, None
        out, _ = jax.lax.scan(body, s0, None, length=K)
        return out

    f = jax.jit(run_k)
    float(f(x, jnp.float32(0)))  # compile + warm

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

    results = {}
    for name, fn in (("native", conv3d_native), ("timetap", conv3d_timetap)):
        def fwd_scalar(x_, fn=fn):
            return jnp.sum(fn(x_, ws).astype(jnp.float32))

        results[f"{name}_fwd_ms"] = slope_time(fwd_scalar, x) * 1e3

        def grad_scalar(x_, fn=fn):
            def loss(ws_):
                return jnp.sum(fn(x_, ws_).astype(jnp.float32))
            gs = jax.grad(loss)(ws)
            return sum(jnp.sum(g.astype(jnp.float32)) for g in gs)

        results[f"{name}_grad_ms"] = slope_time(grad_scalar, x) * 1e3

    # numerical equivalence
    y1 = jax.jit(conv3d_native)(x, ws)
    y2 = jax.jit(conv3d_timetap)(x, ws)
    results["max_abs_diff"] = float(jnp.max(jnp.abs(
        y1.astype(jnp.float32) - y2.astype(jnp.float32))))

    import json
    results["backend"] = jax.default_backend()
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
