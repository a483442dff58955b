#!/usr/bin/env python
"""Per-layer, per-gradient breakdown of the D_vid conv chain on TPU.

Locates the low-MFU op in the video discriminator's backward: for each of the
five (4,4,4)/(1,2,2) conv layers, times forward, grad-wrt-input and
grad-wrt-weights separately (bf16, B=32 UCF shapes), and reports achieved
TFLOP/s against the analytic FLOP count for each direction.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def conv(x, w, last=False):
    strides = (1, 1, 1) if last else (1, 2, 2)
    pad = ((0, 0), (0, 0), (0, 0)) if last else ((0, 0), (1, 1), (1, 1))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=pad,
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"))


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
    B, ndf = 32, 64
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    # (T_in, S_in, Cin, Cout, last)
    layers = [
        (16, 64, 3, ndf, False),
        (13, 32, ndf, ndf * 2, False),
        (10, 16, ndf * 2, ndf * 4, False),
        (7, 8, ndf * 4, ndf * 8, False),
        (4, 4, ndf * 8, 1, True),
    ]
    out = {}
    for li, (T, S, ci, co, last) in enumerate(layers):
        x = jnp.asarray(rng.uniform(-1, 1, (B, T, S, S, ci)), dtype)
        w = jnp.asarray(rng.normal(0, 0.02, (4, 4, 4, ci, co)), dtype)
        t_o = T - 3
        s_o = S - 3 if last else S // 2
        flops = 2 * B * t_o * s_o * s_o * co * ci * 64  # fwd MACs*2

        # squared loss: the cotangent dy = 2*conv(...) genuinely depends on the
        # data, so neither gradient conv can be constant-folded away (with a
        # plain sum loss both grads of a linear conv are compile-time constants)
        fwd = lambda x_, w=w, last=last: jnp.sum(
            conv(x_, w, last).astype(jnp.float32))
        gx = lambda x_, w=w, last=last: jnp.sum(
            jax.grad(lambda a: jnp.sum(jnp.square(
                conv(a, w, last).astype(jnp.float32))))(x_)
            .astype(jnp.float32))
        gw = lambda x_, w=w, last=last: jnp.sum(
            jax.grad(lambda b: jnp.sum(jnp.square(
                conv(x_, b, last).astype(jnp.float32))))(w)
            .astype(jnp.float32))

        for name, fn in (("fwd", fwd), ("gx", gx), ("gw", gw)):
            ms = slope_time(fn, x) * 1e3
            # gx/gw each recompute one conv-sized pass (same MACs as fwd);
            # jax.grad also runs the forward, so 2x fwd FLOPs per call
            f = flops if name == "fwd" else 2 * flops
            out[f"L{li}_{name}_ms"] = round(ms, 3)
            out[f"L{li}_{name}_tflops"] = round(f / (ms / 1e3) / 1e12, 1)

    import json
    out["backend"] = jax.default_backend()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
