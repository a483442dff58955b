#!/usr/bin/env python
"""Measure the round-3 D_vid throughput candidates on TPU.

Two independent levers against the d_vid_fwd_bwd bottleneck (BENCH_r02:
64.6 TFLOP/s vs 197 peak, ~3 occurrences/step):

1. fused real+fake pass — ONE concatenated 2B discriminator pass per loss
   instead of two B passes (GANTrainer.fused_real_fake). Times the actual
   `_d_update`-shaped value_and_grad (BN threading included) both ways.
2. folded input gradient for the MID conv layers — conv3d_s122_dx_tfold
   (ops/conv3d_grad.py) is generic in C_in; round 2 only applied it to the
   first conv (C_in=3 pathology). Measures native-vs-tfold gx at the
   L1/L2/L3 shapes of the ksize-4 VideoDiscriminator to decide whether the
   fold also wins where C_in is already lane-dense.

Timing discipline (axon tunnel: block_until_ready is a no-op): the measured
function is chained through a lax.scan whose carry perturbs the next input,
so K executions serialize on-device; wall time comes from a two-point slope
so fixed per-call session costs cancel. The timed scalar SUMS THE GRADIENTS
into the result — without that, XLA dead-code-eliminates the whole backward
pass and the numbers are garbage (measured: "-102 ms").

Prints one JSON object. Run on a quiet TPU (one process at a time).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def slope_time(fn_scalar, x, K=8, n1=2, n2=6):
    """Wall seconds per call of fn_scalar(x)->f32 scalar, serialized K deep."""

    def run_k(x, s0):
        def body(acc, _):
            return fn_scalar(x + acc.astype(x.dtype) * 1e-9) * 1e-9, None
        out, _ = jax.lax.scan(body, s0, None, length=K)
        return out

    f = jax.jit(run_k)
    float(f(x, jnp.float32(0)))  # compile + warm

    def run(n):
        acc = jnp.float32(0)
        for _ in range(n):
            acc = f(x, acc)
        return float(acc)

    t0 = time.time(); run(n1); ta = time.time() - t0
    t0 = time.time(); run(n2); tb = time.time() - t0
    return (tb - ta) / (n2 - n1) / K


def _grad_anchor(loss, grads):
    """Scalar that depends on every gradient leaf (defeats DCE of the bwd)."""
    return loss + 1e-12 * sum(jnp.sum(g.astype(jnp.float32))
                              for g in jax.tree.leaves(grads))


def bench_fused_pass(out):
    from ganode_tpu.models import VideoDiscriminator
    from ganode_tpu.train.losses import LOSSES

    B, T, S = 32, 16, 64
    mod = VideoDiscriminator(ksize=4, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    real = jnp.asarray(rng.uniform(-1, 1, (B, T, S, S, 3)), jnp.float32)
    fake = jnp.asarray(rng.uniform(-1, 1, (B, T, S, S, 3)), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), real)
    params, stats = variables["params"], variables["batch_stats"]
    d_loss_fn, _ = LOSSES["bce"]

    def loss_two(params, real):
        (pr, _), mut = mod.apply({"params": params, "batch_stats": stats},
                                 real, mutable=["batch_stats"])
        (pf, _), _ = mod.apply({"params": params, **mut},
                               fake, mutable=["batch_stats"])
        return d_loss_fn(pr, pf)

    def loss_fused(params, real):
        (p, _), _ = mod.apply(
            {"params": params, "batch_stats": stats},
            jnp.concatenate([real, fake], axis=0), mutable=["batch_stats"])
        return d_loss_fn(p[:B], p[B:])

    for name, fn in (("two_pass", loss_two), ("fused", loss_fused)):
        def scalar(r, fn=fn):
            loss, grads = jax.value_and_grad(fn)(params, r)
            return _grad_anchor(loss, grads)
        ms = slope_time(scalar, real) * 1e3
        out[f"d_update_{name}_ms"] = round(ms, 3)
    out["d_update_fused_speedup"] = round(
        out["d_update_two_pass_ms"] / out["d_update_fused_ms"], 3)


def bench_mid_gx(out):
    from ganode_tpu.ops.conv3d_grad import conv3d_s122, conv3d_s122_dx_tfold

    B, ndf = 32, 64
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    # (T_in, S_in, Cin, Cout) of the ksize-4 VideoDiscriminator mid layers
    layers = [(13, 32, ndf, ndf * 2), (10, 16, ndf * 2, ndf * 4),
              (7, 8, ndf * 4, ndf * 8)]
    for li, (T, S, ci, co) in enumerate(layers, start=1):
        x = jnp.asarray(rng.uniform(-1, 1, (B, T, S, S, ci)), dtype)
        w = jnp.asarray(rng.normal(0, 0.02, (4, 4, 4, ci, co)), dtype)
        y = conv3d_s122(x, w)
        dy = jnp.asarray(rng.normal(0, 1, y.shape), dtype)

        def dx_native(dy):
            _, vjp = jax.vjp(lambda a: conv3d_s122(a, w), x)
            (dx,) = vjp(dy)
            return dx

        def dx_tfold(dy):
            return conv3d_s122_dx_tfold(dy, w, x.shape[1], x.shape[2],
                                        x.shape[3])

        # elementwise equality in f32 (a summed check cancels to noise)
        a = np.asarray(jax.jit(dx_native)(dy), np.float32)
        b = np.asarray(jax.jit(dx_tfold)(dy), np.float32)
        rel = float(np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-12))
        out[f"L{li}_gx_max_rel_err"] = round(rel, 5)
        for name, fn in (("native", dx_native), ("tfold", dx_tfold)):
            scalar = lambda d, fn=fn: jnp.sum(fn(d).astype(jnp.float32))
            ms = slope_time(scalar, dy) * 1e3
            out[f"L{li}_gx_{name}_ms"] = round(ms, 3)
        out[f"L{li}_tfold_speedup"] = round(
            out[f"L{li}_gx_native_ms"] / out[f"L{li}_gx_tfold_ms"], 3)


def main():
    out = {"backend": jax.default_backend()}
    bench_fused_pass(out)
    bench_mid_gx(out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
