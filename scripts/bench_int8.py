#!/usr/bin/env python
"""Can int8 beat bf16 for the serving trunk's deconvolutions on this TPU?

v5e's MXU advertises 2x int8 throughput over bf16 (394 vs 197 T), so a
quantized serving path (per-channel int8 weights, dynamic per-tensor int8
activations) is the obvious candidate for the generation benchmark. This
microbenches the primitive that would carry it — ``lax.conv_general_dilated``
with lhs_dilation 2 (the transposed conv), s8 x s8 -> s32 — against the bf16
deconv XLA already emits, on the DCGANTrunk64's three FLOP-dominant layer
shapes (ganode_tpu/models/mocogan.py:57-77) at the serving batch 512
(B' = B*T = 8192 frames).

Prints one JSON line; the verdict feeds docs/DESIGN.md (built or refuted by
the numbers, like every other perf candidate).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--frames", type=int, default=8192,
                   help="B' = batch*T frames through the 2D trunk")
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    Bp = args.frames
    # (H_in, C_in, C_out) for the k4 s2 p1 deconvs; H_out = 2*H_in
    layers = [(4, 512, 256), (8, 256, 128), (16, 128, 64)]

    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))

    def deconv(x, w, acc_dtype):
        # transposed conv k4 s2 p1 == lhs-dilated conv, padding k-p-1 = 2
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=((2, 2), (2, 2)),
            lhs_dilation=(2, 2), dimension_numbers=dn,
            preferred_element_type=acc_dtype)

    def slope(raw_fn, x, w, K=8, n1=2, n2=8):
        # Two-point slope with the running scalar written into one input
        # element so XLA cannot overlap or eliminate iterations, synced via
        # float() — block_until_ready is a no-op on the axon backend.
        def scalarize(x, s):
            if x.dtype == jnp.int8:
                v = (s.astype(jnp.int32) % 127).astype(jnp.int8)
            else:
                v = (s * 1e-9).astype(x.dtype)
            return x.at[0, 0, 0, 0].set(v)

        def run_k(x, w, s0):
            def body(acc, _):
                o = raw_fn(scalarize(x, acc), w)
                return o.sum().astype(jnp.float32) * 1e-9, None
            out, _ = jax.lax.scan(body, s0, None, length=K)
            return out

        f = jax.jit(run_k)
        float(f(x, w, jnp.float32(0)))

        def run(n):
            acc = jnp.float32(0)
            for _ in range(n):
                acc = f(x, w, acc)
            return acc

        t0 = time.time(); float(run(n1)); ta = time.time() - t0
        t0 = time.time(); float(run(n2)); tb = time.time() - t0
        return (tb - ta) / ((n2 - n1) * K)

    rng = np.random.RandomState(0)
    out = {"metric": "deconv_int8_vs_bf16", "frames": Bp,
           "backend": jax.default_backend(), "layers": []}
    for (H, Ci, Co) in layers:
        x_f = jnp.asarray(rng.uniform(-1, 1, (Bp, H, H, Ci)), jnp.bfloat16)
        w_f = jnp.asarray(rng.uniform(-0.1, 0.1, (4, 4, Ci, Co)), jnp.bfloat16)
        x_i = jnp.asarray(rng.randint(-127, 128, (Bp, H, H, Ci)), jnp.int8)
        w_i = jnp.asarray(rng.randint(-127, 128, (4, 4, Ci, Co)), jnp.int8)

        f_bf16 = lambda x, w: deconv(x, w, jnp.float32)
        row = {"shape": f"{H}x{H}x{Ci}->{2*H}x{2*H}x{Co}"}
        t_b = slope(f_bf16, x_f, w_f)
        flops = 2 * Bp * (2 * H) * (2 * H) * Co * Ci * 4  # k=4, s=2: 4 taps/out
        row["bf16_ms"] = round(t_b * 1e3, 3)
        row["bf16_tflops"] = round(flops / t_b / 1e12, 1)
        try:
            f_int8 = lambda x, w: deconv(x, w, jnp.int32)
            t_i = slope(f_int8, x_i, w_i)
            row["int8_ms"] = round(t_i * 1e3, 3)
            row["int8_tops"] = round(flops / t_i / 1e12, 1)
            row["int8_speedup"] = round(t_b / t_i, 2)
        except Exception as e:
            row["int8_error"] = repr(e)[:160]
        out["layers"].append(row)

    ok = [r.get("int8_speedup") for r in out["layers"] if "int8_speedup" in r]
    out["verdict"] = ("int8 wins" if ok and min(ok) > 1.15 else
                      "refuted" if ok else "unsupported")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
