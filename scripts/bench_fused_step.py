#!/usr/bin/env python
"""Whole-train-step effect of fused_real_fake at the headline ucf_ode config.

Times the full jitted alternating step (d_iters=2 + G update, batch 32,
bf16, Pallas motion solve — exactly bench.py's headline trainer) with the
reference two-pass D updates vs the fused concatenated pass, on synthetic
device-resident data. Two-point slope timing (axon: only transfers sync).

Prints one JSON line with both step times and the implied clips/s and MFU
delta (model FLOPs unchanged — fusion reorganizes the same arithmetic into
bigger GEMM batches, so MFU scales inversely with step time).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(fused: bool):
    from ganode_tpu.train.runner import build_trainer
    from ganode_tpu.utils.config import get_config
    config = get_config("ucf_ode", compute_dtype="bfloat16",
                        fused_real_fake=fused)
    # bench.py parity: the Pallas-fused motion solve
    import dataclasses
    config = dataclasses.replace(config, use_pallas=True)
    return config, build_trainer(config)


def step_time(config, trainer, n1=10, n2=40):
    B, T = config.batch_size, config.video_length
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.uniform(-1, 1, (config.d_iters, B, 64, 64, 3)),
                         jnp.float32)
    videos = jnp.asarray(rng.uniform(-1, 1, (config.d_iters, B, T, 64, 64, 3)),
                         jnp.float32)
    state = jax.jit(trainer.init_state)(jax.random.PRNGKey(0))
    step = trainer.jitted_step(donate=False)

    t0 = time.time()
    state, m = step(state, images, videos, jax.random.PRNGKey(1))
    compile_s = time.time() - t0
    float(m["gen_loss"])

    # warm the session past post-compile jitter before the slope endpoints
    for i in range(8):
        state, m = step(state, images, videos,
                        jax.random.fold_in(jax.random.PRNGKey(9), i))
    float(m["gen_loss"])

    def run(n):
        nonlocal state
        for i in range(n):
            state, m = step(state, images, videos,
                            jax.random.fold_in(jax.random.PRNGKey(2), i))
        return float(m["gen_loss"])

    t0 = time.time(); run(n1); ta = time.time() - t0
    t0 = time.time(); run(n2); tb = time.time() - t0
    return (tb - ta) / (n2 - n1), compile_s


def main():
    out = {"backend": jax.default_backend(), "config": "ucf_ode b32 bf16"}
    for fused in (False, True):
        config, trainer = build(fused)
        s, compile_s = step_time(config, trainer)
        tag = "fused" if fused else "two_pass"
        out[f"step_{tag}_ms"] = round(s * 1e3, 2)
        out[f"compile_{tag}_s"] = round(compile_s, 1)
        out[f"clips_per_sec_{tag}"] = round(config.batch_size / s, 1)
    out["fused_step_speedup"] = round(
        out["step_two_pass_ms"] / out["step_fused_ms"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
