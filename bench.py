#!/usr/bin/env python
"""Headline benchmark: MoCoGAN + Neural-ODE full training-step throughput.

Measures the reference's flagship configuration (ucf_moco_ode.py: batch 32,
16-frame 64x64 RGB clips, ODE motion latent with rk4 [60 NFE/solve], d_iters=2
alternating updates + 1 generator update) as steady-state clips/sec/chip on the
current default JAX backend (the TPU when run by the driver).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/s/chip", "vs_baseline": N/BASELINE}

Methodology notes:
* state init is jitted (eager init through a remote-tunnel backend dispatches
  thousands of tiny ops);
* timing is a two-point slope — T(N2 steps) - T(N1 steps) over N2-N1 — with a
  host sync (scalar fetch) at each endpoint, so fixed sync/session costs cancel;
* BASELINE: the reference publishes no numbers (BASELINE.md). We use an estimated
  reference GPU throughput of 64 clips/s — batch 32 at ~0.5 s/step on the
  Colab-class GPU it trained on (its step runs 2x(D_img+D_vid)+G updates whose
  sample_images path alone solves 1024 ODE trajectories,
  reference mnist_moco_ode.py:111-163, models/mocogan.py:287-295). The
  north-star target is 5x => >= 320 clips/s/chip.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_CLIPS_PER_SEC = 64.0  # estimated reference GPU step throughput (see above)


def main():
    from ganode_tpu.models import (
        PatchImageDiscriminator, VideoDiscriminator, make_generator,
    )
    from ganode_tpu.train import GANTrainer

    B, T = 32, 16
    # TPU-native precision: bfloat16 conv/deconv compute (f32 params/logits) and
    # the motion solve fused into one Pallas kernel. Measured v5e deltas vs f32:
    # 803 -> 949 clips/s from bf16, +~1% from the fused solver at full-step level
    # (the solve is 5.1x faster standalone but small relative to the trunk).
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    use_pallas = jax.default_backend() == "tpu"
    gen = make_generator("ode", n_channels=3, trunk="dcgan64",
                         dim_z_content=50, dim_z_motion=16, video_length=T,
                         dtype=dtype, use_pallas=use_pallas)
    trainer = GANTrainer(
        gen=gen,
        dis_img=PatchImageDiscriminator(dtype=dtype),
        dis_vid=VideoDiscriminator(ksize=4, dtype=dtype),
        batch_size=B, d_iters=2,
    )

    key = jax.random.PRNGKey(0)
    state = jax.jit(trainer.init_state)(key)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.uniform(-1, 1, (2, B, 64, 64, 3)), jnp.float32)
    videos = jnp.asarray(rng.uniform(-1, 1, (2, B, T, 64, 64, 3)), jnp.float32)

    step = jax.jit(trainer.train_step, donate_argnums=())

    def sync(metrics):
        return float(metrics["gen_loss"])  # scalar fetch = real host sync

    # compile + first-execution warmup
    t0 = time.time()
    state, metrics = step(state, images, videos, jax.random.fold_in(key, 0))
    first_loss = sync(metrics)
    compile_s = time.time() - t0
    for i in range(5):
        state, metrics = step(state, images, videos, jax.random.fold_in(key, 1 + i))
    sync(metrics)

    def timed(n, offset):
        t0 = time.time()
        s = state
        m = metrics
        for i in range(n):
            s, m = step(s, images, videos, jax.random.fold_in(key, offset + i))
        sync(m)
        return time.time() - t0

    n1, n2 = 10, 60
    t1 = timed(n1, 100)
    t2 = timed(n2, 200)
    step_time = (t2 - t1) / (n2 - n1)
    clips_per_sec = B / step_time

    result = {
        "metric": "ucf64_mocogan_ode_train_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s/chip",
        "vs_baseline": round(clips_per_sec / REFERENCE_CLIPS_PER_SEC, 3),
        "step_time_ms": round(step_time * 1000, 2),
        "compile_s": round(compile_s, 1),
        "first_gen_loss": round(first_loss, 4),
        "ode_nfe_per_solve": 60,
        "solves_per_step": 8,  # (img + vid samples) x (2 d_iters + 1 G step w/ grad)
        "precision": "bf16+fused_pallas_rk4" if jax.default_backend() == "tpu" else "f32",
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
