#!/usr/bin/env python
"""One jitted training step for every README variant on the current backend.

The CPU test suite proves semantics; this proves every variant's full training
step (including its solver) compiles and executes on real TPU hardware:

  python scripts/tpu_smoke.py            # all five motion variants
  python scripts/tpu_smoke.py --trunks   # also the gres64 / odegres64 trunks
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trunks", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ganode_tpu.models import (
        PatchImageDiscriminator, VideoDiscriminator, make_generator)
    from ganode_tpu.train import GANTrainer

    B, T = 8, 16
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.uniform(-1, 1, (1, B, 28, 28, 1)), jnp.float32)
    videos = jnp.asarray(rng.uniform(-1, 1, (1, B, T, 28, 28, 1)), jnp.float32)
    images64 = jnp.asarray(rng.uniform(-1, 1, (1, B, 64, 64, 1)), jnp.float32)
    videos64 = jnp.asarray(rng.uniform(-1, 1, (1, B, T, 64, 64, 1)), jnp.float32)

    cases = [(v, "mnist28") for v in ("gru", "ode", "sde", "cde", "ode_rnn")]
    if args.trunks:
        cases += [("ode", "gres64"), ("ode", "odegres64")]

    results = {}
    for variant, trunk in cases:
        name = f"{variant}/{trunk}"
        t0 = time.time()
        gen = make_generator(variant, n_channels=1, trunk=trunk, ngf=16,
                             dim_z_content=16, dim_z_motion=8, video_length=T)
        trainer = GANTrainer(
            gen=gen, dis_img=PatchImageDiscriminator(ndf=16),
            dis_vid=VideoDiscriminator(ksize=2, ndf=16),
            batch_size=B, d_iters=1)
        state = jax.jit(trainer.init_state)(jax.random.PRNGKey(0))
        step = jax.jit(trainer.train_step, donate_argnums=())
        im, vi = (images64, videos64) if trunk != "mnist28" else (images, videos)
        state, metrics = step(state, im, vi, jax.random.PRNGKey(1))
        vals = {k: float(v) for k, v in metrics.items()}  # host sync
        ok = all(np.isfinite(v) for v in vals.values())
        results[name] = {
            "ok": bool(ok),
            "losses": {k: round(v, 4) for k, v in vals.items()},
            "seconds": round(time.time() - t0, 1),
        }
        print(f"{name}: {'OK' if ok else 'FAIL'} {results[name]}", flush=True)

    print(json.dumps({"backend": jax.default_backend(), "results": results}))
    if not all(r["ok"] for r in results.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
