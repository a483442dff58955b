#!/usr/bin/env python
"""Measure whether JAX's persistent compilation cache helps on this backend.

Every fresh process pays the train-step compile (~100 s on the TPU tunnel for
the full-size step). JAX can persist compiled executables to disk
(`jax_compilation_cache_dir`) and reload them in later processes; whether that
works through a remote/tunneled backend is an empirical question — this script
answers it by running the same jitted program in two child processes sharing a
cache dir and comparing their compile walltimes.

  python scripts/bench_compile_cache.py            # TPU (default backend)
  python scripts/bench_compile_cache.py --cpu      # CPU sanity check

Prints one JSON line: {"cold_s": ..., "warm_s": ..., "speedup": ..., ...}.
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

_CHILD = """
import sys, time
sys.path.insert(0, {repo!r})
import jax
if {cpu!r}:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", {cache!r})
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
from ganode_tpu.models import PatchImageDiscriminator, VideoDiscriminator, make_generator
from ganode_tpu.train import GANTrainer

T = 8
gen = make_generator("ode", n_channels=1, trunk="mnist28", video_length=T,
                     dim_z_content=10, dim_z_motion=8, ngf=8)
trainer = GANTrainer(gen=gen, dis_img=PatchImageDiscriminator(ndf=8),
                     dis_vid=VideoDiscriminator(ksize=2, ndf=8),
                     batch_size=4, d_iters=1)
state = jax.jit(trainer.init_state)(jax.random.PRNGKey(0))
import numpy as np
rng = np.random.RandomState(0)
images = jnp.asarray(rng.uniform(-1, 1, (1, 4, 28, 28, 1)).astype("float32"))
videos = jnp.asarray(rng.uniform(-1, 1, (1, 4, T, 28, 28, 1)).astype("float32"))
step = jax.jit(trainer.train_step)
t0 = time.time()
lowered = step.lower(state, images, videos, jax.random.PRNGKey(1))
compiled = lowered.compile()
compile_s = time.time() - t0
new_state, metrics = compiled(state, images, videos, jax.random.PRNGKey(1))
_ = float(metrics["gen_loss"])  # real host sync (block_until_ready is a no-op
                                # on the axon tunnel)
print("COMPILE_SECONDS", compile_s)
"""


def run_child(repo: str, cache: str, cpu: bool):
    code = _CHILD.format(repo=repo, cache=cache, cpu=cpu)
    t0 = time.time()
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=1800)
    wall = time.time() - t0
    if proc.returncode != 0:
        raise RuntimeError(f"child failed:\n{proc.stderr[-3000:]}")
    for line in proc.stdout.splitlines():
        if line.startswith("COMPILE_SECONDS"):
            return float(line.split()[1]), wall
    raise RuntimeError(f"no COMPILE_SECONDS in child output:\n{proc.stdout}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--cache-dir", default=None,
                   help="persistent cache location (default: a fresh tempdir, "
                        "i.e. a guaranteed-cold first run)")
    args = p.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache = args.cache_dir or tempfile.mkdtemp(prefix="jaxcache_")
    os.makedirs(cache, exist_ok=True)

    cold_compile, cold_wall = run_child(repo, cache, args.cpu)
    entries = sum(len(fs) for _, _, fs in os.walk(cache))
    warm_compile, warm_wall = run_child(repo, cache, args.cpu)

    out = {
        "metric": "persistent_compile_cache_speedup",
        "backend": "cpu" if args.cpu else "default",
        "cache_dir": cache,
        "cache_entries_after_cold": entries,
        "cold_compile_s": round(cold_compile, 2),
        "warm_compile_s": round(warm_compile, 2),
        "cold_wall_s": round(cold_wall, 2),
        "warm_wall_s": round(warm_wall, 2),
        "speedup": round(cold_compile / max(warm_compile, 1e-9), 2),
        "cache_effective": entries > 0 and warm_compile < 0.5 * cold_compile,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
