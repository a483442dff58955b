#!/usr/bin/env python
"""Measured feed-rate comparison: Python UCF101ClipSampler vs the native C++
thread ring (runtime/clip_loader.cc), at the training shapes.

The question it answers: can each loader keep a 32 ms TPU train step
(BENCH_r02: 987 clips/s at B=32) fed from the host? Prints one JSON line with
batches/s, clips/s, and the step-budget verdict for both paths.

  python scripts/bench_native_loader.py [--batch-size 32] [--n-batches 64]
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--n-frame", type=int, default=16)
    p.add_argument("--n-batches", type=int, default=64)
    p.add_argument("--n-videos", type=int, default=64)
    p.add_argument("--video-len", type=int, default=64)
    p.add_argument("--threads", type=int, default=4)
    p.add_argument("--step-budget-ms", type=float, default=32.39,
                   help="TPU step time the loader must beat (BENCH_r02)")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from ganode_tpu.data import pack_arrays
    from ganode_tpu.data.ucf101 import UCF101ClipSampler
    from ganode_tpu.runtime import NativeClipSampler

    rng = np.random.RandomState(0)
    videos = [rng.randint(0, 255, (args.video_len, 64, 64, 3), dtype=np.uint8)
              for _ in range(args.n_videos)]
    with tempfile.TemporaryDirectory() as d:
        pack_dir = os.path.join(d, "pack")
        pack_arrays(pack_dir, videos, list(range(args.n_videos)))

        def rate(fn, warmup=4):
            for i in range(warmup):
                fn(i)
            t0 = time.perf_counter()
            for i in range(args.n_batches):
                fn(warmup + i)
            return args.n_batches / (time.perf_counter() - t0)

        py = UCF101ClipSampler(pack_dir, args.batch_size,
                               n_frame=args.n_frame)
        key = jax.random.PRNGKey(0)
        py_rate = rate(lambda i: py.sample(jax.random.fold_in(key, i)))

        nat = NativeClipSampler(pack_dir, args.batch_size,
                                n_frame=args.n_frame,
                                n_threads=args.threads)
        nat_rate = rate(lambda i: nat.sample(None))
        nat.close()

    budget_batches_per_s = 1000.0 / args.step_budget_ms
    out = {
        "shape": [args.batch_size, args.n_frame, 64, 64, 3],
        "python_batches_per_sec": round(py_rate, 2),
        "native_batches_per_sec": round(nat_rate, 2),
        "native_vs_python": round(nat_rate / py_rate, 2),
        "python_clips_per_sec": round(py_rate * args.batch_size, 1),
        "native_clips_per_sec": round(nat_rate * args.batch_size, 1),
        "step_budget_batches_per_sec": round(budget_batches_per_s, 2),
        "python_feeds_step": py_rate >= budget_batches_per_s,
        "native_feeds_step": nat_rate >= budget_batches_per_s,
        "threads": args.threads,
        "host_cores": os.cpu_count(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
