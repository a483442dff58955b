#!/usr/bin/env python
"""Build the rotated-MNIST video dataset (reference utils/images.py offline prep).

Reads raw MNIST idx .gz files from --mnist-dir (the files the reference downloads
from yann.lecun.com; this environment has no egress, so provide them locally) or
generates synthetic digits with --synthetic for smoke runs.

Usage:
  python scripts/build_rotmnist.py --out data/rot-mnist.npz --mnist-dir data/mnist
  python scripts/build_rotmnist.py --out data/rot-mnist.npz --synthetic
  python scripts/build_rotmnist.py --out data/rot-mnist.npz --sklearn
  python scripts/build_rotmnist.py --out data/rot-mnist-3s.npz --digits 3 ...

--sklearn uses scikit-learn's bundled real handwritten digits (1797 8x8 scans,
bicubic-upscaled to 28x28) — the closest offline stand-in for true MNIST, so
quality metrics (IS/FVD) exercise real digit shapes, not procedural squares.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--mnist-dir", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--sklearn", action="store_true",
                   help="use scikit-learn's bundled handwritten digits")
    p.add_argument("--num", type=int, default=11000,
                   help="number of digits (reference uses 10k train + 1k valid)")
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--mode", default="normal",
                   choices=["normal", "rand-end", "rsre"])
    p.add_argument("--digits", type=int, nargs="*", default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from ganode_tpu.data import build_rotmnist, load_mnist_idx

    if args.sklearn:
        from ganode_tpu.data import load_sklearn_digits

        images, labels = load_sklearn_digits(args.num, seed=args.seed)
    elif args.synthetic:
        rng = np.random.RandomState(args.seed)
        n = min(args.num, 1000)
        images = np.full((n, 28, 28), -0.5, np.float32)
        for i in range(n):
            y, x = rng.randint(4, 18, 2)
            images[i, y:y + 8, x:x + 8] = 0.5
        labels = rng.randint(0, 10, n)
    else:
        if not args.mnist_dir:
            p.error("--mnist-dir required unless --synthetic")
        images, labels = load_mnist_idx(args.mnist_dir, "train", args.num)

    digits = tuple(args.digits) if args.digits else None
    out = build_rotmnist(args.out, images, labels, num_frames=args.frames,
                         mode=args.mode, seed=args.seed, digits=digits)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
