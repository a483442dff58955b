#!/usr/bin/env python
"""Build the labeled synthetic UCF101 stand-in corpus and pack it.

Real UCF101 is unreachable from this environment (no egress; BASELINE.md
records the fetch probe), so this writes variable-length 320x240 MJPG .avi
clips of moving colored squares in the reference's directory layout
(dataset/ucf101new.py:35-68) and runs the REAL offline pack over them
(cv2 decode -> resize(64,85) bicubic -> crop x[10:74] -> flat uint8 mmap),
so every stage of the video pipeline short of the downloader is the one a
real UCF101 run would use.

  python scripts/make_synthetic_ucf101.py --root data/synth-ucf \
      --pack-out data/synth-ucf-pack --n-videos 2048
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True, help="corpus root (videos/ + annotations/)")
    p.add_argument("--pack-out", default=None,
                   help="also run pack_ucf101 into this directory")
    p.add_argument("--n-videos", type=int, default=2048)
    p.add_argument("--min-frames", type=int, default=32)
    p.add_argument("--max-frames", type=int, default=64)
    p.add_argument("--fps", type=float, default=25.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--image-size", type=int, default=64)
    args = p.parse_args()

    from ganode_tpu.data import pack_ucf101, write_corpus

    t0 = time.time()
    train_paths, train_labels = write_corpus(
        args.root, args.n_videos, min_frames=args.min_frames,
        max_frames=args.max_frames, fps=args.fps, seed=args.seed,
        progress=True)
    t_enc = time.time() - t0
    print(f"encoded {args.n_videos} videos ({len(train_paths)} train) "
          f"in {t_enc:.0f}s")

    if args.pack_out:
        t0 = time.time()
        pack_ucf101(args.root, args.pack_out, image_size=args.image_size)
        t_pack = time.time() - t0
        with open(os.path.join(args.pack_out, "meta.json")) as f:
            meta = json.load(f)
        print(f"packed {len(meta['paths'])} videos / "
              f"{meta['total_frames']} frames in {t_pack:.0f}s "
              f"-> {args.pack_out}")


if __name__ == "__main__":
    main()
