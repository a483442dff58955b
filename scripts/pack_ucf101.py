#!/usr/bin/env python
"""One-time UCF101 offline pack: decode -> resize(64,85) bicubic -> crop 64x64 ->
flat uint8 mmap shards (replaces the reference's per-step FFmpeg decode and its
decode-everything-at-init length scan, dataset/ucf101new.py).

Usage:
  python scripts/pack_ucf101.py --root /data/ucf101 --out data/ucf101-pack \
      [--video-folder videos --annotation-folder annotations --fold 1 --test]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--video-folder", default="videos")
    p.add_argument("--annotation-folder", default="annotations")
    p.add_argument("--fold", type=int, default=1)
    p.add_argument("--test", action="store_true", help="pack the test split")
    p.add_argument("--image-size", type=int, default=64)
    p.add_argument("--n-frame", type=int, default=16)
    p.add_argument("--max-videos", type=int, default=None)
    p.add_argument("--target-fps", type=float, default=None,
                   help="resample every video to this frame rate at pack time")
    args = p.parse_args()

    from ganode_tpu.data import pack_ucf101

    out = pack_ucf101(
        args.root, args.out,
        video_folder=args.video_folder,
        annotation_folder=args.annotation_folder,
        train=not args.test, fold=args.fold,
        n_frame=args.n_frame, image_size=args.image_size,
        target_fps=args.target_fps, max_videos=args.max_videos,
    )
    print(f"packed to {out}")


if __name__ == "__main__":
    main()
