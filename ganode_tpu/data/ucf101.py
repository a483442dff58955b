"""UCF101 pipeline: one-time offline pack -> mmap'd packed shards -> infinite
PRNG-keyed clip/frame samplers.

Replaces the reference's per-step FFmpeg decode path (reference
dataset/ucf101new.py) with the layout a TPU host needs: all frames decoded once,
resized (64, 85) bicubic + x-cropped to 64x64 (the reference's exact spatial
pipeline), stored as one flat uint8 array of frames plus an index of per-video
(offset, length, label). Samplers then serve random 16-frame windows / random
frames by pure array indexing — no decoder in the hot loop, deterministic in the
PRNG key, and shardable across hosts by striding the video index.

Annotation parsing matches the reference: classInd.txt for the class map
(reference dataset/ucf101new.py:35-46) and {train,test}list0{fold}.txt for the
split (reference dataset/ucf101new.py:49-68), skipping clips shorter than
``n_frame`` at pack time (the reference re-checked this per __getitem__ with a
retry loop).
"""
from __future__ import annotations

import json
import os
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import numpy as np

from .video import probe_fps, read_video, resample_frame_indices, resize_crop

_FRAMES_FILE = "frames.u8"
_INDEX_FILE = "index.npz"
_META_FILE = "meta.json"


def parse_class_index(annotation_folder: str) -> Tuple[List[str], Dict[str, int]]:
    classes, class_to_idx = [], {}
    with open(os.path.join(annotation_folder, "classInd.txt")) as f:
        for line in f:
            parts = line.split()
            if len(parts) != 2:
                continue
            idx, name = int(parts[0]), parts[1].strip()
            classes.append(name)
            class_to_idx[name] = idx
    return classes, class_to_idx


def parse_split(annotation_folder: str, train: bool, fold: int) -> List[str]:
    if fold not in (1, 2, 3):
        raise ValueError(f"fold must be 1, 2 or 3, not {fold}")
    name = f"{'train' if train else 'test'}list0{fold}.txt"
    with open(os.path.join(annotation_folder, name)) as f:
        return [line.split()[0] for line in f if line.strip()]


def pack_ucf101(
    root: str,
    out_dir: str,
    *,
    video_folder: str = "videos",
    annotation_folder: str = "annotations",
    train: bool = True,
    fold: int = 1,
    n_frame: int = 16,
    image_size: int = 64,
    target_fps: Optional[float] = None,
    max_videos: Optional[int] = None,
    progress: bool = True,
) -> str:
    """Decode + preprocess the whole split into ``out_dir`` packed shards.

    ``target_fps`` resamples each video's frames to that rate at pack time
    (reference dataset/video/video_utils.py:350-388 semantics via
    resample_frame_indices); per-video source fps is recorded in meta.json.
    """
    os.makedirs(out_dir, exist_ok=True)
    ann = os.path.join(root, annotation_folder)
    vid_root = os.path.join(root, video_folder)
    classes, class_to_idx = parse_class_index(ann)
    rel_paths = parse_split(ann, train, fold)
    if max_videos:
        rel_paths = rel_paths[:max_videos]

    offsets, lengths, labels, kept_paths, source_fps = [], [], [], [], []
    frames_path = os.path.join(out_dir, _FRAMES_FILE)
    offset = 0
    with open(frames_path, "wb") as out:
        it = rel_paths
        if progress:
            try:
                from tqdm import tqdm
                it = tqdm(rel_paths, desc="packing UCF101")
            except ImportError:
                pass
        for rel in it:
            cls = rel.split("/")[0]
            if cls not in class_to_idx:
                continue
            path = os.path.join(vid_root, rel)
            if not os.path.exists(path):
                continue
            video = read_video(path)
            fps = probe_fps(path)
            if target_fps:
                video = video[resample_frame_indices(video.shape[0], fps,
                                                     target_fps)]
            if video.shape[0] < n_frame:
                continue
            video = resize_crop(video, image_size)
            out.write(np.ascontiguousarray(video).tobytes())
            offsets.append(offset)
            lengths.append(video.shape[0])
            labels.append(class_to_idx[cls])
            kept_paths.append(rel)
            source_fps.append(fps)
            offset += video.shape[0]

    np.savez(
        os.path.join(out_dir, _INDEX_FILE),
        offsets=np.asarray(offsets, np.int64),
        lengths=np.asarray(lengths, np.int64),
        labels=np.asarray(labels, np.int64),
    )
    with open(os.path.join(out_dir, _META_FILE), "w") as f:
        json.dump({
            "image_size": image_size, "n_frame": n_frame, "channels": 3,
            "classes": classes, "paths": kept_paths,
            "total_frames": offset,
            "target_fps": target_fps, "source_fps": source_fps,
        }, f)
    return out_dir


def pack_arrays(out_dir: str, videos: List[np.ndarray], labels: List[int],
                *, image_size: int = 64, n_frame: int = 16,
                source_fps: Optional[List[float]] = None) -> str:
    """Pack pre-decoded (T, H, W, C) uint8 arrays — the test/offline-shard path.

    ``source_fps`` optionally records per-video frame rates in meta.json so
    fps-aware clip indexing (data/clips.py) works on hand-built packs too.
    """
    os.makedirs(out_dir, exist_ok=True)
    offsets, lengths = [], []
    offset = 0
    with open(os.path.join(out_dir, _FRAMES_FILE), "wb") as out:
        for v in videos:
            v = np.ascontiguousarray(v.astype(np.uint8))
            out.write(v.tobytes())
            offsets.append(offset)
            lengths.append(v.shape[0])
            offset += v.shape[0]
    np.savez(os.path.join(out_dir, _INDEX_FILE),
             offsets=np.asarray(offsets, np.int64),
             lengths=np.asarray(lengths, np.int64),
             labels=np.asarray(labels, np.int64))
    with open(os.path.join(out_dir, _META_FILE), "w") as f:
        json.dump({"image_size": image_size, "n_frame": n_frame, "channels": 3,
                   "classes": [], "paths": [], "total_frames": offset,
                   "source_fps": source_fps}, f)
    return out_dir


class PackedVideoDataset:
    """mmap view over a packed shard directory."""

    def __init__(self, pack_dir: str):
        with open(os.path.join(pack_dir, _META_FILE)) as f:
            self.meta = json.load(f)
        idx = np.load(os.path.join(pack_dir, _INDEX_FILE))
        self.offsets = idx["offsets"]
        self.lengths = idx["lengths"]
        self.labels = idx["labels"]
        s = self.meta["image_size"]
        c = self.meta["channels"]
        self.frames = np.memmap(
            os.path.join(pack_dir, _FRAMES_FILE), dtype=np.uint8, mode="r",
            shape=(self.meta["total_frames"], s, s, c),
        )

    def __len__(self):
        return len(self.offsets)

    def clip(self, video_idx: int, start: int, n_frame: int) -> np.ndarray:
        o = self.offsets[video_idx]
        return np.asarray(self.frames[o + start: o + start + n_frame])

    def frame(self, video_idx: int, t: int) -> np.ndarray:
        return np.asarray(self.frames[self.offsets[video_idx] + t])


def _normalize(x: np.ndarray) -> np.ndarray:
    """(v - 128) / 128 -> float32 in [-1, 1] (reference dataset/ucf101new.py:95)."""
    return (x.astype(np.float32) - 128.0) / 128.0


class UCF101ClipSampler:
    """Infinite keyed sampler of random n_frame windows -> (B, T, H, W, C) in [-1, 1].

    ``host_id``/``host_count`` stride the video index for multi-host feeding
    (each TPU host samples only its stripe of the dataset).
    """

    def __init__(self, pack_dir: str, batch_size: int, *, n_frame: int = 16,
                 host_id: int = 0, host_count: int = 1):
        self.ds = PackedVideoDataset(pack_dir)
        self.batch_size = batch_size
        self.n_frame = n_frame
        eligible = np.nonzero(self.ds.lengths >= n_frame)[0]
        self.eligible = eligible[host_id::host_count]
        if len(self.eligible) == 0:
            raise ValueError("no videos long enough for the requested clip length")

    def sample(self, key) -> Tuple[np.ndarray, np.ndarray]:
        k_vid, k_start = jax.random.split(key)
        pick = np.asarray(jax.random.randint(k_vid, (self.batch_size,), 0,
                                             len(self.eligible)))
        vids = self.eligible[pick]
        max_start = self.ds.lengths[vids] - self.n_frame
        u = np.asarray(jax.random.uniform(k_start, (self.batch_size,)))
        starts = (u * (max_start + 1)).astype(np.int64)
        clips = np.stack([
            self.ds.clip(int(v), int(s), self.n_frame)
            for v, s in zip(vids, starts)
        ])
        return _normalize(clips), self.ds.labels[vids]

    def iterate(self, key) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        i = 0
        while True:
            yield self.sample(jax.random.fold_in(key, i))
            i += 1


class UCF101ImageSampler:
    """Infinite keyed sampler of single random frames -> (B, H, W, C) in [-1, 1]
    (reference dataset/ucf101new.py:169-180)."""

    def __init__(self, pack_dir: str, batch_size: int, *, host_id: int = 0,
                 host_count: int = 1):
        self.ds = PackedVideoDataset(pack_dir)
        self.batch_size = batch_size
        self.eligible = np.arange(len(self.ds))[host_id::host_count]

    def sample(self, key) -> Tuple[np.ndarray, np.ndarray]:
        k_vid, k_t = jax.random.split(key)
        pick = np.asarray(jax.random.randint(k_vid, (self.batch_size,), 0,
                                             len(self.eligible)))
        vids = self.eligible[pick]
        u = np.asarray(jax.random.uniform(k_t, (self.batch_size,)))
        ts = (u * self.ds.lengths[vids]).astype(np.int64)
        frames = np.stack([self.ds.frame(int(v), int(t))
                           for v, t in zip(vids, ts)])
        return _normalize(frames), self.ds.labels[vids]

    def iterate(self, key) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        i = 0
        while True:
            yield self.sample(jax.random.fold_in(key, i))
            i += 1
