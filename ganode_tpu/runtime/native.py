"""ctypes bindings + lazy build for the native clip-loading runtime.

``NativeClipLoader`` is a drop-in alternative to
``ganode_tpu.data.UCF101ClipSampler`` whose window gather + normalize + prefetch
run in C++ worker threads (see clip_loader.cc). Batch i is bit-reproducible from
(seed, i) regardless of thread count or scheduling.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "clip_loader.cc")
_LIB = os.path.join(_HERE, "libclip_loader.so")


def build_library(force: bool = False) -> str:
    """Compile the shared library if missing or stale."""
    if (not force and os.path.exists(_LIB)
            and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
        return _LIB
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-pthread", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def _load():
    lib = ctypes.CDLL(build_library())
    lib.gl_open.restype = ctypes.c_void_p
    lib.gl_open.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64, ctypes.c_int64,
    ]
    lib.gl_next.restype = ctypes.c_int
    lib.gl_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                            ctypes.POINTER(ctypes.c_int64)]
    lib.gl_close.restype = None
    lib.gl_close.argtypes = [ctypes.c_void_p]
    return lib


class NativeClipLoader:
    """Threaded native sampler over a packed shard directory.

    ``start_batch`` fast-forwards the stream: batch i is derived purely from
    (seed, i) in the C++ ring, so a loader opened at start_batch=n continues
    bit-identically to an uninterrupted run's batch n (resume support).
    """

    def __init__(self, pack_dir: str, batch_size: int, *, n_frame: int = 16,
                 n_threads: int = 4, seed: int = 0, start_batch: int = 0):
        from ..data.ucf101 import PackedVideoDataset

        self._lib = _load()
        ds = PackedVideoDataset(pack_dir)
        self.batch_size = batch_size
        self.n_frame = n_frame
        size = ds.meta["image_size"]
        ch = ds.meta["channels"]
        self.clip_shape = (batch_size, n_frame, size, size, ch)

        self._offsets = np.ascontiguousarray(ds.offsets, np.int64)
        self._lengths = np.ascontiguousarray(ds.lengths, np.int64)
        self._labels = np.ascontiguousarray(ds.labels, np.int64)
        frames_path = os.path.join(pack_dir, "frames.u8").encode()

        as_p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        self._h = self._lib.gl_open(
            frames_path, as_p(self._offsets), as_p(self._lengths),
            as_p(self._labels), len(ds),
            n_frame, batch_size, size, size, ch, n_threads, seed, start_batch)
        if not self._h:
            raise ValueError(
                f"native loader failed to open {pack_dir} (missing files or no "
                f"video has >= {n_frame} frames)")

        self._clips = np.empty(self.clip_shape, np.float32)
        self._lbl = np.empty((batch_size,), np.int64)

    def next(self) -> Tuple[np.ndarray, np.ndarray]:
        rc = self._lib.gl_next(
            self._h,
            self._clips.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._lbl.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        if rc != 0:
            raise RuntimeError("native loader stopped")
        return self._clips.copy(), self._lbl.copy()

    def iterate(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        while True:
            yield self.next()

    def close(self):
        if getattr(self, "_h", None):
            self._lib.gl_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeClipSampler:
    """``.sample(key)``-compatible facade over :class:`NativeClipLoader` — the
    adapter that lets train/runner.py swap the Python ``UCF101ClipSampler``
    (whose per-batch window gather is a Python loop, data/ucf101.py:220-223)
    for the C++ thread ring without touching the training loop.

    Reproducibility contract: the keyed samplers derive batch content from the
    key; here batch i is bit-reproducible from ``(seed, start_batch + i)``
    inside the C++ ring (clip_loader.cc fill_batch), independent of thread
    count. The ``key`` argument is accepted for protocol compatibility and
    ignored — the runner's deterministic call order plus the counter-based
    C++ RNG gives the same end-to-end guarantee. On resume, pass
    ``start_batch`` = number of batches already consumed to continue the
    exact stream (run_training computes this from the restored step).
    """

    def __init__(self, pack_dir: str, batch_size: int, *, n_frame: int = 16,
                 n_threads: int = 4, seed: int = 0, start_batch: int = 0):
        self._loader = NativeClipLoader(
            pack_dir, batch_size, n_frame=n_frame, n_threads=n_threads,
            seed=seed, start_batch=start_batch)

    def sample(self, key=None) -> Tuple[np.ndarray, np.ndarray]:
        return self._loader.next()

    def close(self):
        self._loader.close()


class NativeImageSampler:
    """Random single frames through the native ring: an n_frame=1 window over
    a video of length L starts uniformly in [0, L-1] — exactly the Python
    ``UCF101ImageSampler``'s uniform-video/uniform-frame semantics (reference
    dataset/ucf101new.py:169-180). Serves (B, H, W, C)."""

    def __init__(self, pack_dir: str, batch_size: int, *, n_threads: int = 2,
                 seed: int = 0, start_batch: int = 0):
        self._loader = NativeClipLoader(
            pack_dir, batch_size, n_frame=1, n_threads=n_threads, seed=seed,
            start_batch=start_batch)

    def sample(self, key=None) -> Tuple[np.ndarray, np.ndarray]:
        clips, labels = self._loader.next()
        return clips[:, 0], labels

    def close(self):
        self._loader.close()
