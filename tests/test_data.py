"""Data-layer tests: rotated-MNIST builder semantics, packed UCF101 round trip,
keyed samplers, clip-consistent transforms."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganode_tpu.data import (
    PackedVideoDataset,
    RotMNISTImages,
    RotMNISTVideos,
    UCF101ClipSampler,
    UCF101ImageSampler,
    build_rotmnist,
    default_resize_geometry,
    load_rotmnist,
    pack_arrays,
    prefetch,
    resample_frame_indices,
    rotate_videos,
    transforms,
)


def _fake_digits(n=8, seed=0):
    rng = np.random.RandomState(seed)
    imgs = np.full((n, 28, 28), -0.5, np.float32)
    for i in range(n):
        y, x = rng.randint(6, 18, 2)
        imgs[i, y:y + 6, x:x + 6] = 0.5  # a bright square to rotate
    labels = rng.randint(0, 10, n)
    return imgs, labels


class TestRotMNIST:
    def test_builder_shapes_and_range(self):
        imgs, labels = _fake_digits()
        X, Y = rotate_videos(imgs, labels, num_frames=16)
        assert X.shape == (8, 16, 784)
        assert Y.shape == (8,)
        assert X.min() >= 0.0 and X.max() <= 1.0 + 1e-6

    def test_normal_mode_rotates(self):
        imgs, labels = _fake_digits(2)
        X, _ = rotate_videos(imgs, labels, num_frames=16, mode="normal")
        # frame 0 (angle 0) differs from frame 4 (angle ~90) for an off-center blob
        assert not np.allclose(X[0, 0], X[0, 4])

    @pytest.mark.parametrize("mode", ["rand-end", "rsre"])
    def test_random_modes_seeded(self, mode):
        imgs, labels = _fake_digits(3)
        X1, _ = rotate_videos(imgs, labels, mode=mode, seed=5)
        X2, _ = rotate_videos(imgs, labels, mode=mode, seed=5)
        X3, _ = rotate_videos(imgs, labels, mode=mode, seed=6)
        np.testing.assert_array_equal(X1, X2)
        assert not np.allclose(X1, X3)

    def test_bad_mode(self):
        imgs, labels = _fake_digits(1)
        with pytest.raises(ValueError):
            rotate_videos(imgs, labels, mode="spiral")

    def test_build_load_roundtrip(self, tmp_path):
        imgs, labels = _fake_digits(12)
        path = str(tmp_path / "rot.npz")
        build_rotmnist(path, imgs, labels, num_frames=16)
        train, y_train = load_rotmnist(path, train=True, split=10)
        test, y_test = load_rotmnist(path, train=False, split=10)
        assert train.shape == (10, 16, 28, 28, 1)
        assert test.shape == (2, 16, 28, 28, 1)

    def test_digit_filter(self, tmp_path):
        imgs, labels = _fake_digits(20)
        labels = np.arange(20) % 10
        path = str(tmp_path / "rot3.npz")
        build_rotmnist(path, imgs, labels, digits=(3,))
        X, Y = load_rotmnist(path, train=True, split=1)
        assert np.all(Y == 3)

    def test_sklearn_digits_source(self):
        from ganode_tpu.data import load_sklearn_digits

        imgs, labels = load_sklearn_digits(24, seed=1)
        assert imgs.shape == (24, 28, 28) and labels.shape == (24,)
        assert imgs.min() >= -0.5 - 1e-6 and imgs.max() <= 0.5 + 1e-6
        assert imgs.dtype == np.float32 and set(labels) <= set(range(10))
        imgs2, labels2 = load_sklearn_digits(24, seed=1)
        np.testing.assert_array_equal(imgs, imgs2)
        np.testing.assert_array_equal(labels, labels2)
        # feeds the builder unchanged
        X, Y = rotate_videos(imgs[:2], labels[:2], num_frames=16)
        assert X.shape == (2, 16, 784)

    def test_samplers(self, tmp_path):
        imgs, labels = _fake_digits(12)
        path = str(tmp_path / "rot.npz")
        build_rotmnist(path, imgs, labels)
        videos, y = load_rotmnist(path, train=True, split=12)

        vs = RotMNISTVideos(videos, y, batch_size=4)
        batch, lbl = vs.sample(jax.random.PRNGKey(0))
        assert batch.shape == (4, 16, 28, 28, 1)
        b2, _ = vs.sample(jax.random.PRNGKey(0))
        np.testing.assert_array_equal(batch, b2)  # key-deterministic

        ims = RotMNISTImages(videos, y, batch_size=4)
        frames, lbl = ims.sample(jax.random.PRNGKey(1))
        assert frames.shape == (4, 28, 28, 1)

    def test_value_range_rescale(self, tmp_path):
        imgs, labels = _fake_digits(4)
        path = str(tmp_path / "rot.npz")
        build_rotmnist(path, imgs, labels)
        videos, y = load_rotmnist(path, train=True, split=4)
        vs = RotMNISTVideos(videos, y, batch_size=2, value_range=(-1.0, 1.0))
        batch, _ = vs.sample(jax.random.PRNGKey(0))
        assert batch.min() < -0.5  # rescaled out of [0, 1]


def _fake_pack(tmp_path, lengths=(30, 20, 16, 40), size=64):
    rng = np.random.RandomState(0)
    videos = [rng.randint(0, 255, (t, size, size, 3), dtype=np.uint8)
              for t in lengths]
    labels = list(range(len(lengths)))
    pack_dir = str(tmp_path / "pack")
    pack_arrays(pack_dir, videos, labels, image_size=size)
    return pack_dir, videos


class TestUCF101Pack:
    def test_roundtrip(self, tmp_path):
        pack_dir, videos = _fake_pack(tmp_path)
        ds = PackedVideoDataset(pack_dir)
        assert len(ds) == 4
        np.testing.assert_array_equal(ds.clip(1, 3, 5), videos[1][3:8])
        np.testing.assert_array_equal(ds.frame(2, 10), videos[2][10])

    def test_clip_sampler(self, tmp_path):
        pack_dir, _ = _fake_pack(tmp_path)
        s = UCF101ClipSampler(pack_dir, batch_size=6, n_frame=16)
        clips, labels = s.sample(jax.random.PRNGKey(0))
        assert clips.shape == (6, 16, 64, 64, 3)
        assert clips.dtype == np.float32
        assert clips.min() >= -1.0 and clips.max() <= 1.0
        c2, _ = s.sample(jax.random.PRNGKey(0))
        np.testing.assert_array_equal(clips, c2)

    def test_short_videos_excluded(self, tmp_path):
        pack_dir, _ = _fake_pack(tmp_path, lengths=(10, 30))
        s = UCF101ClipSampler(pack_dir, batch_size=4, n_frame=16)
        # only video 1 is eligible; all sampled labels must be 1
        _, labels = s.sample(jax.random.PRNGKey(0))
        assert np.all(labels == 1)

    def test_all_too_short_raises(self, tmp_path):
        pack_dir, _ = _fake_pack(tmp_path, lengths=(4, 8))
        with pytest.raises(ValueError):
            UCF101ClipSampler(pack_dir, batch_size=2, n_frame=16)

    def test_image_sampler(self, tmp_path):
        pack_dir, _ = _fake_pack(tmp_path)
        s = UCF101ImageSampler(pack_dir, batch_size=5)
        frames, labels = s.sample(jax.random.PRNGKey(2))
        assert frames.shape == (5, 64, 64, 3)

    def test_host_sharding_disjoint(self, tmp_path):
        pack_dir, _ = _fake_pack(tmp_path, lengths=(20, 20, 20, 20, 20, 20))
        s0 = UCF101ClipSampler(pack_dir, batch_size=4, host_id=0, host_count=2)
        s1 = UCF101ClipSampler(pack_dir, batch_size=4, host_id=1, host_count=2)
        assert set(s0.eligible).isdisjoint(set(s1.eligible))
        assert set(s0.eligible) | set(s1.eligible) == set(range(6))

    def test_prefetch(self, tmp_path):
        pack_dir, _ = _fake_pack(tmp_path)
        s = UCF101ClipSampler(pack_dir, batch_size=2, n_frame=16)
        it = prefetch(s.iterate(jax.random.PRNGKey(0)), size=2)
        batches = [next(it) for _ in range(3)]
        assert batches[0][0].shape == (2, 16, 64, 64, 3)


class TestClipIndex:
    """VideoClips-equivalent enumerable clip windows (reference
    dataset/video/video_utils.py:213-229 unfold, 350-388 compute_clips,
    398-424 get_clip_location)."""

    def test_unfold_matches_torch_semantics(self):
        from ganode_tpu.data import unfold
        idx = np.arange(10)
        w = unfold(idx, size=4, step=2)
        # torch.arange(10).unfold(0, 4, 2) -> starts 0, 2, 4, 6
        np.testing.assert_array_equal(
            w, [[0, 1, 2, 3], [2, 3, 4, 5], [4, 5, 6, 7], [6, 7, 8, 9]])
        assert unfold(np.arange(3), size=4, step=1).shape == (0, 4)

    def test_compute_clips_with_frame_rate(self):
        from ganode_tpu.data import compute_clips_for_video
        # 30 fps -> 15 fps halves the frame list before unfolding
        w = compute_clips_for_video(20, num_frames=4, step=4,
                                    original_fps=30.0, frame_rate=15.0)
        np.testing.assert_array_equal(w, [[0, 2, 4, 6], [8, 10, 12, 14]])

    def test_num_clips_and_location(self, tmp_path):
        from ganode_tpu.data import ClipIndex
        pack_dir, _ = _fake_pack(tmp_path, lengths=(30, 20, 16, 40))
        ds = PackedVideoDataset(pack_dir)
        ci = ClipIndex(ds, num_frames=16, step=1)
        # per video: T - 16 + 1 full windows
        assert ci.num_clips() == 15 + 5 + 1 + 25
        assert ci.get_clip_location(0) == (0, 0)
        assert ci.get_clip_location(15) == (1, 0)
        assert ci.get_clip_location(20) == (2, 0)
        assert ci.get_clip_location(21) == (3, 0)
        with pytest.raises(IndexError):
            ci.get_clip_location(ci.num_clips())

    def test_get_clip_frames_match_source(self, tmp_path):
        from ganode_tpu.data import ClipIndex
        pack_dir, videos = _fake_pack(tmp_path, lengths=(30, 20))
        ci = ClipIndex(PackedVideoDataset(pack_dir), num_frames=8, step=4)
        frames, info, vidx = ci.get_clip(1)  # video 0, second window (start 4)
        assert vidx == 0
        np.testing.assert_array_equal(frames, videos[0][4:12])

    def test_fps_aware_clip_serving(self, tmp_path):
        from ganode_tpu.data import ClipIndex
        rng = np.random.RandomState(1)
        videos = [rng.randint(0, 255, (32, 32, 32, 3), dtype=np.uint8)]
        pack_dir = str(tmp_path / "fps-pack")
        pack_arrays(pack_dir, videos, [0], image_size=32,
                    source_fps=[30.0])
        ci = ClipIndex(PackedVideoDataset(pack_dir), num_frames=8, step=8,
                       frame_rate=15.0)
        # resampled to 16 frames -> two disjoint stride-2 windows
        assert ci.num_clips() == 2
        frames, info, _ = ci.get_clip(0)
        np.testing.assert_array_equal(frames, videos[0][0:16:2])
        assert info["video_fps"] == 15.0

    def test_sequential_and_random_serving(self, tmp_path):
        from ganode_tpu.data import UCF101RandomClipSampler, UCF101SequentialClips
        pack_dir, _ = _fake_pack(tmp_path, lengths=(30, 20, 16, 40), size=32)
        seq = UCF101SequentialClips(pack_dir, batch_size=10, num_frames=16)
        batches = list(seq)
        assert sum(b.shape[0] for b, _ in batches) == len(seq) == 46
        assert batches[0][0].shape == (10, 16, 32, 32, 3)
        assert batches[0][0].dtype == np.float32
        assert batches[0][0].min() >= -1.0 and batches[0][0].max() <= 1.0

        rnd = UCF101RandomClipSampler(pack_dir, batch_size=4, num_frames=16)
        clips, labels = rnd.sample(jax.random.PRNGKey(0))
        assert clips.shape == (4, 16, 32, 32, 3)
        clips2, _ = rnd.sample(jax.random.PRNGKey(0))
        np.testing.assert_array_equal(clips, clips2)  # keyed determinism


class TestTransforms:
    def test_flip_consistent_across_frames(self):
        clip = jnp.asarray(np.random.RandomState(0).rand(8, 16, 16, 3))
        # find a key that flips
        for seed in range(10):
            out = transforms.random_horizontal_flip(jax.random.PRNGKey(seed), clip, p=1.0)
            np.testing.assert_allclose(out, clip[:, :, ::-1, :])
            break

    def test_random_crop_same_window_all_frames(self):
        clip = jnp.asarray(np.random.RandomState(0).rand(4, 20, 20, 1))
        out = transforms.random_crop(jax.random.PRNGKey(3), clip, 8)
        assert out.shape == (4, 8, 8, 1)
        # the window must be identical across frames: check against manual search
        full = np.asarray(clip)
        got = np.asarray(out)
        found = False
        for y in range(13):
            for x in range(13):
                if np.allclose(full[:, y:y + 8, x:x + 8, :], got):
                    found = True
        assert found

    def test_temporal_random_crop_pads_short(self):
        clip = jnp.asarray(np.arange(3 * 2 * 2).reshape(3, 2, 2, 1).astype(float))
        out = transforms.temporal_random_crop(jax.random.PRNGKey(0), clip, 8)
        assert out.shape[0] == 8
        np.testing.assert_array_equal(out[3], out[0])  # loop padding

    def test_per_clip_batched_independent(self):
        batch = jnp.asarray(np.random.RandomState(0).rand(16, 4, 8, 8, 1))
        out = transforms.per_clip(
            lambda k, c: transforms.random_horizontal_flip(k, c, 0.5),
            jax.random.PRNGKey(0), batch)
        flipped = [not np.allclose(out[i], batch[i]) for i in range(16)]
        assert any(flipped) and not all(flipped)  # some flip, some don't

    def test_corner_and_center_crop(self):
        clip = jnp.asarray(np.random.RandomState(0).rand(2, 10, 10, 1))
        for pos in ("c", "tl", "tr", "bl", "br"):
            out = transforms.corner_crop(clip, 6, pos)
            assert out.shape == (2, 6, 6, 1)
        assert transforms.center_crop(clip, 6).shape == (2, 6, 6, 1)

    def test_multi_scale_random_crop(self):
        clip = jnp.asarray(np.random.RandomState(0).rand(4, 32, 32, 3))
        out = transforms.multi_scale_random_crop(jax.random.PRNGKey(1), clip, 16)
        assert out.shape == (4, 16, 16, 3)

    def test_normalize(self):
        clip = jnp.ones((2, 4, 4, 3))
        out = transforms.normalize(clip, mean=(1.0, 1.0, 1.0), std=(2.0, 2.0, 2.0))
        np.testing.assert_allclose(out, 0.0)


class TestSyntheticCorpus:
    """Labeled synthetic UCF101 stand-in: real .avi corpus -> real pack."""

    def test_write_corpus_layout_and_pack(self, tmp_path):
        pytest.importorskip("cv2")
        from ganode_tpu.data import (moving_square_video, pack_ucf101,
                                     parse_class_index, parse_split,
                                     write_corpus)

        root = str(tmp_path / "corpus")
        train_paths, train_labels = write_corpus(
            root, 16, min_frames=18, max_frames=24, seed=1, test_every=4)
        classes, class_to_idx = parse_class_index(root + "/annotations")
        assert len(classes) == 64
        # 0-based indices carry the factor label directly (label%8 = color)
        assert class_to_idx[classes[0]] == 0
        assert parse_split(root + "/annotations", train=True, fold=1) \
            == train_paths
        held_out = parse_split(root + "/annotations", train=False, fold=1)
        assert len(held_out) + len(train_paths) == 16

        out = pack_ucf101(root, str(tmp_path / "packed"), progress=False)
        ds = PackedVideoDataset(out)
        assert len(ds) == len(train_paths)
        assert list(ds.labels) == train_labels
        assert 18 <= ds.lengths.min() and ds.lengths.max() <= 24

        # the color-octant factor survives MJPG encode -> decode -> bicubic
        # resize -> crop (the band around the 0.6 threshold is rejection-
        # sampled away at generation time)
        for i in range(len(ds)):
            frame = (ds.frame(i, 0).astype(np.float32) - 128.0) / 128.0
            mask = frame.max(axis=-1) > -0.5
            assert mask.any()
            med = np.median(frame[mask], axis=0)
            assert int((med > 0.6) @ np.array([4, 2, 1])) == ds.labels[i] % 8

        s = UCF101ClipSampler(out, batch_size=4, n_frame=16)
        clips, labels = s.sample(jax.random.PRNGKey(0))
        assert clips.shape == (4, 16, 64, 64, 3)
        assert -1.0 <= clips.min() and clips.max() <= 1.0

    def test_direction_octant_matches_motion(self):
        from ganode_tpu.data import moving_square_video
        from ganode_tpu.data.synthetic import _X_SAFE, _Y_SAFE

        rng = np.random.RandomState(3)
        checked = 0
        for _ in range(16):
            video, label = moving_square_video(rng, 12)
            # exact square position from the mask bbox; only clamp-free
            # steps (bbox strictly inside the safe box) measure the true
            # per-frame (dx, dy)
            pos = []
            for t in range(2):
                m = video[t].max(axis=-1) > 0
                yy, xx = np.nonzero(m)
                pos.append((xx.min(), xx.max(), yy.min(), yy.max()))
            clamped = any(
                x0 <= _X_SAFE[0] or x1 >= _X_SAFE[1] - 1
                or y0 <= _Y_SAFE[0] or y1 >= _Y_SAFE[1] - 1
                for x0, x1, y0, y1 in pos)
            if clamped:
                continue
            dx = pos[1][0] - pos[0][0]
            dy = pos[1][2] - pos[0][2]
            octant = int(np.round(np.arctan2(dy, dx) / (np.pi / 4))) % 8
            assert octant == label // 8
            checked += 1
        assert checked >= 4  # enough clamp-free draws actually verified


class TestVideoDecodePack:
    """End-to-end pack from real encoded video files (synthetic AVIs)."""

    @pytest.fixture()
    def ucf_tree(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        root = tmp_path / "ucf"
        (root / "videos" / "Clap").mkdir(parents=True)
        (root / "videos" / "Jump").mkdir(parents=True)
        (root / "annotations").mkdir()
        rng = np.random.RandomState(0)

        def write(rel, frames):
            path = str(root / "videos" / rel)
            w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 25,
                                (320, 240))
            for _ in range(frames):
                w.write(rng.randint(0, 255, (240, 320, 3), dtype=np.uint8))
            w.release()

        write("Clap/v1.avi", 30)
        write("Clap/v2.avi", 8)    # too short, must be skipped
        write("Jump/v3.avi", 25)
        (root / "annotations" / "classInd.txt").write_text(
            "1 Clap\n2 Jump\n")
        (root / "annotations" / "trainlist01.txt").write_text(
            "Clap/v1.avi 1\nClap/v2.avi 1\nJump/v3.avi 2\n")
        return str(root)

    def test_pack_and_sample(self, ucf_tree, tmp_path):
        from ganode_tpu.data import pack_ucf101

        out = pack_ucf101(ucf_tree, str(tmp_path / "packed"), train=True,
                          fold=1, progress=False)
        ds = PackedVideoDataset(out)
        assert len(ds) == 2              # the 8-frame video was skipped
        assert set(ds.labels) == {1, 2}
        assert ds.frames.shape[1:] == (64, 64, 3)

        s = UCF101ClipSampler(out, batch_size=3, n_frame=16)
        clips, labels = s.sample(jax.random.PRNGKey(0))
        assert clips.shape == (3, 16, 64, 64, 3)
        assert np.isfinite(clips).all()

    def test_pack_and_sample_at_128(self, ucf_tree, tmp_path):
        """128px pack -> sample roundtrip (the north-star config's geometry)."""
        from ganode_tpu.data import pack_ucf101

        out = pack_ucf101(ucf_tree, str(tmp_path / "packed128"), train=True,
                          fold=1, image_size=128, progress=False)
        ds = PackedVideoDataset(out)
        assert len(ds) == 2
        assert ds.frames.shape[1:] == (128, 128, 3)
        s = UCF101ClipSampler(out, batch_size=2, n_frame=16)
        clips, _ = s.sample(jax.random.PRNGKey(0))
        assert clips.shape == (2, 16, 128, 128, 3)
        assert np.isfinite(clips).all()
        assert clips.min() >= -1.0 and clips.max() <= 1.0

    def test_pack_with_fps_resampling(self, tmp_path):
        """Variable-fps sources resampled to one target rate at pack time."""
        import cv2
        from ganode_tpu.data import pack_ucf101

        root = tmp_path / "ucffps"
        (root / "videos" / "Clap").mkdir(parents=True)
        (root / "annotations").mkdir()
        rng = np.random.RandomState(0)

        def write(rel, frames, fps):
            w = cv2.VideoWriter(str(root / "videos" / rel),
                                cv2.VideoWriter_fourcc(*"MJPG"), fps,
                                (320, 240))
            for _ in range(frames):
                w.write(rng.randint(0, 255, (240, 320, 3), dtype=np.uint8))
            w.release()

        write("Clap/v1.avi", 40, 25)   # already at target rate -> untouched
        write("Clap/v2.avi", 40, 50)   # 2x target rate -> every other frame
        (root / "annotations" / "classInd.txt").write_text("1 Clap\n")
        (root / "annotations" / "trainlist01.txt").write_text(
            "Clap/v1.avi 1\nClap/v2.avi 1\n")

        out = pack_ucf101(str(root), str(tmp_path / "packedfps"), train=True,
                          fold=1, n_frame=16, target_fps=25.0, progress=False)
        ds = PackedVideoDataset(out)
        assert list(ds.lengths) == [40, 20]
        assert ds.meta["target_fps"] == 25.0
        assert ds.meta["source_fps"] == [25.0, 50.0]


class TestVideoInfo:
    """pts + (video, audio, info) surface of the reference's vendored reader
    (reference dataset/video/video_utils.py:117-210). Uncompressed (PCM)
    audio decodes via the stdlib RIFF demuxer (TestAviAudio below); compressed
    audio codecs stay a documented empty — see PARITY.md #18."""

    @pytest.fixture()
    def avi(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        path = str(tmp_path / "v.avi")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 25,
                            (64, 48))
        rng = np.random.RandomState(0)
        for _ in range(20):
            w.write(rng.randint(0, 255, (48, 64, 3), dtype=np.uint8))
        w.release()
        return path

    def test_timestamps(self, avi):
        from ganode_tpu.data import read_video_timestamps

        pts, fps = read_video_timestamps(avi)
        assert fps == 25.0
        assert pts.shape == (20,)
        assert pts[0] == 0.0
        # CFR at 25 fps: pts advance by 40 ms, monotonically
        assert np.all(np.diff(pts) > 0)
        np.testing.assert_allclose(np.diff(pts), 0.04, atol=1e-3)

    def test_read_video_with_info(self, avi):
        from ganode_tpu.data import read_video_with_info

        video, audio, info = read_video_with_info(avi, start=2, end=11)
        assert video.shape == (10, 48, 64, 3) and video.dtype == np.uint8
        assert audio.shape == (0, 0)            # no audio stream in this AVI
        assert info["audio_fps"] is None
        assert info["video_fps"] == 25.0
        assert info["pts"].shape == (10,)
        np.testing.assert_allclose(info["pts"][0], 2 * 0.04, atol=1e-3)

    def test_read_video_with_info_pts_fallback(self, avi, monkeypatch):
        """Misaligned (demux != decode count) or degenerate (POS_MSEC
        unsupported → all-zero) timestamp scans degrade to index/fps pts so
        the one-pts-per-returned-frame contract always holds."""
        from ganode_tpu.data import read_video_with_info
        from ganode_tpu.data import video as video_mod

        monkeypatch.setattr(  # corrupt tail: demux saw fewer frames
            video_mod, "read_video_timestamps",
            lambda path: (np.zeros(3, np.float64), 25.0))
        video, _, info = read_video_with_info(avi, start=2, end=11)
        assert info["pts"].shape == (video.shape[0],)
        np.testing.assert_allclose(info["pts"],
                                   (2 + np.arange(10)) * 0.04, atol=1e-6)


def _riff_chunk(cc, payload):
    import struct

    out = cc + struct.pack("<I", len(payload)) + payload
    return out + (b"\0" if len(payload) & 1 else b"")


def _riff_list(ltype, payload):
    return _riff_chunk(b"LIST", ltype + payload)


def _mux_audio_into_avi(src, dst, pcm_bytes, rate, channels, bits,
                        format_tag=1):
    """RIFF surgery: append a second (audio) stream to a cv2-written AVI —
    an 'auds' strl in hdrl (dwStreams bumped to 2) plus one '01wb' data
    chunk in movi. Raw-DIB AVIs hand-built from scratch crash this image's
    OpenCV/FFmpeg, so the only way to test the integrated video+audio
    contract is to graft audio onto a container cv2 itself produced."""
    import struct

    block = channels * bits // 8
    n_samples = len(pcm_bytes) // max(block, 1)
    strh = struct.pack("<4s4sIHHIIIIIIiI4H", b"auds", b"\0\0\0\0",
                       0, 0, 0, 0, 1, rate, 0, n_samples, rate * block,
                       -1, block, 0, 0, 0, 0)
    strf = struct.pack("<HHIIHH", format_tag, channels, rate,
                       rate * block, block, bits)
    audio_strl = _riff_list(b"strl", _riff_chunk(b"strh", strh)
                            + _riff_chunk(b"strf", strf))

    buf = bytearray(open(src, "rb").read())

    def chunks(pos, end):
        import struct as st
        while pos + 8 <= end:
            cc = bytes(buf[pos:pos + 4])
            (size,) = st.unpack_from("<I", buf, pos + 4)
            yield cc, pos, size
            pos += 8 + size + (size & 1)

    out = bytearray(buf[:12])
    for cc, pos, size in chunks(12, len(buf)):
        payload = bytes(buf[pos + 8:pos + 8 + size])
        if cc == b"LIST" and payload[:4] == b"hdrl":
            inner = bytearray(payload[4:])
            # bump dwStreams (avih offset 24) to 2
            import struct as st
            ipos = 0
            while ipos + 8 <= len(inner):
                cc2 = bytes(inner[ipos:ipos + 4])
                (s2,) = st.unpack_from("<I", inner, ipos + 4)
                if cc2 == b"avih":
                    st.pack_into("<I", inner, ipos + 8 + 24, 2)
                ipos += 8 + s2 + (s2 & 1)
            out += _riff_list(b"hdrl", bytes(inner) + audio_strl)
        elif cc == b"LIST" and payload[:4] == b"movi":
            out += _riff_list(b"movi",
                              payload[4:] + _riff_chunk(b"01wb", pcm_bytes))
        else:
            out += _riff_chunk(cc, payload)
    import struct as st
    st.pack_into("<I", out, 4, len(out) - 8)
    open(dst, "wb").write(bytes(out))


class TestAviAudio:
    """Audio surface of the reference reader (reference
    dataset/video/video_utils.py:117-198: read_video returns (vframes,
    aframes[K, L], info['audio_fps'])), rebuilt as a pure-stdlib RIFF/AVI
    demuxer for UNCOMPRESSED tracks — the only codecs decodable without an
    audio backend (this image has no PyAV/ffmpeg CLI/torchaudio)."""

    RATE, CH, BITS, T, FPS = 8000, 2, 16, 20, 25

    @pytest.fixture()
    def avi_with_audio(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        base = str(tmp_path / "base.avi")
        w = cv2.VideoWriter(base, cv2.VideoWriter_fourcc(*"MJPG"), self.FPS,
                            (64, 48))
        rng = np.random.RandomState(0)
        for _ in range(self.T):
            w.write(rng.randint(0, 255, (48, 64, 3), dtype=np.uint8))
        w.release()
        t = np.arange(self.RATE) / self.RATE  # 1 s — longer than the video
        wave = np.stack([np.sin(2 * np.pi * 440 * t),
                         np.sin(2 * np.pi * 220 * t)], 1)
        pcm = (np.clip(wave, -1, 1) * 32767).astype(np.int16)
        path = str(tmp_path / "muxed.avi")
        _mux_audio_into_avi(base, path, pcm.tobytes(), self.RATE, self.CH,
                            self.BITS)
        return path, wave.astype(np.float32)

    def test_demux_pcm(self, avi_with_audio):
        from ganode_tpu.data import read_avi_pcm_audio

        path, wave = avi_with_audio
        samples, rate = read_avi_pcm_audio(path)
        assert rate == self.RATE
        assert samples.shape == (self.CH, self.RATE)  # (K, L), ref contract
        assert samples.dtype == np.float32
        # atol: int16 rounding (1/32767) + encode x32767 / decode /32768
        # scale skew (|wave|/32768 <= 1/32768)
        np.testing.assert_allclose(samples, wave.T, rtol=0, atol=7e-5)

    def test_read_video_with_info_returns_trimmed_audio(self, avi_with_audio):
        from ganode_tpu.data import read_video_with_info

        path, wave = avi_with_audio
        video, audio, info = read_video_with_info(path, start=2, end=6)
        assert video.shape == (5, 48, 64, 3)
        assert info["audio_fps"] == self.RATE
        # frames [2, 6] at 25 fps span [0.08 s, 0.28 s) -> 1600 samples,
        # aligned to the returned frames like the reference's
        # _align_audio_frames (video_utils.py:194)
        assert audio.shape == (self.CH, 1600)
        lo = int(round(0.08 * self.RATE))
        np.testing.assert_allclose(audio, wave.T[:, lo:lo + 1600],
                                   rtol=0, atol=7e-5)

    def test_compressed_codec_yields_documented_empty(self, tmp_path,
                                                      avi_with_audio):
        """An MP3 (or any compressed) track cannot be decoded by a demuxer;
        the surface degrades to the documented empty array + audio_fps None
        instead of returning garbage bytes."""
        cv2 = pytest.importorskip("cv2")
        from ganode_tpu.data import read_avi_pcm_audio, read_video_with_info

        base = str(tmp_path / "b2.avi")
        w = cv2.VideoWriter(base, cv2.VideoWriter_fourcc(*"MJPG"), self.FPS,
                            (64, 48))
        for _ in range(self.T):
            w.write(np.zeros((48, 64, 3), dtype=np.uint8))
        w.release()
        path = str(tmp_path / "mp3.avi")
        _mux_audio_into_avi(base, path, b"\xff\xfb" * 512, self.RATE,
                            self.CH, self.BITS, format_tag=0x55)  # MP3 tag
        assert read_avi_pcm_audio(path) is None
        _, audio, info = read_video_with_info(path, start=0, end=4)
        assert audio.shape == (0, 0) and info["audio_fps"] is None

    def test_non_avi_returns_none(self, tmp_path):
        from ganode_tpu.data import read_avi_pcm_audio

        p = tmp_path / "not.avi"
        p.write_bytes(b"definitely not a RIFF file" * 4)
        assert read_avi_pcm_audio(str(p)) is None


class TestDecodeRobustness:
    """Pin the reader's degrade-gracefully contract on damaged files.

    The reference swallows decoder errors and returns whatever frames decoded
    (dataset/video/video_utils.py:85-103 catches av.AVError mid-stream), and
    its dataset skips videos whose decodable length is too short
    (dataset/ucf101new.py:59-68). The rebuild's equivalents: read_video
    returns the decodable prefix (never raises on truncation), and
    pack_ucf101 drops sub-n_frame videos at pack time.
    """

    def _write_avi(self, path, frames, rng):
        cv2 = pytest.importorskip("cv2")
        w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"), 25,
                            (320, 240))
        for _ in range(frames):
            w.write(rng.randint(0, 255, (240, 320, 3), dtype=np.uint8))
        w.release()

    def test_truncated_file_returns_decodable_prefix(self, tmp_path):
        from ganode_tpu.data.video import read_video, read_video_with_info

        path = tmp_path / "full.avi"
        self._write_avi(path, 30, np.random.RandomState(0))
        full = read_video(str(path))
        assert full.shape[0] == 30

        cut = tmp_path / "cut.avi"
        cut.write_bytes(path.read_bytes()[:path.stat().st_size // 2])
        part = read_video(str(cut))
        # never raises; yields a strict, non-empty prefix of the stream (the
        # final returned frame may itself be a partial decode of the chunk
        # the truncation landed in, so compare the frames before it)
        assert 0 < part.shape[0] < 30
        np.testing.assert_array_equal(part[:-1], full[:part.shape[0] - 1])

        vframes, audio, info = read_video_with_info(str(cut))
        assert vframes.shape[0] == part.shape[0]
        assert audio.shape == (0, 0)

    def test_garbage_file_returns_empty_not_raise(self, tmp_path):
        from ganode_tpu.data.video import probe_length, read_video

        p = tmp_path / "garbage.avi"
        p.write_bytes(bytes(range(256)) * 64)
        assert read_video(str(p)).shape == (0, 0, 0, 3)
        assert probe_length(str(p)) == 0

    def test_pack_skips_corrupt_keeps_truncated_prefix(self, tmp_path):
        from ganode_tpu.data import pack_ucf101

        root = tmp_path / "ucf"
        (root / "videos" / "Clap").mkdir(parents=True)
        (root / "annotations").mkdir()
        rng = np.random.RandomState(1)
        self._write_avi(root / "videos" / "Clap" / "good.avi", 30, rng)
        self._write_avi(root / "videos" / "Clap" / "trunc.avi", 40, rng)
        blob = (root / "videos" / "Clap" / "trunc.avi").read_bytes()
        (root / "videos" / "Clap" / "trunc.avi").write_bytes(
            blob[:int(len(blob) * 0.75)])
        (root / "videos" / "Clap" / "corrupt.avi").write_bytes(b"\0" * 4096)
        (root / "annotations" / "classInd.txt").write_text("1 Clap\n")
        (root / "annotations" / "trainlist01.txt").write_text(
            "Clap/good.avi 1\nClap/trunc.avi 1\nClap/corrupt.avi 1\n")

        out = pack_ucf101(str(root), str(tmp_path / "packed"), progress=False)
        ds = PackedVideoDataset(out)
        # corrupt (0 decodable frames) dropped; truncated kept at its
        # decodable prefix length iff that prefix still holds >= n_frame
        assert 1 <= len(ds) <= 2
        assert ds.lengths.max() == 30 or ds.lengths.max() < 40


class TestFrameFolder:
    @pytest.fixture()
    def frame_tree(self, tmp_path):
        from PIL import Image
        rng = np.random.RandomState(0)
        root = tmp_path / "frames"
        for cls, vids in (("ApplyLipstick", 2), ("Archery", 1)):
            for v in range(vids):
                vdir = root / cls / f"v_{cls}_g{v:02d}"
                vdir.mkdir(parents=True)
                n = 20 + v
                for i in range(1, n + 1):
                    Image.fromarray(
                        rng.randint(0, 255, (32, 32, 3), np.uint8)
                    ).save(str(vdir / f"image_{i:05d}.jpg"))
                (vdir / "n_frames").write_text(str(n))
        return str(root)

    def test_clip_sampling(self, frame_tree):
        from ganode_tpu.data import FrameFolderVideos
        ds = FrameFolderVideos(frame_tree, batch_size=3, n_frame=16)
        clips, labels = ds.sample(jax.random.PRNGKey(0))
        assert clips.shape == (3, 16, 32, 32, 3)
        assert clips.min() >= -1.0 and clips.max() <= 1.0
        assert set(np.asarray(labels)) <= {0, 1}
        c2, _ = ds.sample(jax.random.PRNGKey(0))
        np.testing.assert_array_equal(clips, c2)

    def test_resize(self, frame_tree):
        from ganode_tpu.data import FrameFolderVideos
        ds = FrameFolderVideos(frame_tree, batch_size=2, n_frame=8,
                               image_size=16)
        clips, _ = ds.sample(jax.random.PRNGKey(1))
        assert clips.shape == (2, 8, 16, 16, 3)

    def test_image_folder(self, tmp_path):
        from PIL import Image
        from ganode_tpu.data import ImageFolderSampler
        rng = np.random.RandomState(0)
        root = tmp_path / "imgs"
        for cls in ("cat", "dog"):
            (root / cls).mkdir(parents=True)
            for i in range(4):
                Image.fromarray(
                    rng.randint(0, 255, (40, 40, 3), np.uint8)
                ).save(str(root / cls / f"{i}.png"))
        s = ImageFolderSampler(str(root), batch_size=5, image_size=32)
        imgs, labels = s.sample(jax.random.PRNGKey(0))
        assert imgs.shape == (5, 32, 32, 3)
        assert set(np.asarray(labels)) <= {0, 1}

    def test_mean_std_constants(self):
        from ganode_tpu.data import get_mean, get_std
        assert len(get_mean(1.0, "activitynet")) == 3
        assert len(get_mean(1.0, "kinetics")) == 3
        assert len(get_std(1.0)) == 3
        with pytest.raises(ValueError):
            get_mean(1.0, "imagenet")


def test_multi_scale_corner_crop():
    clip = jnp.asarray(np.random.RandomState(0).rand(3, 32, 32, 3))
    out = transforms.multi_scale_corner_crop(jax.random.PRNGKey(2), clip, 16)
    assert out.shape == (3, 16, 16, 3)
    # different keys should eventually pick different (scale, corner) pairs
    outs = [np.asarray(transforms.multi_scale_corner_crop(
        jax.random.PRNGKey(s), clip, 16)) for s in range(6)]
    assert any(not np.allclose(outs[0], o) for o in outs[1:])


class TestResizeGeometry:
    """The reference's 64 -> resize(64, 85) + x-crop[10:74] recipe
    (dataset/ucf101new.py:31,73-78), scaled to any output size."""

    def test_reference_recipe_at_64(self):
        assert default_resize_geometry(64) == ((64, 85), 10)

    def test_scaled_recipe_at_128(self):
        assert default_resize_geometry(128) == ((128, 170), 20)

    @pytest.mark.parametrize("size", [28, 64, 128, 256])
    def test_resize_crop_output_square(self, size):
        from ganode_tpu.data import resize_crop
        video = np.random.RandomState(0).randint(
            0, 255, (3, 240, 320, 3), np.uint8)
        out = resize_crop(video, size)
        assert out.shape == (3, size, size, 3)

    def test_bad_geometry_raises(self):
        from ganode_tpu.data import resize_crop
        video = np.zeros((2, 240, 320, 3), np.uint8)
        with pytest.raises(ValueError):
            resize_crop(video, 64, resize_hw=(64, 60))


class TestFpsResampling:
    """resample_frame_indices mirrors the reference VideoClips resampling
    (dataset/video/video_utils.py:350-388)."""

    def test_identity_without_target(self):
        np.testing.assert_array_equal(
            resample_frame_indices(10, 25.0, None), np.arange(10))

    def test_identity_with_unknown_source_fps(self):
        np.testing.assert_array_equal(
            resample_frame_indices(7, 0.0, 10.0), np.arange(7))

    def test_integer_stride(self):
        np.testing.assert_array_equal(
            resample_frame_indices(30, 30.0, 15.0), np.arange(0, 30, 2))

    def test_fractional_step(self):
        idx = resample_frame_indices(25, 25.0, 10.0)
        np.testing.assert_array_equal(
            idx, np.floor(np.arange(10) * 2.5).astype(np.int64))

    def test_upsampling_repeats_frames(self):
        idx = resample_frame_indices(10, 10.0, 20.0)
        assert len(idx) == 20
        assert idx.max() <= 9
