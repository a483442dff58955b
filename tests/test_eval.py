"""Eval metric tests: IS closed forms, Frechet identities, embedder round trip."""
import jax
import jax.numpy as jnp
import numpy as np

from ganode_tpu.eval import (
    VideoEmbedder,
    embed_videos,
    feature_stats,
    frechet_distance,
    fvd,
    inception_score,
    score_generator,
    train_classifier,
)


class TestInceptionScore:
    def test_uniform_probs_give_score_one(self):
        probs = np.full((100, 10), 0.1)
        mean, std = inception_score(probs)
        np.testing.assert_allclose(mean, 1.0, rtol=1e-6)

    def test_confident_diverse_gives_num_classes(self):
        # perfectly confident predictions evenly covering C classes -> IS = C
        C, N = 10, 5000
        probs = np.zeros((N, C))
        probs[np.arange(N), np.arange(N) % C] = 1.0
        # shuffle so every split sees all classes
        rng = np.random.RandomState(0)
        rng.shuffle(probs)
        mean, _ = inception_score(probs)
        np.testing.assert_allclose(mean, C, rtol=0.05)
        # single split with exact class balance is exactly C
        mean1, _ = inception_score(probs, splits=1)
        np.testing.assert_allclose(mean1, C, rtol=1e-6)

    def test_score_generator_pipeline(self):
        def sample_fn(key, n):
            return np.asarray(jax.random.normal(key, (n, 4)))

        def prob_fn(x):
            return np.full((len(x), 5), 0.2)

        mean, std = score_generator(sample_fn, prob_fn, n_samples=50,
                                    batch_size=10)
        np.testing.assert_allclose(mean, 1.0, rtol=1e-6)


class TestFrechet:
    def test_identical_distributions_zero(self):
        rng = np.random.RandomState(0)
        feats = rng.randn(500, 8)
        mu, sigma = feature_stats(feats)
        d = frechet_distance(mu, sigma, mu, sigma)
        assert abs(d) < 1e-3

    def test_mean_shift_closed_form(self):
        # same covariance, means offset by v: distance = ||v||^2
        rng = np.random.RandomState(1)
        feats = rng.randn(2000, 4)
        mu, sigma = feature_stats(feats)
        v = np.asarray([1.0, -2.0, 0.5, 0.0])
        d = frechet_distance(mu, sigma, mu + v, sigma)
        np.testing.assert_allclose(d, np.sum(v ** 2), rtol=1e-4, atol=1e-4)

    def test_scalar_gaussian_closed_form(self):
        # 1-D: d = (m1-m2)^2 + (s1-s2)^2
        d = frechet_distance(jnp.asarray([0.0]), jnp.asarray([[4.0]]),
                             jnp.asarray([3.0]), jnp.asarray([[1.0]]))
        np.testing.assert_allclose(d, 9.0 + (2.0 - 1.0) ** 2, rtol=1e-5)

    def test_fvd_discriminates(self):
        rng = np.random.RandomState(2)
        real = rng.randn(400, 16)
        close = real + 0.05 * rng.randn(400, 16)
        far = 3.0 + 2.0 * rng.randn(400, 16)
        assert fvd(real, close) < fvd(real, far)


class TestEmbedders:
    def test_classifier_learns_trivial_task(self):
        # blobs in different corners -> two classes; 200 steps must separate them
        rng = np.random.RandomState(0)
        n = 256
        imgs = np.zeros((n, 16, 16, 1), np.float32)
        labels = rng.randint(0, 2, n)
        for i in range(n):
            if labels[i] == 0:
                imgs[i, 2:6, 2:6] = 1.0
            else:
                imgs[i, 10:14, 10:14] = 1.0
        model, params, acc = train_classifier(imgs, labels, n_classes=2,
                                              steps=200)
        assert acc > 0.95

    def test_video_embedder_shapes(self):
        model = VideoEmbedder(feature_dim=32)
        videos = np.random.RandomState(0).rand(6, 8, 16, 16, 1).astype(np.float32)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(videos[:1]))["params"]
        feats = embed_videos(model, params, videos, batch_size=4)
        assert feats.shape == (6, 32)
        assert np.isfinite(feats).all()


class TestTrainedEmbedder:
    def test_video_embedder_trains_and_discriminates(self):
        """Supervised features must separate two obviously different classes
        better than chance (the property FVD relies on)."""
        from ganode_tpu.eval import train_video_embedder

        rng = np.random.RandomState(0)
        n = 32
        vids = np.zeros((n, 4, 8, 8, 1), np.float32)
        labels = np.arange(n) % 2
        vids[labels == 0] += rng.uniform(0.5, 1.0, (n // 2, 4, 8, 8, 1))
        vids[labels == 1] -= rng.uniform(0.5, 1.0, (n // 2, 4, 8, 8, 1))
        embedder, params, acc = train_video_embedder(
            vids, labels, n_classes=2, feature_dim=16, steps=60, batch_size=8)
        assert acc > 0.9

    def test_params_save_load_roundtrip(self, tmp_path):
        from ganode_tpu.eval import (
            load_params, save_params, train_video_embedder)

        vids = np.random.RandomState(0).rand(8, 4, 8, 8, 1).astype(np.float32)
        labels = np.arange(8) % 2
        embedder, params, _ = train_video_embedder(
            vids, labels, n_classes=2, feature_dim=8, steps=2, batch_size=4)
        path = str(tmp_path / "emb.msgpack")
        save_params(path, params)
        loaded = load_params(path, jax.tree.map(np.zeros_like, params))
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_persisted_embedder_gives_stable_features(self, tmp_path):
        """Re-loading the persisted params must reproduce identical features —
        the property that makes FVD comparable across eval runs."""
        from ganode_tpu.eval import (
            embed_videos, load_params, save_params, train_video_embedder)

        vids = np.random.RandomState(1).rand(8, 4, 8, 8, 1).astype(np.float32)
        labels = np.arange(8) % 2
        embedder, params, _ = train_video_embedder(
            vids, labels, n_classes=2, feature_dim=8, steps=5, batch_size=4)
        path = str(tmp_path / "emb.msgpack")
        save_params(path, params)
        f1 = embed_videos(embedder, params, vids, batch_size=4)
        loaded = load_params(path, jax.tree.map(np.zeros_like, params))
        f2 = embed_videos(embedder, loaded, vids, batch_size=4)
        np.testing.assert_array_equal(f1, f2)
