"""Shape/contract tests for the MoCoGAN zoo — the tests the reference only ran as
__main__ smoke prints (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganode_tpu.models import (
    CategoricalVideoDiscriminator,
    ImageDiscriminator,
    PatchImageDiscriminator,
    PatchVideoDiscriminator,
    VideoDiscriminator,
    make_generator,
)

B, T = 4, 16


def _init_and_sample(gen, n, method, **kwargs):
    k = jax.random.PRNGKey(0)
    variables = gen.init({"params": k, "sample": jax.random.fold_in(k, 1)}, n)
    out, mutated = gen.apply(
        variables, n, method=method,
        rngs={"sample": jax.random.fold_in(k, 2)},
        mutable=["batch_stats"], **kwargs,
    )
    return out, variables


@pytest.mark.parametrize("variant",
                         ["gru", "ode", "sde", "cde", "ode_rnn", "moe_ode"])
def test_generator_videos_mnist(variant):
    gen = make_generator(variant, n_channels=1, trunk="mnist28",
                         dim_z_content=50, dim_z_motion=16, video_length=T)
    (videos, labels), _ = _init_and_sample(gen, B, lambda g, n, **kw: g.sample_videos(n, **kw))
    assert videos.shape == (B, T, 28, 28, 1)
    assert labels is None
    v = np.asarray(videos)
    assert v.min() >= -1.0 and v.max() <= 1.0
    assert np.all(np.isfinite(v))


def test_sde_generator_reversible_adjoint_trains():
    """motion_method='reversible_heun_adjoint' drives the O(1)-memory
    reversible backward pass (ode.sde.sdeint_reversible_adjoint) through the
    full generator: finite nonzero gradients under jit."""
    gen = make_generator("sde", n_channels=1, trunk="mnist28",
                         dim_z_content=50, dim_z_motion=16, video_length=T,
                         method="reversible_heun_adjoint")
    k = jax.random.PRNGKey(0)
    variables = gen.init({"params": k, "sample": jax.random.fold_in(k, 1)}, B)

    @jax.jit
    def loss(params):
        (videos, _), _ = gen.apply(
            {**variables, "params": params}, B, method="sample_videos",
            rngs={"sample": jax.random.fold_in(k, 2)},
            mutable=["batch_stats"])
        return jnp.mean(videos ** 2)

    g = jax.grad(loss)(variables["params"])
    drift_g = jax.tree.leaves(g["motion"]["drift_fn"])
    diff_g = jax.tree.leaves(g["motion"]["diffusion_fn"])
    assert all(np.all(np.isfinite(x)) for x in jax.tree.leaves(g))
    assert any(float(jnp.abs(x).max()) > 0 for x in drift_g)
    assert any(float(jnp.abs(x).max()) > 0 for x in diff_g)


@pytest.mark.parametrize("variant", ["ode", "gru"])
def test_generator_videos_ucf(variant):
    gen = make_generator(variant, n_channels=3, trunk="dcgan64", video_length=T)
    (videos, labels), _ = _init_and_sample(gen, B, lambda g, n, **kw: g.sample_videos(n, **kw))
    assert videos.shape == (B, T, 64, 64, 3)


def test_generator_images():
    gen = make_generator("ode", n_channels=1, trunk="mnist28", video_length=T)
    (images, aux), _ = _init_and_sample(gen, B, lambda g, n, **kw: g.sample_images(n, **kw))
    assert images.shape == (B, 28, 28, 1)
    assert aux is None


def test_generator_categorical_labels():
    gen = make_generator("gru", n_channels=3, trunk="dcgan64",
                         dim_z_category=6, video_length=T)
    (videos, labels), _ = _init_and_sample(gen, B, lambda g, n, **kw: g.sample_videos(n, **kw))
    assert labels.shape == (B,)
    assert np.all(np.asarray(labels) >= 0) and np.all(np.asarray(labels) < 6)


def test_generator_video_len_override():
    gen = make_generator("ode", n_channels=1, trunk="mnist28", video_length=T)
    (videos, _), _ = _init_and_sample(
        gen, B, lambda g, n, **kw: g.sample_videos(n, video_len=8, **kw))
    assert videos.shape == (B, 8, 28, 28, 1)


def test_sampling_is_key_deterministic():
    gen = make_generator("ode", n_channels=1, trunk="mnist28", video_length=8)
    k = jax.random.PRNGKey(0)
    variables = gen.init({"params": k, "sample": k}, 2)
    run = lambda seed: gen.apply(
        variables, 2, method=lambda g, n, **kw: g.sample_videos(n, **kw),
        rngs={"sample": jax.random.PRNGKey(seed)}, mutable=["batch_stats"])[0][0]
    a, b, c = run(7), run(7), run(8)
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)


class TestDiscriminators:
    def _run(self, disc, x):
        k = jax.random.PRNGKey(0)
        variables = disc.init({"params": k}, x)
        (out, aux), _ = disc.apply(variables, x, mutable=["batch_stats"])
        return out, aux

    def test_image_discriminator_64(self):
        out, aux = self._run(ImageDiscriminator(), jnp.zeros((B, 64, 64, 3)))
        assert out.shape == (B,)
        assert aux is None

    def test_patch_image_discriminator_28(self):
        # MNIST config: PatchImageDiscriminator on 28x28 (mnist_moco_ode.py:77)
        out, _ = self._run(PatchImageDiscriminator(), jnp.zeros((B, 28, 28, 1)))
        assert out.shape[0] == B and out.ndim >= 1

    def test_patch_video_discriminator(self):
        out, _ = self._run(PatchVideoDiscriminator(), jnp.zeros((B, T, 64, 64, 3)))
        assert out.shape[0] == B

    def test_video_discriminator_ucf(self):
        out, _ = self._run(VideoDiscriminator(ksize=4), jnp.zeros((B, T, 64, 64, 3)))
        assert out.shape[0] == B

    def test_video_discriminator_mnist_ksize2(self):
        # VideoDiscriminator(1, ksize=2) on (B, 16, 28, 28, 1) clips
        # (mnist_moco_ode.py:76)
        out, _ = self._run(VideoDiscriminator(ksize=2), jnp.zeros((B, T, 28, 28, 1)))
        assert out.shape[0] == B

    def test_categorical_video_discriminator(self):
        disc = CategoricalVideoDiscriminator(dim_categorical=6)
        k = jax.random.PRNGKey(0)
        x = jnp.zeros((B, T, 64, 64, 3))
        variables = disc.init({"params": k}, x)
        (labels, categ), _ = disc.apply(variables, x, mutable=["batch_stats"])
        assert categ.shape[-1] == 6
        assert labels.shape[0] == B


def test_grad_flows_into_motion_params():
    """The generator loss must backpropagate through the ODE solve into the
    vector-field parameters — the property the whole framework exists for."""
    gen = make_generator("ode", n_channels=1, trunk="mnist28", video_length=8)
    k = jax.random.PRNGKey(0)
    variables = gen.init({"params": k, "sample": k}, 2)

    def loss(params):
        (videos, _), _ = gen.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            2, method=lambda g, n, **kw: g.sample_videos(n, **kw),
            rngs={"sample": jax.random.PRNGKey(3)}, mutable=["batch_stats"])
        return jnp.mean(videos ** 2)

    g = jax.grad(loss)(variables["params"])
    ode_grads = g["motion"]["ode_fn"]
    norms = [float(jnp.linalg.norm(x)) for x in jax.tree.leaves(ode_grads)]
    assert all(np.isfinite(n) for n in norms)
    assert any(n > 0 for n in norms), norms


class TestGResTrunks:
    """The DVD-GAN-class generator family: the stage-1 blocks the reference
    never assembled into a model (SURVEY.md §2.3 #24-25), here as trunks."""

    def test_gres64_videos(self):
        gen = make_generator("ode", n_channels=3, trunk="gres64", ngf=8,
                             dim_z_content=10, dim_z_motion=4, video_length=4)
        k = jax.random.PRNGKey(0)
        variables = gen.init({"params": k, "sample": k}, 2)
        assert "spectral" in variables
        (videos, _), mut = gen.apply(
            variables, 2, method="sample_videos",
            rngs={"sample": k}, mutable=["batch_stats", "spectral"])
        assert videos.shape == (2, 4, 64, 64, 3)
        assert np.all(np.isfinite(np.asarray(videos)))

    def test_odegres64_continuous_depth(self):
        gen = make_generator("ode", n_channels=3, trunk="odegres64", ngf=8,
                             dim_z_content=10, dim_z_motion=4, video_length=4)
        k = jax.random.PRNGKey(0)
        variables = gen.init({"params": k, "sample": k}, 2)
        (videos, _), _ = gen.apply(
            variables, 2, method="sample_videos",
            rngs={"sample": k}, mutable=["batch_stats", "spectral"])
        assert videos.shape == (2, 4, 64, 64, 3)
        assert np.all(np.isfinite(np.asarray(videos)))

    def test_gres_trains_one_step(self):
        """Spectral-norm state must thread through the full jitted train step."""
        from ganode_tpu.models import PatchImageDiscriminator, VideoDiscriminator
        from ganode_tpu.train import GANTrainer

        T = 8  # >= 6 so five k=2 time convs keep a nonempty time axis
        gen = make_generator("gru", n_channels=1, trunk="gres64", ngf=8,
                             dim_z_content=8, dim_z_motion=4, video_length=T)
        tr = GANTrainer(gen=gen, dis_img=PatchImageDiscriminator(ndf=8),
                        dis_vid=VideoDiscriminator(ksize=2, ndf=8),
                        batch_size=2, d_iters=1)
        state = tr.init_state(jax.random.PRNGKey(0))
        assert state.gen.spectral is not None
        import numpy as np
        rng = np.random.RandomState(0)
        imgs = rng.uniform(-1, 1, (1, 2, 64, 64, 1)).astype(np.float32)
        vids = rng.uniform(-1, 1, (1, 2, T, 64, 64, 1)).astype(np.float32)
        new_state, metrics = tr.train_step(state, imgs, vids,
                                           jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["gen_loss"]))
        # power-iteration state advanced during training
        changed = any(
            not np.allclose(a, b)
            for a, b in zip(jax.tree.leaves(state.gen.spectral),
                            jax.tree.leaves(new_state.gen.spectral)))
        assert changed


def test_video_discriminator_rejects_short_clips():
    disc = VideoDiscriminator(ksize=2, ndf=8)
    with pytest.raises(ValueError, match="at least 6 frames"):
        disc.init(jax.random.PRNGKey(0), jnp.zeros((2, 4, 28, 28, 1)))


class TestCompat:
    def test_generator_session_torch_layouts(self):
        from ganode_tpu.compat import GeneratorSession
        gen = make_generator("ode", n_channels=1, trunk="mnist28", ngf=8,
                             dim_z_content=8, dim_z_motion=4, video_length=8)
        sess = GeneratorSession(gen, seed=0)
        videos, labels = sess.sample_videos(3)
        assert videos.shape == (3, 1, 8, 28, 28)  # (B, C, T, H, W)
        assert labels is None
        images, aux = sess.sample_images(3)
        assert images.shape == (3, 1, 28, 28)
        # implicit RNG advances between calls (the reference's global-RNG feel)
        v2, _ = sess.sample_videos(3)
        assert not np.allclose(np.asarray(videos), np.asarray(v2))

    def test_session_video_len_override(self):
        from ganode_tpu.compat import GeneratorSession
        gen = make_generator("gru", n_channels=1, trunk="mnist28", ngf=8,
                             dim_z_content=8, dim_z_motion=4, video_length=8)
        sess = GeneratorSession(gen)
        videos, _ = sess.sample_videos(2, video_len=12)
        assert videos.shape == (2, 1, 12, 28, 28)


def test_sn_video_discriminator():
    """SN video critic: correct contract, 'spectral' state, and no BatchNorm."""
    from ganode_tpu.models import SNVideoDiscriminator

    disc = SNVideoDiscriminator(ksize=2, ndf=8)
    x = jnp.zeros((B, T, 28, 28, 1))
    variables = disc.init({"params": jax.random.PRNGKey(0)}, x)
    assert "spectral" in variables
    assert "batch_stats" not in variables  # BN-free by construction (WGAN-GP)
    (out, aux), mut = disc.apply(variables, x, mutable=["spectral"])
    assert out.shape[0] == B and aux is None


def test_sn_video_discriminator_rejects_short_clips():
    from ganode_tpu.models import SNVideoDiscriminator

    disc = SNVideoDiscriminator(ksize=4, ndf=8)
    with pytest.raises(ValueError):
        disc.init({"params": jax.random.PRNGKey(0)},
                  jnp.zeros((2, 8, 64, 64, 3)))
