"""Golden tests for the reference-checkpoint importer (ganode_tpu.compat_torch).

The reference models are EXECUTED from /root/reference (never copied): we
instantiate them in torch, convert their state_dicts, and require our modules
to reproduce their forwards. torchdiffeq/torchsde/torchcde and the reference's
broken `on_dev` package (SURVEY §2.4) are stubbed/aliased before import — the
stubs are only needed to get the module files to import; no solver from them
is ever called (motion parity integrates a textbook RK4 in-test instead).
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ganode_tpu import ode
from ganode_tpu.compat_torch import (
    import_gan_state, import_generator, import_image_discriminator,
    import_video_discriminator)
from ganode_tpu.models.mocogan import (
    DCGANTrunk64, ImageDiscriminator, MNISTTrunk28, PatchImageDiscriminator,
    PatchVideoDiscriminator, VideoDiscriminator)
from ganode_tpu.nn.layers import MLP, WarmupMLP


@pytest.fixture(scope="module")
def ref():
    """Import the reference model modules with their missing deps stubbed."""
    created = {}
    for name in ("torchdiffeq", "torchsde", "torchcde"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.odeint_adjoint = mod.sdeint_adjoint = mod.cdeint = None
            sys.modules[name] = mod
            created[name] = mod
    sys.path.insert(0, "/root/reference")
    try:
        import models.mocogan as mocogan
        import models.mocogan_ode as mocogan_ode
        # mocogan_sde/cde/ode_rnn import the renamed-away `on_dev` package
        on_dev = types.ModuleType("on_dev")
        sys.modules.setdefault("on_dev", on_dev)
        sys.modules.setdefault("on_dev.mocogan_ode", mocogan_ode)
        on_dev.mocogan_ode = mocogan_ode
        import models.mocogan_ode_rnn as mocogan_ode_rnn
        import models.mocogan_sde as mocogan_sde
        yield types.SimpleNamespace(
            mocogan=mocogan, ode=mocogan_ode, sde=mocogan_sde,
            ode_rnn=mocogan_ode_rnn)
    finally:
        sys.path.remove("/root/reference")


@pytest.fixture(autouse=True)
def _seed_torch():
    torch.manual_seed(0)


def _t2j_images(x):  # torch (B, C, H, W) -> ours (B, H, W, C)
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def _t2j_videos(x):  # torch (B, C, T, H, W) -> ours (B, T, H, W, C)
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 4, 1))


def _warm_batchnorm(model, x):
    """One train-mode torch forward so running stats become non-trivial —
    the converted eval forward must then match through those stats too."""
    model.train()
    with torch.no_grad():
        model(x)
    model.eval()


class TestGeneratorTrunk:
    def test_mnist28_trunk_matches_reference(self, ref):
        tgen = ref.ode.VideoGeneratorMNIST(1, 10, 0, 4, 4, ngf=16)
        z = torch.randn(8, 14, 1, 1)
        _warm_batchnorm(tgen.main, z)
        with torch.no_grad():
            want = tgen.main(z).numpy()  # (8, 1, 28, 28)

        params, stats = import_generator(tgen.state_dict(), variant="ode",
                                         trunk="mnist28")
        trunk = MNISTTrunk28(n_channels=1, ngf=16)
        got = trunk.apply(
            {"params": params["main"], "batch_stats": stats["main"]},
            _t2j_images(z), train=False)
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   want, rtol=1e-4, atol=1e-4)

    def test_dcgan64_trunk_matches_reference(self, ref):
        tgen = ref.mocogan.VideoGenerator(3, 10, 0, 4, 4, ngf=16)
        z = torch.randn(4, 14, 1, 1)
        _warm_batchnorm(tgen.main, z)
        with torch.no_grad():
            want = tgen.main(z).numpy()  # (4, 3, 64, 64)

        params, stats = import_generator(tgen.state_dict(), variant="gru",
                                         trunk="dcgan64")
        trunk = DCGANTrunk64(n_channels=3, ngf=16)
        got = trunk.apply(
            {"params": params["main"], "batch_stats": stats["main"]},
            _t2j_images(z), train=False)
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   want, rtol=1e-4, atol=1e-4)


class TestMotionImport:
    def test_ode_motion_trajectory_matches_reference_field(self, ref):
        """Warm-up MLP + full RK4 trajectory through the imported vector field
        vs a textbook RK4 over the executed reference ODEFunc."""
        tgen = ref.ode.VideoGeneratorMNIST(1, 10, 0, 4, 16, ngf=8)
        params, _ = import_generator(tgen.state_dict(), variant="ode",
                                     trunk="mnist28")
        x0 = torch.randn(6, 4)

        with torch.no_grad():
            xw = tgen.linear(x0)
            # textbook fixed-grid RK4 over linspace(0,1,16) — the reference's
            # solver cost/semantics (models/mocogan_ode.py:105-107)
            ts = torch.linspace(0, 1, 16)
            y, ys = xw, [xw]
            f = lambda t, v: tgen.ode_fn(t, v)
            for t0, t1 in zip(ts[:-1], ts[1:]):
                h = t1 - t0
                k1 = f(t0, y)
                k2 = f(t0 + h / 2, y + h / 2 * k1)
                k3 = f(t0 + h / 2, y + h / 2 * k2)
                k4 = f(t1, y + h * k3)
                y = y + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
                ys.append(y)
            want = torch.stack(ys).numpy()  # (16, 6, 4)

        warm = WarmupMLP(4)
        xw_j = warm.apply({"params": params["motion"]["WarmupMLP_0"]},
                          jnp.asarray(x0.numpy()))
        np.testing.assert_allclose(np.asarray(xw_j), xw.numpy(),
                                   rtol=1e-5, atol=1e-6)

        field = MLP((4, 4), activation=jnp.tanh)
        rhs = lambda t, v, p: field.apply({"params": p}, v)
        zs = ode.odeint(rhs, xw_j, jnp.linspace(0.0, 1.0, 16),
                        params["motion"]["ode_fn"], method="rk4")
        # f32 accumulation over 60 RHS evals differs between the two stacks by
        # up to ~1e-5 absolute; near-zero trajectory values make rtol useless
        np.testing.assert_allclose(np.asarray(zs), want, rtol=1e-4, atol=1e-4)

    def test_gru_motion_step_matches_reference(self, ref):
        from ganode_tpu.nn.layers import GRUCell

        tgen = ref.mocogan.VideoGenerator(3, 10, 0, 4, 8, ngf=8)
        params, _ = import_generator(tgen.state_dict(), variant="gru",
                                     trunk="dcgan64")
        h = torch.randn(5, 4)
        e = torch.randn(5, 4)
        with torch.no_grad():
            want = tgen.recurrent(e, h).numpy()
        got = GRUCell(4).apply({"params": params["motion"]["gru"]},
                               jnp.asarray(h.numpy()), jnp.asarray(e.numpy()))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    def test_sde_motion_fields_match_reference(self, ref):
        tgen = ref.sde.VideoGeneratorSDE(1, 10, 0, 4, 16, ngf=8)
        params, _ = import_generator(tgen.state_dict(), variant="sde",
                                     trunk="mnist28")
        x = torch.randn(6, 4)
        with torch.no_grad():
            want_f = tgen.ode_fn.f(0.0, x).numpy()
            want_g = tgen.ode_fn.g(0.0, x).numpy()
        field = MLP((4, 4), activation=jnp.tanh)
        xj = jnp.asarray(x.numpy())
        got_f = field.apply({"params": params["motion"]["drift_fn"]}, xj)
        got_g = field.apply({"params": params["motion"]["diffusion_fn"]}, xj)
        np.testing.assert_allclose(np.asarray(got_f), want_f, rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_g), want_g, rtol=1e-5,
                                   atol=1e-6)


class TestDiscriminatorImport:
    def test_video_discriminator_ksize2(self, ref):
        tdis = ref.mocogan.VideoDiscriminator(1, ndf=8, ksize=2)
        x = torch.randn(2, 1, 16, 28, 28)
        _warm_batchnorm(tdis, x)
        with torch.no_grad():
            want = tdis(x)[0].numpy()
        params, stats = import_video_discriminator(tdis.state_dict(),
                                                   kind="full", ksize=2)
        got, _ = VideoDiscriminator(ndf=8, ksize=2).apply(
            {"params": params, "batch_stats": stats}, _t2j_videos(x),
            train=False)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    def test_video_discriminator_ksize4_fastgrad_path(self, ref):
        tdis = ref.mocogan.VideoDiscriminator(3, ndf=8, ksize=4)
        x = torch.randn(2, 3, 16, 64, 64)
        _warm_batchnorm(tdis, x)
        with torch.no_grad():
            want = tdis(x)[0].numpy()
        params, stats = import_video_discriminator(tdis.state_dict(),
                                                   kind="full", ksize=4)
        got, _ = VideoDiscriminator(ndf=8, ksize=4).apply(
            {"params": params, "batch_stats": stats}, _t2j_videos(x),
            train=False)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    def test_patch_video_discriminator(self, ref):
        tdis = ref.mocogan.PatchVideoDiscriminator(3, ndf=8)
        x = torch.randn(2, 3, 16, 64, 64)
        _warm_batchnorm(tdis, x)
        with torch.no_grad():
            want = tdis(x)[0].numpy()
        params, stats = import_video_discriminator(tdis.state_dict(),
                                                   kind="patch")
        got, _ = PatchVideoDiscriminator(ndf=8).apply(
            {"params": params, "batch_stats": stats}, _t2j_videos(x),
            train=False)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    def test_patch_image_discriminator(self, ref):
        tdis = ref.mocogan.PatchImageDiscriminator(1, ndf=8)
        x = torch.randn(4, 1, 28, 28)
        _warm_batchnorm(tdis, x)
        with torch.no_grad():
            want = tdis(x)[0].numpy()
        params, stats = import_image_discriminator(tdis.state_dict(),
                                                   kind="patch")
        got, _ = PatchImageDiscriminator(ndf=8).apply(
            {"params": params, "batch_stats": stats}, _t2j_images(x),
            train=False)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    def test_full_image_discriminator(self, ref):
        tdis = ref.mocogan.ImageDiscriminator(3, ndf=8)
        x = torch.randn(4, 3, 64, 64)
        _warm_batchnorm(tdis, x)
        with torch.no_grad():
            want = tdis(x)[0].numpy()
        params, stats = import_image_discriminator(tdis.state_dict(),
                                                   kind="full")
        got, _ = ImageDiscriminator(ndf=8).apply(
            {"params": params, "batch_stats": stats}, _t2j_images(x),
            train=False)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


class TestImportGANState:
    def _reference_ckpt(self, ref, tmp_path):
        gen = ref.ode.VideoGeneratorMNIST(1, 10, 0, 4, 16, ngf=8)
        dis_vid = ref.mocogan.VideoDiscriminator(1, ndf=8, ksize=2)
        dis_img = ref.mocogan.PatchImageDiscriminator(1, ndf=8)
        # the reference's exact on-disk layout (mnist_moco_ode.py:175-182)
        ckpt = {"epoch": 41000,
                "model_state_dict": [gen.state_dict(), dis_vid.state_dict(),
                                     dis_img.state_dict()],
                "optimizer_state_dict": [{}, {}, {}]}
        path = tmp_path / "state_normal41000.ckpt"
        torch.save(ckpt, str(path))
        return gen, str(path)

    def test_import_and_sample_and_finetune(self, ref, tmp_path):
        from ganode_tpu.compat_torch import load_reference_checkpoint
        from ganode_tpu.train.runner import build_trainer
        from ganode_tpu.utils.config import get_config

        tgen, path = self._reference_ckpt(ref, tmp_path)
        cfg = get_config("mnist_ode", ngf=8, ndf=8, dim_z_content=10,
                         dim_z_motion=4, batch_size=2)
        trainer = build_trainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        ckpt = load_reference_checkpoint(path)
        state = import_gan_state(ckpt, state, cfg)
        assert int(state.step) == 41000

        # the imported generator must reproduce the reference trunk's frames
        z = torch.randn(4, 14, 1, 1)
        tgen.eval()
        with torch.no_grad():
            want = tgen.main(z).numpy()
        got = MNISTTrunk28(n_channels=1, ngf=8).apply(
            {"params": state.gen.params["main"],
             "batch_stats": state.gen.batch_stats["main"]},
            _t2j_images(z), train=False)
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   want, rtol=1e-4, atol=1e-4)

        # ...and the state must be trainable: one alternating step
        key = jax.random.PRNGKey(1)
        images = jnp.zeros((2, 2, 28, 28, 1))
        videos = jnp.zeros((2, 2, 16, 28, 28, 1))
        new_state, metrics = trainer.train_step(state, images, videos, key)
        assert int(new_state.step) == 41001
        assert all(np.isfinite(float(v)) for v in jax.tree.leaves(metrics))

    def test_shape_mismatch_is_loud(self, ref, tmp_path):
        from ganode_tpu.compat_torch import load_reference_checkpoint
        from ganode_tpu.train.runner import build_trainer
        from ganode_tpu.utils.config import get_config

        _, path = self._reference_ckpt(ref, tmp_path)
        cfg = get_config("mnist_ode", ngf=16, ndf=8, dim_z_content=10,
                         dim_z_motion=4, batch_size=2)  # ngf mismatch
        trainer = build_trainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        with pytest.raises(ValueError, match="reference shape"):
            import_gan_state(load_reference_checkpoint(path), state, cfg)

    def test_sn_configs_are_rejected(self, ref, tmp_path):
        from ganode_tpu.compat_torch import load_reference_checkpoint
        from ganode_tpu.train.runner import build_trainer
        from ganode_tpu.utils.config import get_config

        _, path = self._reference_ckpt(ref, tmp_path)
        cfg = get_config("mnist_ode", ngf=8, ndf=8, dim_z_content=10,
                         dim_z_motion=4, video_disc="sn")
        trainer = build_trainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        with pytest.raises(ValueError, match="SN critics"):
            import_gan_state(load_reference_checkpoint(path), state, cfg)


def _find_adam_state(node):
    import optax
    if isinstance(node, optax.ScaleByAdamState):
        return node
    if isinstance(node, tuple):
        for x in node:
            r = _find_adam_state(x)
            if r is not None:
                return r
    return None


class TestOptimizerImport:
    def test_adam_moments_import(self, ref, tmp_path):
        """Populate torch Adam state with real backward steps on the executed
        reference nets, import, and check the moments landed: correct layout
        transform on a deconv moment, lazy-state params (the ODE variant's
        motion nets get no grads through a trunk-only loss) default to zero,
        count == torch step, and the state still trains."""
        from ganode_tpu.compat_torch import load_reference_checkpoint
        from ganode_tpu.train.runner import build_trainer
        from ganode_tpu.utils.config import get_config

        gen = ref.ode.VideoGeneratorMNIST(1, 10, 0, 4, 16, ngf=8)
        dis_vid = ref.mocogan.VideoDiscriminator(1, ndf=8, ksize=2)
        dis_img = ref.mocogan.PatchImageDiscriminator(1, ndf=8)
        adam = lambda m: torch.optim.Adam(m.parameters(), lr=2e-4,
                                          betas=(0.5, 0.999),
                                          weight_decay=1e-5)
        g_opt, v_opt, i_opt = adam(gen), adam(dis_vid), adam(dis_img)
        # one real step per net; the generator loss goes through main only, so
        # the motion nets (ode_fn/linear/recurrent) stay lazily stateless
        gen.main(torch.randn(4, 14, 1, 1)).sum().backward()
        g_opt.step()
        dis_vid(torch.randn(2, 1, 16, 28, 28))[0].sum().backward()
        v_opt.step()
        dis_img(torch.randn(2, 1, 28, 28))[0].sum().backward()
        i_opt.step()

        ckpt = {"epoch": 7,
                "model_state_dict": [gen.state_dict(), dis_vid.state_dict(),
                                     dis_img.state_dict()],
                "optimizer_state_dict": [g_opt.state_dict(),
                                         v_opt.state_dict(),
                                         i_opt.state_dict()]}
        path = tmp_path / "state_normal7.ckpt"
        torch.save(ckpt, str(path))

        cfg = get_config("mnist_ode", ngf=8, ndf=8, dim_z_content=10,
                         dim_z_motion=4, batch_size=2)
        trainer = build_trainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        state = import_gan_state(load_reference_checkpoint(str(path)),
                                 state, cfg)

        adam_state = _find_adam_state(state.gen.opt_state)
        assert adam_state is not None
        assert int(adam_state.count) == 1  # one torch step taken

        # deconv moment carries the same layout transform as its parameter
        names = [k for k in gen.state_dict()
                 if not k.endswith(("running_mean", "running_var",
                                    "num_batches_tracked"))]
        idx = names.index("main.3.weight")
        t_avg = g_opt.state_dict()["state"][idx]["exp_avg"].numpy()
        want = t_avg.transpose(2, 3, 0, 1)[::-1, ::-1]
        got = np.asarray(adam_state.mu["main"]["ConvTranspose_1"]["kernel"])
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)

        # lazily-stateless params import zero moments (optax init semantics)
        assert float(jnp.max(jnp.abs(jax.tree.leaves(
            adam_state.mu["motion"])[0]))) == 0.0

        # discriminator moments landed too, and the state still trains
        assert int(_find_adam_state(state.dis_vid.opt_state).count) == 1
        images = jnp.zeros((2, 2, 28, 28, 1))
        videos = jnp.zeros((2, 2, 16, 28, 28, 1))
        new_state, metrics = trainer.train_step(
            state, images, videos, jax.random.PRNGKey(1))
        assert all(np.isfinite(float(v)) for v in jax.tree.leaves(metrics))
