"""ODE-GAN trainer equivalence tests.

The RK recombination algebra is exactly the kind of code that silently rots
(SURVEY.md §4), so these tests pin it against (a) hand-computed closed forms on
quadratic losses and (b) the reference implementation itself, executed (not
copied) from /root/reference/stage2/ode_training.py on identical tiny problems.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganode_tpu.train import (
    ODEGANTrainer,
    discriminator_regularizer,
    euler_step,
    rk2_step,
    rk4_step,
)

jax.config.update("jax_enable_x64", True)


def _quad_loss(p, key, batch):
    # L = 0.5 * ||p||^2 -> grad = p; flow dp/dt = -p has exact solution p e^{-lr}
    return 0.5 * jnp.sum(p["w"] ** 2)


class TestClosedForm:
    def test_euler_quadratic(self):
        p = {"w": jnp.asarray([1.0, -2.0])}
        lr = 0.1
        new = euler_step(p, _quad_loss, lr, jax.random.PRNGKey(0))
        np.testing.assert_allclose(new["w"], p["w"] * (1 - lr), rtol=1e-12)

    def test_rk2_quadratic(self):
        p = {"w": jnp.asarray([1.0, -2.0])}
        lr = 0.1
        new = rk2_step(p, _quad_loss, lr, jax.random.PRNGKey(0))
        # g1 = w; g2 = w(1-lr); update = -lr/2 (g1+g2) => factor 1 - lr + lr^2/2
        factor = 1 - lr + lr ** 2 / 2
        np.testing.assert_allclose(new["w"], p["w"] * factor, rtol=1e-12)

    def test_rk4_quadratic_matches_exp_series(self):
        p = {"w": jnp.asarray([3.0])}
        lr = 0.3
        new = rk4_step(p, _quad_loss, lr, jax.random.PRNGKey(0))
        # classic RK4 on dp/dt=-p: 4th-order Taylor of e^{-lr}
        factor = 1 - lr + lr ** 2 / 2 - lr ** 3 / 6 + lr ** 4 / 24
        np.testing.assert_allclose(new["w"], p["w"] * factor, rtol=1e-12)


class TestReferenceGolden:
    """Run the actual reference GANODETrainer on identical tiny problems."""

    @pytest.fixture()
    def reference_trainer_cls(self):
        torch = pytest.importorskip("torch")
        sys.path.insert(0, "/root/reference/stage2")
        try:
            from ode_training import GANODETrainer
        finally:
            sys.path.pop(0)
        return GANODETrainer

    @pytest.mark.parametrize("method", ["euler", "rk2", "rk4"])
    def test_matches_reference_no_penalty(self, reference_trainer_cls, method):
        import torch

        w0 = np.asarray([0.7, -1.3, 2.1])
        a = np.asarray([1.5, 0.5, -0.8])

        # torch side: single-parameter "generator", loss = sum(a * w^2) + sum(w)
        tw = torch.tensor(w0, requires_grad=True, dtype=torch.float64)
        ta = torch.tensor(a, dtype=torch.float64)
        t_loss = lambda: torch.sum(ta * tw ** 2) + torch.sum(tw)
        trainer = reference_trainer_cls(
            [tw], [torch.tensor([0.0], requires_grad=True)], None,
            t_loss, lambda: None, None, lr=0.05, reg=0.0, method=method)
        trainer.ode_step([tw], t_loss, None, False)
        expected = tw.detach().numpy()

        # jax side
        jp = {"w": jnp.asarray(w0)}
        ja = jnp.asarray(a)
        j_loss = lambda p, key, batch: jnp.sum(ja * p["w"] ** 2) + jnp.sum(p["w"])
        stepper = {"euler": euler_step, "rk2": rk2_step, "rk4": rk4_step}[method]
        got = stepper(jp, j_loss, 0.05, jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(got["w"]), expected, rtol=1e-10)

    @pytest.mark.parametrize("method", ["euler", "rk2", "rk4"])
    def test_matches_reference_with_penalty(self, reference_trainer_cls, method):
        """Bilinear min-max toy: g_loss = g^T M d, discriminator step with the
        ODE-GAN regularizer grad_d ||grad_g L_G||^2."""
        import torch

        g0 = np.asarray([0.4, -0.6])
        d0 = np.asarray([1.1, 0.3])
        M = np.asarray([[0.5, -0.2], [0.8, 0.1]])

        tg = torch.tensor(g0, requires_grad=True, dtype=torch.float64)
        td = torch.tensor(d0, requires_grad=True, dtype=torch.float64)
        tM = torch.tensor(M, dtype=torch.float64)
        t_g_loss = lambda: tg @ tM @ td
        t_d_loss = lambda: -(tg @ tM @ td)  # discriminator maximizes
        trainer = reference_trainer_cls(
            [tg], [td], None, t_g_loss, t_d_loss, None,
            lr=0.05, reg=0.01, method=method)
        trainer.step(model="dis_img")
        expected = td.detach().numpy()

        all_params = {"gen": {"w": jnp.asarray(g0)},
                      "dis_img": {"w": jnp.asarray(d0)},
                      "dis_vid": None}
        jM = jnp.asarray(M)
        g_loss = lambda p, key, batch: p["gen"]["w"] @ jM @ p["dis_img"]["w"]
        d_loss = lambda p, key, batch: -(p["gen"]["w"] @ jM @ p["dis_img"]["w"])
        trainer_j = ODEGANTrainer(g_loss=g_loss, d_img_loss=d_loss,
                                  lr=0.05, reg=0.01, method=method)
        out = trainer_j.step(all_params, jax.random.PRNGKey(0), model="dis_img")
        np.testing.assert_allclose(np.asarray(out["dis_img"]["w"]), expected,
                                   rtol=1e-10)
        # generator untouched by a discriminator step
        np.testing.assert_array_equal(np.asarray(out["gen"]["w"]), g0)


class TestRegularizer:
    def test_bilinear_closed_form(self):
        # L_G = g^T M d -> grad_g = M d -> ||.||^2 = d^T M^T M d
        # -> grad_d = 2 M^T M d
        M = jnp.asarray([[1.0, 2.0], [0.0, 1.0]])
        g = jnp.asarray([0.3, -0.4])
        d = jnp.asarray([0.5, 0.7])
        gp = discriminator_regularizer(
            lambda g_, d_: g_ @ M @ d_, g, d, jax.random.PRNGKey(0))
        expected = 2.0 * (M.T @ M) @ d
        np.testing.assert_allclose(gp, expected, rtol=1e-10)


class TestDispatch:
    def test_unknown_method_rejected(self):
        with pytest.raises(ValueError):
            ODEGANTrainer(g_loss=_quad_loss, d_img_loss=_quad_loss, method="rk5")

    def test_gen_step_updates_only_gen(self):
        params = {"gen": {"w": jnp.ones(2)}, "dis_img": {"w": jnp.ones(2)},
                  "dis_vid": {"w": jnp.ones(2)}}
        loss = lambda p, k, b: 0.5 * jnp.sum(p["gen"]["w"] ** 2)
        tr = ODEGANTrainer(g_loss=loss, d_img_loss=loss, reg=0.0, method="euler",
                           lr=0.1)
        out = tr.step(params, jax.random.PRNGKey(0), model="gen")
        assert not np.allclose(out["gen"]["w"], params["gen"]["w"])
        np.testing.assert_array_equal(out["dis_img"]["w"], params["dis_img"]["w"])


class TestMoCoGANIntegration:
    def test_rk4_step_over_full_video_gan(self):
        """One ODE-GAN rk4 step over the complete MoCoGAN triple (the
        integration the reference's trainer signature promises at
        stage2/ode_training.py:5 but never exercises)."""
        from ganode_tpu.models import (
            PatchImageDiscriminator, VideoDiscriminator, make_generator)
        from ganode_tpu.train import ODEGANTrainer, make_mocogan_losses

        T = 8
        gen = make_generator("ode", n_channels=1, trunk="mnist28", ngf=8,
                             dim_z_content=8, dim_z_motion=4, video_length=T)
        dis_img = PatchImageDiscriminator(ndf=8)
        dis_vid = VideoDiscriminator(ksize=2, ndf=8)
        k = jax.random.PRNGKey(0)
        gv = gen.init({"params": k, "sample": k}, 2)
        iv = dis_img.init(k, jnp.zeros((2, 28, 28, 1)))
        vv = dis_vid.init(k, jnp.zeros((2, T, 28, 28, 1)))
        params = {"gen": gv["params"], "dis_img": iv["params"],
                  "dis_vid": vv["params"]}

        g_loss, di_loss, dv_loss = make_mocogan_losses(
            gen, dis_img, dis_vid, gv["batch_stats"], iv["batch_stats"],
            vv["batch_stats"], batch_size=2)
        trainer = ODEGANTrainer(g_loss=g_loss, d_img_loss=di_loss,
                                d_vid_loss=dv_loss, lr=0.01, reg=0.01,
                                method="rk4")

        rng = np.random.RandomState(0)
        imgs = jnp.asarray(rng.uniform(-1, 1, (2, 28, 28, 1)), jnp.float32)
        vids = jnp.asarray(rng.uniform(-1, 1, (2, T, 28, 28, 1)), jnp.float32)

        p1 = trainer.step(params, jax.random.PRNGKey(1), imgs, model="dis_img")
        p2 = trainer.step(p1, jax.random.PRNGKey(2), vids, model="dis_vid")
        p3 = trainer.step(p2, jax.random.PRNGKey(3), model="gen")

        def changed(a, b):
            return any(not np.allclose(x, y) for x, y in
                       zip(jax.tree.leaves(a), jax.tree.leaves(b)))

        assert changed(params["dis_img"], p1["dis_img"])
        assert not changed(params["gen"], p1["gen"])       # D step leaves G
        assert changed(p1["dis_vid"], p2["dis_vid"])
        assert changed(p2["gen"], p3["gen"])               # G step moves G
        loss_after = float(g_loss(p3, jax.random.PRNGKey(9), None))
        assert np.isfinite(loss_after)
