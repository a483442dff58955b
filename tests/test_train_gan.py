"""One-step end-to-end training tests (the 'dry_run' smoke mode the reference only
had in its CIFAR notebook, SURVEY.md §4), on tiny models for CPU speed."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganode_tpu.models import (
    PatchImageDiscriminator,
    VideoDiscriminator,
    make_generator,
)
from ganode_tpu.train import GANTrainer, bce_logits


B, T = 4, 8
NGF = 8


def _tiny_trainer(**kwargs):
    gen = make_generator("ode", n_channels=1, trunk="mnist28", video_length=T,
                         dim_z_content=10, dim_z_motion=4, ngf=NGF)
    defaults = dict(batch_size=B, d_iters=2)
    defaults.update(kwargs)
    return GANTrainer(
        gen=gen,
        dis_img=PatchImageDiscriminator(ndf=NGF),
        dis_vid=VideoDiscriminator(ksize=2, ndf=NGF),
        **defaults,
    )


def _fake_batches(key, d_iters=2):
    k1, k2 = jax.random.split(key)
    images = jax.random.uniform(k1, (d_iters, B, 28, 28, 1), minval=-1, maxval=1)
    videos = jax.random.uniform(k2, (d_iters, B, T, 28, 28, 1), minval=-1, maxval=1)
    return images, videos


def test_bce_matches_torch():
    torch = pytest.importorskip("torch")
    logits = np.random.RandomState(0).randn(7).astype(np.float32)
    for target in (0.0, 1.0):
        expected = torch.nn.BCEWithLogitsLoss()(
            torch.tensor(logits), torch.full((7,), target)).item()
        got = float(bce_logits(jnp.asarray(logits), target))
        np.testing.assert_allclose(got, expected, rtol=1e-6)


class TestTrainStep:
    def test_ema_generator(self):
        """ema_decay > 0: state carries an EMA of the generator params that
        follows e' = d*e + (1-d)*p after each G update, and eval sampling
        (eval_gen_variables) serves the EMA weights; off by default."""
        d = 0.5
        trainer = _tiny_trainer(d_iters=1, ema_decay=d)
        state = trainer.init_state(jax.random.PRNGKey(0))
        assert state.ema_params is not None
        expected = jax.tree.map(jnp.asarray, state.gen.params)
        images, videos = _fake_batches(jax.random.PRNGKey(1), d_iters=1)
        for i in range(2):
            state, _ = trainer.train_step(state, images, videos,
                                          jax.random.PRNGKey(2 + i))
            expected = jax.tree.map(lambda e, p: d * e + (1 - d) * p,
                                    expected, state.gen.params)
        for a, b in zip(jax.tree.leaves(state.ema_params),
                        jax.tree.leaves(expected)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
        # EMA differs from the raw params and is what eval sampling serves
        diffs = [float(jnp.max(jnp.abs(a - b))) for a, b in zip(
            jax.tree.leaves(state.ema_params),
            jax.tree.leaves(state.gen.params))]
        assert max(diffs) > 0
        v = trainer.eval_gen_variables(state)
        assert v["params"] is state.ema_params

        # default: off, raw params served
        t0 = _tiny_trainer(d_iters=1)
        s0 = t0.init_state(jax.random.PRNGKey(0))
        assert s0.ema_params is None
        assert t0.eval_gen_variables(s0)["params"] is s0.gen.params

    def test_ema_checkpoint_roundtrip(self, tmp_path):
        from ganode_tpu.utils.checkpoint import CheckpointManager

        trainer = _tiny_trainer(d_iters=1, ema_decay=0.9)
        state = trainer.init_state(jax.random.PRNGKey(0))
        images, videos = _fake_batches(jax.random.PRNGKey(1), d_iters=1)
        state, _ = trainer.train_step(state, images, videos,
                                      jax.random.PRNGKey(2))
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(1, state, wait=True)
        restored = mgr.restore(trainer.init_state(jax.random.PRNGKey(9)))
        mgr.close()
        for a, b in zip(jax.tree.leaves(state.ema_params),
                        jax.tree.leaves(restored.ema_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_ema_checkpoint_restores_through_no_ema_template(self, tmp_path):
        """ADVICE r2 (medium): evaluate.py/generate.py build their restore
        template from named configs whose ema_decay defaults to 0, so the
        template has ema_params=None while an --ema-trained checkpoint carries
        the subtree. CheckpointManager.restore reconciles the template against
        the checkpoint's metadata, so the cross-config restore works in BOTH
        directions."""
        from ganode_tpu.utils.checkpoint import CheckpointManager

        trainer = _tiny_trainer(d_iters=1, ema_decay=0.9)
        state = trainer.init_state(jax.random.PRNGKey(0))
        images, videos = _fake_batches(jax.random.PRNGKey(1), d_iters=1)
        state, _ = trainer.train_step(state, images, videos,
                                      jax.random.PRNGKey(2))
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(1, state, wait=True)

        # evaluate.py's path: template from the default (no-EMA) config
        plain = _tiny_trainer(d_iters=1)
        restored = mgr.restore(plain.init_state(jax.random.PRNGKey(9)))
        assert restored.ema_params is not None
        for a, b in zip(jax.tree.leaves(state.ema_params),
                        jax.tree.leaves(restored.ema_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # eval_gen_variables on the restored state serves the EMA weights
        assert plain.eval_gen_variables(restored)["params"] \
            is restored.ema_params
        mgr.close()

        # reverse: no-EMA checkpoint read through an EMA-expecting template
        plain_state = plain.init_state(jax.random.PRNGKey(3))
        mgr2 = CheckpointManager(str(tmp_path / "ckpt2"))
        mgr2.save(1, plain_state, wait=True)
        restored2 = mgr2.restore(trainer.init_state(jax.random.PRNGKey(9)))
        assert restored2.ema_params is None
        mgr2.close()

    def test_one_step_updates_everything(self):
        trainer = _tiny_trainer()
        state = trainer.init_state(jax.random.PRNGKey(0))
        images, videos = _fake_batches(jax.random.PRNGKey(1))
        new_state, metrics = trainer.train_step(state, images, videos,
                                                jax.random.PRNGKey(2))

        for name in ("dis_img_loss", "dis_vid_loss", "gen_loss"):
            assert np.isfinite(float(metrics[name])), name
        assert int(new_state.step) == 1

        def changed(old, new):
            return any(
                not np.allclose(a, b)
                for a, b in zip(jax.tree.leaves(old), jax.tree.leaves(new)))

        assert changed(state.gen.params, new_state.gen.params)
        assert changed(state.dis_img.params, new_state.dis_img.params)
        assert changed(state.dis_vid.params, new_state.dis_vid.params)
        # BatchNorm stats advanced on generator and discriminators
        assert changed(state.gen.batch_stats, new_state.gen.batch_stats)
        assert changed(state.dis_vid.batch_stats, new_state.dis_vid.batch_stats)

    def test_step_is_deterministic_in_key(self):
        trainer = _tiny_trainer()
        state = trainer.init_state(jax.random.PRNGKey(0))
        images, videos = _fake_batches(jax.random.PRNGKey(1))
        s1, m1 = trainer.train_step(state, images, videos, jax.random.PRNGKey(5))
        s2, m2 = trainer.train_step(state, images, videos, jax.random.PRNGKey(5))
        np.testing.assert_allclose(float(m1["gen_loss"]), float(m2["gen_loss"]),
                                   rtol=1e-6)
        l1 = jax.tree.leaves(s1.gen.params)
        l2 = jax.tree.leaves(s2.gen.params)
        for a, b in zip(l1, l2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_jitted_step_runs(self):
        trainer = _tiny_trainer(d_iters=1)
        state = trainer.init_state(jax.random.PRNGKey(0))
        images, videos = _fake_batches(jax.random.PRNGKey(1), d_iters=1)
        step = trainer.jitted_step(donate=False)
        new_state, metrics = step(state, images, videos, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["gen_loss"]))
        # second call reuses the compiled program
        new_state, _ = step(new_state, images, videos, jax.random.PRNGKey(3))
        assert int(new_state.step) == 2

    def test_wasserstein_with_param_noise(self):
        # the wgan variant config: Wasserstein losses + parameter noise
        # (mnist_moco_ode_wgan.py:30-35,96-98)
        trainer = _tiny_trainer(loss="wasserstein", param_noise_sigma=1e-4,
                                d_iters=1)
        state = trainer.init_state(jax.random.PRNGKey(0))
        images, videos = _fake_batches(jax.random.PRNGKey(1), d_iters=1)
        new_state, metrics = trainer.train_step(state, images, videos,
                                                jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["dis_img_loss"]))

    def test_wgan_gp(self):
        trainer = _tiny_trainer(loss="wasserstein", gp_weight=10.0, d_iters=1)
        state = trainer.init_state(jax.random.PRNGKey(0))
        images, videos = _fake_batches(jax.random.PRNGKey(1), d_iters=1)
        new_state, metrics = trainer.train_step(state, images, videos,
                                                jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["dis_vid_loss"]))

    def test_r1_penalty_closed_form(self):
        """r1_penalty against hand algebra: for linear D(x) = <w, x> the
        per-sample input gradient is w, so R1 = 0.5*||w||^2; for quadratic
        D(x) = a*||x||^2 the gradient is 2a*x, so R1 = 2 a^2 mean ||x_i||^2."""
        from ganode_tpu.train import r1_penalty

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(5, 3, 4).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 4).astype(np.float32))
        got = float(r1_penalty(lambda b: jnp.einsum("bij,ij->b", b, w), x))
        np.testing.assert_allclose(got, 0.5 * float(jnp.sum(w ** 2)),
                                   rtol=1e-6)
        a = 0.7
        got = float(r1_penalty(lambda b: a * jnp.sum(b ** 2, axis=(1, 2)), x))
        expected = 2 * a ** 2 * float(
            jnp.mean(jnp.sum(x ** 2, axis=(1, 2))))
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_r1_trainer_step(self):
        """r1_weight > 0 runs finite and actually changes the D update
        (vs the same step with R1 off, identical keys)."""
        images, videos = _fake_batches(jax.random.PRNGKey(1), d_iters=1)
        t_r1 = _tiny_trainer(d_iters=1, r1_weight=10.0)
        t_off = _tiny_trainer(d_iters=1)
        s1 = t_r1.init_state(jax.random.PRNGKey(0))
        s0 = t_off.init_state(jax.random.PRNGKey(0))
        s1, m1 = t_r1.train_step(s1, images, videos, jax.random.PRNGKey(2))
        s0, m0 = t_off.train_step(s0, images, videos, jax.random.PRNGKey(2))
        for v in m1.values():
            assert np.isfinite(float(v))
        diffs = [float(jnp.max(jnp.abs(a - b))) for a, b in zip(
            jax.tree.leaves(s1.dis_vid.params),
            jax.tree.leaves(s0.dis_vid.params))]
        assert max(diffs) > 0
        # the R1 term is part of the reported D loss
        assert float(m1["dis_vid_loss"]) != float(m0["dis_vid_loss"])

    def test_fused_real_fake_step(self):
        """fused_real_fake=True: one concatenated 2B discriminator pass.
        Same update structure, finite losses, parameters actually move; BN
        statistics advance (over the combined batch — the documented delta
        from the reference's separate real/fake passes)."""
        trainer = _tiny_trainer(d_iters=1, fused_real_fake=True)
        state = trainer.init_state(jax.random.PRNGKey(0))
        images, videos = _fake_batches(jax.random.PRNGKey(1), d_iters=1)
        new_state, metrics = trainer.train_step(state, images, videos,
                                                jax.random.PRNGKey(2))
        for v in metrics.values():
            assert np.isfinite(float(v))
        moved = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            state.dis_vid.params, new_state.dis_vid.params)
        assert max(jax.tree.leaves(moved)) > 0
        stats_moved = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            state.dis_vid.batch_stats, new_state.dis_vid.batch_stats)
        assert max(jax.tree.leaves(stats_moved)) > 0

    def test_fused_real_fake_with_gp(self):
        """The WGAN-GP path composes with the fused pass (the penalty's
        eval-mode apply is untouched by the fusion)."""
        trainer = _tiny_trainer(loss="wasserstein", gp_weight=10.0,
                                d_iters=1, fused_real_fake=True)
        state = trainer.init_state(jax.random.PRNGKey(0))
        images, videos = _fake_batches(jax.random.PRNGKey(1), d_iters=1)
        _, metrics = trainer.train_step(state, images, videos,
                                        jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["dis_vid_loss"]))

    def test_unknown_loss_rejected(self):
        with pytest.raises(ValueError):
            _tiny_trainer(loss="nonsense")

    def test_ada_requires_diffaug_policy(self):
        with pytest.raises(ValueError, match="diffaug"):
            _tiny_trainer(ada_target=0.6)

    def test_ada_trainer_step(self):
        """ADA on (ada_target > 0 + a diffaug policy): state.ada starts at
        p=0, the controller state is threaded through train_step, and the
        committed state matches the reported metrics (the G update must judge
        through exactly the p the D updates trained with)."""
        trainer = _tiny_trainer(d_iters=2, diffaug="color,translation,cutout",
                                ada_target=0.6, ada_step=0.05)
        state = trainer.init_state(jax.random.PRNGKey(0))
        assert state.ada is not None
        assert float(state.ada["p_img"]) == 0.0
        assert float(state.ada["p_vid"]) == 0.0
        images, videos = _fake_batches(jax.random.PRNGKey(1))
        state, metrics = trainer.jitted_step(donate=False)(
            state, images, videos, jax.random.PRNGKey(2))
        for name in ("rt_img", "rt_vid", "ada_p_img", "ada_p_vid"):
            assert name in metrics and np.isfinite(float(metrics[name])), name
        for d in ("img", "vid"):
            p = float(state.ada[f"p_{d}"])
            assert 0.0 <= p <= trainer.ada_p_max
            np.testing.assert_allclose(p, float(metrics[f"ada_p_{d}"]))
            # rt in [-1, 1] by construction (mean of signs)
            assert -1.0 <= float(metrics[f"rt_{d}"]) <= 1.0
        # an untrained D separates nothing perfectly, but with ada_step large
        # enough the controller must have moved at least one p off 0 OR both
        # rt's sat below target (either is a live controller)
        moved = any(float(state.ada[f"p_{d}"]) != 0.0 for d in ("img", "vid"))
        sat_low = all(float(metrics[f"rt_{d}"]) < 0.6 for d in ("img", "vid"))
        assert moved or sat_low

    def test_ada_disabled_has_no_controller_state(self):
        trainer = _tiny_trainer(diffaug="color")
        state = trainer.init_state(jax.random.PRNGKey(0))
        assert state.ada is None
        images, videos = _fake_batches(jax.random.PRNGKey(1))
        _, metrics = trainer.train_step(state, images, videos,
                                        jax.random.PRNGKey(2))
        assert "ada_p_img" not in metrics and "rt_img" not in metrics

    def test_ada_checkpoint_restores_through_old_template(self, tmp_path):
        """ADVICE r3 (low): GANState grew the optional `ada` slot; restores
        must reconcile template/checkpoint mismatches in BOTH directions —
        evaluate.py reading an ADA-trained checkpoint with a default config,
        and an ada_target>0 run resuming from a pre-ADA checkpoint (the
        documented tunnel-death recovery path)."""
        from ganode_tpu.utils.checkpoint import CheckpointManager

        ada_trainer = _tiny_trainer(d_iters=1,
                                    diffaug="color,translation,cutout",
                                    ada_target=0.6, ada_step=0.05)
        state = ada_trainer.init_state(jax.random.PRNGKey(0))
        images, videos = _fake_batches(jax.random.PRNGKey(1), d_iters=1)
        state, _ = ada_trainer.train_step(state, images, videos,
                                          jax.random.PRNGKey(2))
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(1, state, wait=True)

        # ADA checkpoint read through a default (no-ADA) template
        plain = _tiny_trainer(d_iters=1)
        restored = mgr.restore(plain.init_state(jax.random.PRNGKey(9)))
        assert restored.ada is not None
        for k in ("p_img", "p_vid"):
            np.testing.assert_array_equal(np.asarray(restored.ada[k]),
                                          np.asarray(state.ada[k]))
        mgr.close()

        # reverse: pre-ADA checkpoint resumed under an ADA config — restore
        # succeeds and the controller starts fresh at p=0
        plain_state = plain.init_state(jax.random.PRNGKey(3))
        mgr2 = CheckpointManager(str(tmp_path / "ckpt2"))
        mgr2.save(1, plain_state, wait=True)
        restored2 = mgr2.restore(
            ada_trainer.init_state(jax.random.PRNGKey(9)))
        assert restored2.ada is not None
        assert float(restored2.ada["p_img"]) == 0.0
        assert float(restored2.ada["p_vid"]) == 0.0
        # the non-optional slots really came from the checkpoint
        for a, b in zip(jax.tree.leaves(plain_state.gen.params),
                        jax.tree.leaves(restored2.gen.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        mgr2.close()


# --------------------------------------------------------- feature matrix
# VERDICT r3 #2: the r3 snapshot regression got in because no test composed
# the trainer's feature flags through one train_step call. Every entry runs
# ONE tiny step (gru motion, T=6, ngf=4 — no solver, CPU-fast) and asserts
# finite metrics + advanced step; the two all-on rows exercise every flag
# interaction (incl. ADA x fused, penalty x diffaug, noise x ema) at once.
_MATRIX = {
    "all_off": {},
    "diffaug": dict(diffaug="color,translation,cutout"),
    "ada": dict(diffaug="color,translation,cutout", ada_target=0.6,
                ada_step=0.05),
    "wgan_gp": dict(loss="wasserstein", gp_weight=10.0),
    "r1": dict(r1_weight=10.0),
    "ema": dict(ema_decay=0.9),
    "fused": dict(fused_real_fake=True),
    "param_noise": dict(param_noise_sigma=1e-4),
    "all_on_bce": dict(diffaug="color,translation,cutout", ada_target=0.6,
                       ada_step=0.05, r1_weight=10.0, ema_decay=0.9,
                       fused_real_fake=True, param_noise_sigma=1e-4),
    "all_on_wgan": dict(loss="wasserstein", gp_weight=10.0,
                        diffaug="color,translation,cutout", ada_target=0.6,
                        ada_step=0.05, ema_decay=0.9, fused_real_fake=True,
                        param_noise_sigma=1e-4),
}

_MB, _MT, _MNGF = 2, 6, 4  # VideoDiscriminator(ksize=2) needs T >= 6


def _matrix_trainer(**kwargs):
    gen = make_generator("gru", n_channels=1, trunk="mnist28", video_length=_MT,
                         dim_z_content=6, dim_z_motion=4, ngf=_MNGF)
    defaults = dict(batch_size=_MB, d_iters=1)
    defaults.update(kwargs)
    return GANTrainer(gen=gen,
                      dis_img=PatchImageDiscriminator(ndf=_MNGF),
                      dis_vid=VideoDiscriminator(ksize=2, ndf=_MNGF),
                      **defaults)


def _matrix_batches():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    images = jax.random.uniform(k1, (1, _MB, 28, 28, 1), minval=-1, maxval=1)
    videos = jax.random.uniform(k2, (1, _MB, _MT, 28, 28, 1),
                                minval=-1, maxval=1)
    return images, videos


@pytest.mark.parametrize("name", sorted(_MATRIX))
def test_feature_matrix_smoke(name):
    trainer = _matrix_trainer(**_MATRIX[name])
    state = trainer.init_state(jax.random.PRNGKey(0))
    images, videos = _matrix_batches()
    new_state, metrics = trainer.train_step(state, images, videos,
                                            jax.random.PRNGKey(2))
    for mname, v in metrics.items():
        assert np.isfinite(float(v)), f"{name}: {mname}"
    assert int(new_state.step) == 1
    moved = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(state.gen.params),
                        jax.tree.leaves(new_state.gen.params)))
    assert moved, name


def test_feature_matrix_all_off_matches_defaults_bitwise():
    """Explicitly-off flags must reproduce the default trainer's stream
    EXACTLY (jit-vs-jit): feature plumbing (ADA key threading, aug_p
    arguments) may not perturb the baseline path. This is the pin that would
    have caught the r3 aug_p/key-stream drift class."""
    explicit = _matrix_trainer(diffaug="", ada_target=0.0, gp_weight=0.0,
                               r1_weight=0.0, ema_decay=0.0,
                               fused_real_fake=False, param_noise_sigma=0.0)
    default = _matrix_trainer()
    images, videos = _matrix_batches()
    s_e = explicit.init_state(jax.random.PRNGKey(0))
    s_d = default.init_state(jax.random.PRNGKey(0))
    s_e, m_e = explicit.jitted_step(donate=False)(
        s_e, images, videos, jax.random.PRNGKey(2))
    s_d, m_d = default.jitted_step(donate=False)(
        s_d, images, videos, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(m_e["gen_loss"]),
                                  np.asarray(m_d["gen_loss"]))
    for a, b in zip(jax.tree.leaves(s_e.gen.params),
                    jax.tree.leaves(s_d.gen.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_categorical_training_config():
    """End-to-end step with dim_z_category > 0 and the categorical video
    discriminator (the reference's category-conditional mode,
    models/mocogan.py:167-182,231-247)."""
    from ganode_tpu.models import CategoricalVideoDiscriminator

    gen = make_generator("gru", n_channels=1, trunk="mnist28", video_length=8,
                         dim_z_content=10, dim_z_category=4, dim_z_motion=4,
                         ngf=NGF)
    k = jax.random.PRNGKey(0)
    variables = gen.init({"params": k, "sample": k}, 2)
    (videos, labels), _ = gen.apply(
        variables, 4, method="sample_videos",
        rngs={"sample": k}, mutable=["batch_stats"])
    assert labels.shape == (4,)

    disc = CategoricalVideoDiscriminator(dim_categorical=4, ksize=2, ndf=NGF)
    dvars = disc.init(k, videos)
    (realness, categ), _ = disc.apply(dvars, videos, mutable=["batch_stats"])
    assert categ.shape[-1] == 4
    # category cross-entropy against the generator's sampled labels is finite
    import optax
    logits = categ.reshape(categ.shape[0], -1, 4).mean(axis=1)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    assert np.isfinite(float(ce))


def test_device_data_step():
    """Batches gathered on device from a resident dataset must reproduce the
    training semantics (finite losses, param updates, key determinism)."""
    from ganode_tpu.train.runner import make_device_data_step

    trainer = _tiny_trainer(d_iters=2)
    state = trainer.init_state(jax.random.PRNGKey(0))
    videos = jax.random.uniform(jax.random.PRNGKey(1), (20, T, 28, 28, 1),
                                minval=-1, maxval=1)
    step = make_device_data_step(trainer, d_iters=2, video_length=T)
    s1, m1 = step(state, videos, jax.random.PRNGKey(2))
    assert int(s1.step) == 1
    assert all(np.isfinite(float(v)) for v in m1.values())
    # key-deterministic (donation consumed `state`, so re-init)
    state_b = _tiny_trainer(d_iters=2).init_state(jax.random.PRNGKey(0))
    s2, m2 = step(state_b, videos, jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(m1["gen_loss"]), float(m2["gen_loss"]),
                               rtol=1e-5)


def test_sn_discriminator_spectral_state_threads_through_training():
    """A spectrally-normalized discriminator's power-iteration state must
    advance through the jitted alternating step (latent-bug regression test)."""
    from ganode_tpu.models import SNImageDiscriminator

    gen = make_generator("gru", n_channels=1, trunk="mnist28", video_length=T,
                         dim_z_content=10, dim_z_motion=4, ngf=NGF)
    trainer = GANTrainer(
        gen=gen,
        dis_img=SNImageDiscriminator(ndf=NGF),
        dis_vid=VideoDiscriminator(ksize=2, ndf=NGF),
        batch_size=B, d_iters=1, loss="wasserstein")
    state = trainer.init_state(jax.random.PRNGKey(0))
    assert state.dis_img.spectral is not None
    images, videos = _fake_batches(jax.random.PRNGKey(1), d_iters=1)
    new_state, metrics = trainer.train_step(state, images, videos,
                                            jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["dis_img_loss"]))
    changed = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(state.dis_img.spectral),
                        jax.tree.leaves(new_state.dis_img.spectral)))
    assert changed


def test_wgan_gp_with_sn_critics_trains():
    """The north-star critic stack: WGAN-GP with spectral-norm, BatchNorm-free
    image AND video critics. One full step must produce finite losses and
    advance both critics' power-iteration state."""
    from ganode_tpu.models import SNImageDiscriminator, SNVideoDiscriminator

    gen = make_generator("ode", n_channels=1, trunk="mnist28", video_length=T,
                         dim_z_content=10, dim_z_motion=4, ngf=NGF)
    trainer = GANTrainer(
        gen=gen,
        dis_img=SNImageDiscriminator(ndf=NGF),
        dis_vid=SNVideoDiscriminator(ksize=2, ndf=NGF),
        batch_size=B, d_iters=1, loss="wasserstein", gp_weight=10.0)
    state = trainer.init_state(jax.random.PRNGKey(0))
    assert state.dis_img.spectral is not None
    assert state.dis_vid.spectral is not None
    images, videos = _fake_batches(jax.random.PRNGKey(1), d_iters=1)
    new_state, metrics = trainer.train_step(state, images, videos,
                                            jax.random.PRNGKey(2))
    for name, v in metrics.items():
        assert np.isfinite(float(v)), name
    for net in ("dis_img", "dis_vid"):
        changed = any(
            not np.allclose(a, b)
            for a, b in zip(jax.tree.leaves(getattr(state, net).spectral),
                            jax.tree.leaves(getattr(new_state, net).spectral)))
        assert changed, net


def test_gp_with_noise_discriminator():
    """gp_weight > 0 together with use_noise=True critics (the reference's UCF
    discriminator config) must not crash: the GP apply needs a 'noise' rng."""
    gen = make_generator("gru", n_channels=1, trunk="mnist28", video_length=T,
                         dim_z_content=10, dim_z_motion=4, ngf=NGF)
    trainer = GANTrainer(
        gen=gen,
        dis_img=PatchImageDiscriminator(ndf=NGF, use_noise=True,
                                        noise_sigma=0.1),
        dis_vid=VideoDiscriminator(ksize=2, ndf=NGF, use_noise=True,
                                   noise_sigma=0.1),
        batch_size=B, d_iters=1, loss="wasserstein", gp_weight=10.0)
    state = trainer.init_state(jax.random.PRNGKey(0))
    images, videos = _fake_batches(jax.random.PRNGKey(1), d_iters=1)
    _, metrics = trainer.train_step(state, images, videos,
                                    jax.random.PRNGKey(2))
    for name, v in metrics.items():
        assert np.isfinite(float(v)), name
