"""Infra tests: checkpoint round trip, GIF grids, metrics, configs, runner smoke."""
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganode_tpu.utils.config import CONFIGS, get_config
from ganode_tpu.utils.gifs import save_sample_grid, video_grid, write_gif
from ganode_tpu.utils.metrics import MetricsLogger


class TestConfig:
    def test_all_reference_variants_present(self):
        # one config per README variant + UCF + the new 128 config (SURVEY.md §5.6)
        for name in ("mnist_ode", "mnist_sde", "mnist_cde", "mnist_ode_rnn",
                     "mnist_gru", "mnist_ode_wgan", "mnist_ode_noise",
                     "ucf_ode", "ucf_wgan_gp_128"):
            assert name in CONFIGS

    def test_reference_hyperparameters(self):
        c = get_config("mnist_ode")
        assert (c.steps, c.batch_size, c.d_iters) == (100_000, 32, 2)
        assert (c.lr, c.betas, c.weight_decay) == (2e-4, (0.5, 0.999), 1e-5)
        assert c.video_disc_ksize == 2 and c.trunk == "mnist28"

    def test_wgan_config(self):
        c = get_config("mnist_ode_wgan")
        assert c.loss == "wasserstein"
        assert c.param_noise_sigma == 1e-4
        assert c.digits == (3,)

    def test_ucf_config(self):
        c = get_config("ucf_ode")
        assert c.trunk == "dcgan64" and c.n_channels == 3
        assert c.video_disc_ksize == 4
        assert c.sample_every == 100  # reference ucf cadence

    def test_northstar_config(self):
        c = get_config("ucf_wgan_gp_128")
        assert c.trunk == "dcgan128" and c.video_length == 32
        assert c.gp_weight > 0
        # GP needs BatchNorm-free critics — both must be spectral-norm
        assert c.image_disc == "sn" and c.video_disc == "sn"

    def test_northstar_config_builds_sn_critics(self):
        from ganode_tpu.models import SNImageDiscriminator, SNVideoDiscriminator
        from ganode_tpu.train.runner import build_trainer

        c = get_config("ucf_wgan_gp_128", ngf=8, ndf=8, batch_size=2)
        tr = build_trainer(c)
        assert isinstance(tr.dis_img, SNImageDiscriminator)
        assert isinstance(tr.dis_vid, SNVideoDiscriminator)

    def test_wgan_config_digit_filter_applies(self, tmp_path):
        """mnist_ode_wgan on a MIXED-digit file must serve 3s only — the
        reference's pre-filtered rot-mnist-3s.mat semantics
        (mnist_moco_ode_wgan.py:30), applied at load time."""
        from ganode_tpu.data import build_rotmnist
        from ganode_tpu.train.runner import build_data

        rng = np.random.RandomState(0)
        imgs = rng.rand(30, 28, 28).astype(np.float32) - 0.5
        labels = np.arange(30) % 10
        path = str(tmp_path / "mixed.npz")
        build_rotmnist(path, imgs, labels)
        cfg = get_config("mnist_ode_wgan", data_path=path, batch_size=4)
        img_sampler, vid_sampler = build_data(cfg)
        _, y_img = img_sampler.sample(jax.random.PRNGKey(0))
        _, y_vid = vid_sampler.sample(jax.random.PRNGKey(1))
        assert np.all(y_img == 3) and np.all(y_vid == 3)

    def test_override_and_unknown(self):
        c = get_config("mnist_ode", batch_size=8)
        assert c.batch_size == 8
        with pytest.raises(ValueError):
            get_config("nope")

    def test_overrides_from_strings(self):
        """Typed CLI overrides (scripts/train.py --set): coercion follows the
        dataclass field annotations."""
        from ganode_tpu.utils.config import overrides_from_strings

        out = overrides_from_strings([
            "ngf=8", "ema_decay=0.999", "tensorboard=false", "loss=hinge",
            "betas=0.0,0.9", "digits=3", "motion_method=dopri5",
            "sde_dt=0.025", "mesh=data=4,seq=2",
        ])
        assert out == {
            "ngf": 8, "ema_decay": 0.999, "tensorboard": False,
            "loss": "hinge", "betas": (0.0, 0.9), "digits": (3,),
            "motion_method": "dopri5", "sde_dt": 0.025,
            "mesh": "data=4,seq=2",
        }
        assert overrides_from_strings(["digits=none"]) == {"digits": None}
        # scientific notation on Optional numeric fields (sde_dt's own
        # docstring spells its default 2.5e-2)
        assert overrides_from_strings(["sde_dt=1e-3"]) == {"sde_dt": 1e-3}
        assert overrides_from_strings(["tensorboard=0"]) == {"tensorboard": False}
        c = get_config("mnist_ode", **out)
        assert c.ngf == 8 and c.betas == (0.0, 0.9)
        with pytest.raises(ValueError):
            overrides_from_strings(["nosuchfield=1"])
        with pytest.raises(ValueError):
            overrides_from_strings(["ngf8"])
        with pytest.raises(ValueError):
            # a typo'd bool must error, not silently parse as False
            overrides_from_strings(["tensorboard=ture"])


class TestGifs:
    def test_video_grid_layout(self):
        videos = np.zeros((4, 3, 8, 8, 1), np.float32)
        videos[0] += 1.0  # top-left cell white
        grid = video_grid(videos, n=2)
        assert grid.shape == (3, 16, 16, 1)
        assert grid[0, 0, 0, 0] == 255
        assert grid[0, 15, 15, 0] == 127  # (0+1)/2*255 for the zero cells

    def test_write_gif(self, tmp_path):
        frames = np.random.randint(0, 255, (5, 16, 16, 3), np.uint8)
        path = write_gif(str(tmp_path / "t.gif"), frames)
        assert os.path.getsize(path) > 0

    def test_save_sample_grid_end_to_end(self, tmp_path):
        videos = np.random.uniform(-1, 1, (9, 4, 8, 8, 1)).astype(np.float32)
        path = save_sample_grid(str(tmp_path / "grid.gif"), videos, n=3)
        from PIL import Image
        im = Image.open(path)
        assert im.size == (24, 24)
        assert im.n_frames == 4


class TestMetrics:
    def test_jsonl_roundtrip(self, tmp_path):
        path = str(tmp_path / "m.jsonl")
        logger = MetricsLogger(path, print_every=0)
        logger.log(0, {"gen_loss": jnp.asarray(1.5)})
        logger.log(100, {"gen_loss": 1.2}, extra={"clips_per_sec": 100.0})
        logger.close()
        lines = [json.loads(l) for l in open(path)]
        assert lines[0]["gen_loss"] == 1.5
        assert lines[1]["clips_per_sec"] == 100.0


class TestTensorBoard:
    def test_events_readable_by_tensorboard(self, tmp_path):
        """The hand-rolled event encoding must be valid for the real consumer:
        read the file back with the installed tensorboard's own loader."""
        from ganode_tpu.utils.tb import EventWriter

        logdir = str(tmp_path / "tb")
        w = EventWriter(logdir)
        w.add_scalar("train/gen_loss", 1.5, step=0)
        w.add_scalars({"train/gen_loss": 1.25, "perf/clips_per_sec": 900.0},
                      step=100)
        w.close()

        loader = pytest.importorskip(
            "tensorboard.backend.event_processing.event_file_loader")
        events = list(loader.EventFileLoader(w.path).Load())
        assert events[0].file_version == "brain.Event:2"
        scalars = {}
        for ev in events[1:]:
            for v in ev.summary.value:
                # modern loaders auto-migrate simple_value -> scalar tensor
                val = (v.tensor.float_val[0] if v.tensor.float_val
                       else v.simple_value)
                scalars[(ev.step, v.tag)] = val
        assert scalars[(0, "train/gen_loss")] == 1.5
        assert scalars[(100, "train/gen_loss")] == 1.25
        assert scalars[(100, "perf/clips_per_sec")] == 900.0

    def test_run_training_writes_events(self, tmp_path):
        from ganode_tpu.train.runner import run_training
        from ganode_tpu.utils.config import get_config

        config = get_config("mnist_ode", batch_size=2)
        config = config.__class__(**{
            **config.__dict__, "video_length": 8, "ngf": 8, "ndf": 8,
            "dim_z_content": 4, "dim_z_motion": 4, "d_iters": 1,
            "sample_every": 0, "checkpoint_every": 0, "log_every": 1,
        })
        workdir = str(tmp_path / "run")
        run_training(config, workdir, steps=1, synthetic=True, jit=False)
        tb_dir = os.path.join(workdir, "tb")
        files = os.listdir(tb_dir)
        assert any(f.startswith("events.out.tfevents.") for f in files)
        loader = pytest.importorskip(
            "tensorboard.backend.event_processing.event_file_loader")
        path = os.path.join(tb_dir, sorted(files)[0])
        tags = {v.tag for ev in loader.EventFileLoader(path).Load()
                for v in ev.summary.value}
        assert "train/gen_loss" in tags


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        from ganode_tpu.utils.checkpoint import CheckpointManager
        from ganode_tpu.models import make_generator, PatchImageDiscriminator, VideoDiscriminator
        from ganode_tpu.train import GANTrainer

        gen = make_generator("ode", n_channels=1, trunk="mnist28",
                             video_length=8, dim_z_content=4, dim_z_motion=4,
                             ngf=8)
        tr = GANTrainer(gen=gen, dis_img=PatchImageDiscriminator(ndf=8),
                        dis_vid=VideoDiscriminator(ksize=2, ndf=8),
                        batch_size=2, d_iters=1)
        state = tr.init_state(jax.random.PRNGKey(0))

        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        assert mgr.latest_step() is None
        mgr.save(0, state, wait=True)
        assert mgr.latest_step() == 0

        restored = mgr.restore(state)
        for a, b in zip(jax.tree.leaves(state.gen.params),
                        jax.tree.leaves(restored.gen.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        mgr.close()

    def test_resume_is_bit_deterministic(self, tmp_path):
        """Interrupted-and-resumed training equals uninterrupted training
        bit-for-bit: the PRNG key lives in the checkpointed state and step
        keys/batches are pure functions of the step index (the reference's
        global-RNG resume could not make this guarantee — SURVEY §5.4)."""
        from ganode_tpu.models import (
            PatchImageDiscriminator, VideoDiscriminator, make_generator)
        from ganode_tpu.train import GANTrainer
        from ganode_tpu.utils.checkpoint import CheckpointManager

        def make_trainer():
            gen = make_generator("ode", n_channels=1, trunk="mnist28",
                                 video_length=8, dim_z_content=4,
                                 dim_z_motion=4, ngf=8)
            return GANTrainer(gen=gen,
                              dis_img=PatchImageDiscriminator(ndf=8),
                              dis_vid=VideoDiscriminator(ksize=2, ndf=8),
                              batch_size=2, d_iters=1)

        base = jax.random.PRNGKey(7)

        def batch_for(i):
            k1, k2 = jax.random.split(jax.random.fold_in(base, 1000 + i))
            return (jax.random.uniform(k1, (1, 2, 28, 28, 1), minval=-1,
                                       maxval=1),
                    jax.random.uniform(k2, (1, 2, 8, 28, 28, 1), minval=-1,
                                       maxval=1))

        def advance(trainer, state, start, n):
            for i in range(start, start + n):
                images, videos = batch_for(i)
                state, _ = trainer.train_step(state, images, videos,
                                              jax.random.fold_in(base, i))
            return state

        # uninterrupted: 4 steps
        tr = make_trainer()
        straight = advance(tr, tr.init_state(jax.random.PRNGKey(0)), 0, 4)

        # interrupted: 2 steps, checkpoint, fresh process-equivalent restore
        tr1 = make_trainer()
        half = advance(tr1, tr1.init_state(jax.random.PRNGKey(0)), 0, 2)
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(2, half, wait=True)
        mgr.close()

        tr2 = make_trainer()
        template = tr2.init_state(jax.random.PRNGKey(33))  # different seed
        mgr2 = CheckpointManager(str(tmp_path / "ckpt"))
        restored = mgr2.restore(template)
        mgr2.close()
        resumed = advance(tr2, restored, int(restored.step), 2)

        for a, b in zip(jax.tree.leaves(straight.gen.params),
                        jax.tree.leaves(resumed.gen.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(straight.dis_vid.params),
                        jax.tree.leaves(resumed.dis_vid.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(resumed.step) == 4

    def test_restore_missing_raises(self, tmp_path):
        from ganode_tpu.utils.checkpoint import CheckpointManager
        mgr = CheckpointManager(str(tmp_path / "empty"))
        with pytest.raises(FileNotFoundError):
            mgr.restore({"x": jnp.zeros(2)})

    def test_relocated_checkpoint_restores_bitwise(self, tmp_path):
        """A step directory copied to a different checkpoint root restores
        bit-identically — the durable-storage round trip ephemeral workers
        rely on (docs/OPERATIONS.md: copy latest step to durable storage,
        copy back under a fresh workdir, --resume)."""
        import shutil

        from ganode_tpu.models import (
            PatchImageDiscriminator, VideoDiscriminator, make_generator)
        from ganode_tpu.train import GANTrainer
        from ganode_tpu.utils.checkpoint import CheckpointManager

        gen = make_generator("ode", n_channels=1, trunk="mnist28",
                             video_length=8, dim_z_content=4, dim_z_motion=4,
                             ngf=8)
        tr = GANTrainer(gen=gen, dis_img=PatchImageDiscriminator(ndf=8),
                        dis_vid=VideoDiscriminator(ksize=2, ndf=8),
                        batch_size=2, d_iters=1)
        state = tr.init_state(jax.random.PRNGKey(5))

        mgr = CheckpointManager(str(tmp_path / "worker" / "checkpoints"))
        mgr.save(3, state, wait=True)
        mgr.close()

        # durable copy -> fresh worker's workdir (different absolute path)
        shutil.copytree(tmp_path / "worker" / "checkpoints" / "3",
                        tmp_path / "fresh" / "checkpoints" / "3")

        mgr2 = CheckpointManager(str(tmp_path / "fresh" / "checkpoints"))
        assert mgr2.latest_step() == 3
        restored = mgr2.restore(tr.init_state(jax.random.PRNGKey(11)))
        mgr2.close()
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestRunner:
    def test_two_step_synthetic_mnist_run(self, tmp_path):
        """The reference's dry_run smoke mode, end to end: data -> steps ->
        metrics.jsonl -> sample GIF -> checkpoint."""
        from ganode_tpu.train.runner import run_training
        from ganode_tpu.utils.config import get_config

        config = get_config(
            "mnist_ode", batch_size=2,
        )
        config = config.__class__(**{
            **config.__dict__, "video_length": 8, "ngf": 8, "ndf": 8,
            "dim_z_content": 4, "dim_z_motion": 4, "d_iters": 1,
            "sample_every": 2, "checkpoint_every": 2, "log_every": 1,
        })
        workdir = str(tmp_path / "run")
        state, metrics = run_training(config, workdir, steps=2, synthetic=True,
                                      jit=False)
        assert int(state.step) == 2
        assert os.path.exists(os.path.join(workdir, "metrics.jsonl"))
        assert os.path.exists(os.path.join(workdir, "samples",
                                           "gensamples_id0.gif"))
        assert all(np.isfinite(v) for v in metrics.values())

    def test_run_training_over_mesh(self, tmp_path):
        """config.mesh makes the full runner (data -> step -> checkpoint)
        GSPMD-parallel: the same loop on a 'data=4,seq=2' mesh must produce
        the same losses as the single-device run (params replicated, clips
        sharded over batch AND frame axes)."""
        from ganode_tpu.train.runner import run_training
        from ganode_tpu.utils.config import get_config

        base = get_config("mnist_ode", batch_size=4)
        base = base.__class__(**{
            **base.__dict__, "video_length": 8, "ngf": 8, "ndf": 8,
            "dim_z_content": 4, "dim_z_motion": 4, "d_iters": 1,
            "sample_every": 0, "checkpoint_every": 2, "log_every": 1,
        })
        _, m1 = run_training(base, str(tmp_path / "single"), steps=2,
                             synthetic=True)
        meshed = base.__class__(**{**base.__dict__, "mesh": "data=4,seq=2"})
        state, m8 = run_training(meshed, str(tmp_path / "mesh"), steps=2,
                                 synthetic=True)
        assert int(state.step) == 2
        for k in m1:
            np.testing.assert_allclose(m1[k], m8[k], rtol=1e-4, err_msg=k)

    @staticmethod
    def _tiny_config():
        config = get_config("mnist_ode", batch_size=2)
        return config.__class__(**{
            **config.__dict__, "video_length": 8, "ngf": 8, "ndf": 8,
            "dim_z_content": 4, "dim_z_motion": 4, "d_iters": 1,
            "sample_every": 0, "checkpoint_every": 0, "log_every": 1,
        })

    def test_graceful_preemption_checkpoints_and_resumes(self, tmp_path,
                                                         monkeypatch):
        """SIGTERM mid-run (what a preempted TPU-pod worker receives) finishes
        the in-flight step, checkpoints, and returns cleanly with a
        "preempted" marker; rerunning the same command with resume=True
        completes the remaining steps BIT-IDENTICALLY to an uninterrupted run
        — the preemption-safe training story of SURVEY §5.3 (the reference
        resumed long runs by hand-editing a flag, mnist_moco_ode.py:92-103)."""
        import signal

        from ganode_tpu.train import runner as runner_mod

        config = self._tiny_config()
        full_state, _ = runner_mod.run_training(
            config, str(tmp_path / "full"), steps=4, synthetic=True, jit=False)

        orig = runner_mod._stack_d_batches
        calls = {"n": 0}

        def preempting(sampler, key, d_iters):
            calls["n"] += 1
            if calls["n"] == 3:  # two calls/step: mid data-fetch of step 1
                signal.raise_signal(signal.SIGTERM)
            return orig(sampler, key, d_iters)

        monkeypatch.setattr(runner_mod, "_stack_d_batches", preempting)
        wd = str(tmp_path / "pre")
        state, metrics = runner_mod.run_training(
            config, wd, steps=4, synthetic=True, jit=False)
        assert metrics["preempted"] == 2.0  # step 1 completed, then stopped
        assert int(state.step) == 2
        monkeypatch.setattr(runner_mod, "_stack_d_batches", orig)

        resumed, m2 = runner_mod.run_training(
            config, wd, steps=4, synthetic=True, resume=True, jit=False)
        assert "preempted" not in m2
        assert int(resumed.step) == 4
        for a, b in zip(jax.tree.leaves(full_state.gen.params),
                        jax.tree.leaves(resumed.gen.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_stop_file_halts_run(self, tmp_path):
        """`touch <workdir>/STOP` ends the run at the next log boundary with a
        checkpoint — the operator-facing half of graceful stop."""
        from ganode_tpu.train.runner import run_training

        wd = tmp_path / "run"
        wd.mkdir()
        (wd / "STOP").touch()
        state, metrics = run_training(self._tiny_config(), str(wd), steps=50,
                                      synthetic=True, jit=False)
        assert metrics["preempted"] == 1.0
        assert int(state.step) == 1
        # the STOP file was honored and consumed: a resumed run must CONTINUE
        # (an un-deleted STOP would re-preempt every resume at its first log
        # boundary, capping progress at log_every steps per process launch)
        assert not (wd / "STOP").exists()
        resumed, m2 = run_training(self._tiny_config(), str(wd), steps=3,
                                   synthetic=True, resume=True, jit=False)
        assert "preempted" not in m2
        assert int(resumed.step) == 3

    def test_missing_dataset_raises(self, tmp_path):
        from ganode_tpu.train.runner import build_data
        from ganode_tpu.utils.config import get_config
        config = get_config("mnist_ode", data_path=str(tmp_path / "absent.npz"))
        with pytest.raises(FileNotFoundError):
            build_data(config, synthetic=False)


class TestParallel:
    def test_mesh_and_sharding(self):
        from ganode_tpu.parallel import data_sharding, make_mesh, shard_batch

        assert len(jax.devices()) == 8  # conftest virtual devices
        mesh = make_mesh(8, ("data",))
        batch = np.zeros((2, 16, 4, 4, 1), np.float32)
        sharded = shard_batch(batch, mesh, batch_axis=1)
        assert sharded.sharding.spec[1] == "data"

    def test_dp_step_matches_single_device(self):
        """The same jitted step on a 1-device and an 8-device mesh must agree —
        GSPMD parallelization is semantics-preserving."""
        from ganode_tpu.models import (
            PatchImageDiscriminator, VideoDiscriminator, make_generator)
        from ganode_tpu.parallel import make_mesh, make_parallel_step
        from ganode_tpu.train import GANTrainer

        T = 8
        gen = make_generator("ode", n_channels=1, trunk="mnist28",
                             video_length=T, dim_z_content=4, dim_z_motion=4,
                             ngf=8)
        tr = GANTrainer(gen=gen, dis_img=PatchImageDiscriminator(ndf=8),
                        dis_vid=VideoDiscriminator(ksize=2, ndf=8),
                        batch_size=16, d_iters=1)
        state = tr.init_state(jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        images = rng.uniform(-1, 1, (1, 16, 28, 28, 1)).astype(np.float32)
        videos = rng.uniform(-1, 1, (1, 16, T, 28, 28, 1)).astype(np.float32)
        key = jax.random.PRNGKey(1)

        # single device
        s1, m1 = jax.jit(tr.train_step)(state, images, videos, key)

        # 8-device DP
        mesh = make_mesh(8, ("data",))
        step, place_state, place_batch = make_parallel_step(tr, mesh, donate=False)
        st = place_state(state)
        im, vi = place_batch(images, videos)
        s8, m8 = step(st, im, vi, key)

        np.testing.assert_allclose(float(m1["gen_loss"]), float(m8["gen_loss"]),
                                   rtol=1e-4)
        for a, b in zip(jax.tree.leaves(s1.gen.params),
                        jax.tree.leaves(s8.gen.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-5)

    def test_dp_wgan_gp_sn_ada_step_matches_single_device(self):
        """The north-star stabilized path over the mesh (VERDICT r4 #4): the
        WGAN-GP step — per-sample gradient penalty (double backward through
        the critic), spectrally-normalized critics (the 'spectral'
        power-iteration collection threaded through the step), diffaug+ADA
        keyed gates, and generator EMA — must be GSPMD-safe: the same jitted
        step on a 1-device and an 8-device DP mesh agrees on losses, ADA
        controller state, params, spectral vectors, and EMA weights. This is
        the tiny analogue of `utils/config.py::ucf_wgan_gp_128` (reference
        failure mode: /root/reference/README.md:16)."""
        from ganode_tpu.models import (
            SNImageDiscriminator, SNVideoDiscriminator, make_generator)
        from ganode_tpu.parallel import make_mesh, make_parallel_step
        from ganode_tpu.train import GANTrainer

        T = 8
        gen = make_generator("ode", n_channels=1, trunk="mnist28",
                             video_length=T, dim_z_content=4, dim_z_motion=4,
                             ngf=8)
        tr = GANTrainer(gen=gen, dis_img=SNImageDiscriminator(ndf=8),
                        dis_vid=SNVideoDiscriminator(ksize=2, ndf=8),
                        batch_size=16, d_iters=2, loss="wasserstein",
                        gp_weight=10.0, ema_decay=0.999,
                        diffaug="color,translation,cutout", ada_target=0.6)
        state = tr.init_state(jax.random.PRNGKey(0))
        assert state.dis_img.spectral is not None  # SN critics in play
        assert state.ada is not None               # ADA controller in play
        rng = np.random.RandomState(0)
        images = rng.uniform(-1, 1, (2, 16, 28, 28, 1)).astype(np.float32)
        videos = rng.uniform(-1, 1, (2, 16, T, 28, 28, 1)).astype(np.float32)
        key = jax.random.PRNGKey(1)

        # single device
        s1, m1 = jax.jit(tr.train_step)(state, images, videos, key)

        # 8-device DP
        mesh = make_mesh(8, ("data",))
        step, place_state, place_batch = make_parallel_step(tr, mesh,
                                                            donate=False)
        st = place_state(state)
        im, vi = place_batch(images, videos)
        s8, m8 = step(st, im, vi, key)

        for name in ("gen_loss", "dis_img_loss", "dis_vid_loss",
                     "ada_p_img", "ada_p_vid", "rt_img", "rt_vid"):
            np.testing.assert_allclose(float(m1[name]), float(m8[name]),
                                       rtol=1e-4, atol=1e-6, err_msg=name)
        for tree1, tree8, what in (
                (s1.gen.params, s8.gen.params, "gen params"),
                (s1.ema_params, s8.ema_params, "ema params"),
                (s1.dis_vid.params, s8.dis_vid.params, "dis_vid params"),
                (s1.dis_img.spectral, s8.dis_img.spectral, "img spectral"),
                (s1.dis_vid.spectral, s8.dis_vid.spectral, "vid spectral"),
                (s1.ada, s8.ada, "ada state")):
            for a, b in zip(jax.tree.leaves(tree1), jax.tree.leaves(tree8)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-3, atol=1e-5, err_msg=what)

    def test_dp_sp_step_matches_single_device(self):
        """DP x sequence-parallel: clips sharded over batch AND frame axes
        (the frame axis is this model family's context-parallel dimension,
        SURVEY §5.7). The video discriminator's temporal convs run spatially
        partitioned over 'seq' (GSPMD halo exchange); results must match the
        single-device step."""
        from ganode_tpu.models import (
            PatchImageDiscriminator, VideoDiscriminator, make_generator)
        from ganode_tpu.parallel import (
            make_mesh, replicate, shard_batch, shard_batch_seq)
        from ganode_tpu.train import GANTrainer

        T = 8
        gen = make_generator("ode", n_channels=1, trunk="mnist28",
                             video_length=T, dim_z_content=4, dim_z_motion=4,
                             ngf=8)
        tr = GANTrainer(gen=gen, dis_img=PatchImageDiscriminator(ndf=8),
                        dis_vid=VideoDiscriminator(ksize=2, ndf=8),
                        batch_size=8, d_iters=1)
        state = tr.init_state(jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        images = rng.uniform(-1, 1, (1, 8, 28, 28, 1)).astype(np.float32)
        videos = rng.uniform(-1, 1, (1, 8, T, 28, 28, 1)).astype(np.float32)
        key = jax.random.PRNGKey(1)

        s1, m1 = jax.jit(tr.train_step)(state, images, videos, key)

        mesh = make_mesh(8, ("data", "seq"), shape=(4, 2))
        st = replicate(state, mesh)
        im = shard_batch(images, mesh, batch_axis=1)
        vi = shard_batch_seq(videos, mesh, batch_axis=1, time_axis=2)
        assert vi.sharding.spec[1] == "data" and vi.sharding.spec[2] == "seq"
        s8, m8 = jax.jit(tr.train_step)(st, im, vi, key)

        np.testing.assert_allclose(float(m1["gen_loss"]), float(m8["gen_loss"]),
                                   rtol=1e-4)
        np.testing.assert_allclose(float(m1["dis_vid_loss"]),
                                   float(m8["dis_vid_loss"]), rtol=1e-4)
        for a, b in zip(jax.tree.leaves(s1.dis_vid.params),
                        jax.tree.leaves(s8.dis_vid.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-5)

    def test_multihost_feeding_into_parallel_step(self):
        """make_global_batch -> sharded parallel step: the multi-host feeding
        path (jax.make_array_from_process_local_data). Single-process here, so
        the local stripe is the whole batch; what's under test is the assembly
        of host data into a mesh-sharded global array and feeding it through
        the jitted DP step."""
        from ganode_tpu.data import make_global_batch
        from ganode_tpu.models import (
            PatchImageDiscriminator, VideoDiscriminator, make_generator)
        from ganode_tpu.parallel import (
            data_sharding, make_mesh, make_parallel_step)
        from ganode_tpu.train import GANTrainer

        T = 8
        gen = make_generator("gru", n_channels=1, trunk="mnist28",
                             video_length=T, dim_z_content=4, dim_z_motion=4,
                             ngf=8)
        tr = GANTrainer(gen=gen, dis_img=PatchImageDiscriminator(ndf=8),
                        dis_vid=VideoDiscriminator(ksize=2, ndf=8),
                        batch_size=16, d_iters=1)
        mesh = make_mesh(8, ("data",))
        step, place_state, _ = make_parallel_step(tr, mesh, donate=False)
        state = place_state(tr.init_state(jax.random.PRNGKey(0)))
        rng = np.random.RandomState(0)
        images = rng.uniform(-1, 1, (1, 16, 28, 28, 1)).astype(np.float32)
        videos = rng.uniform(-1, 1, (1, 16, T, 28, 28, 1)).astype(np.float32)
        im = make_global_batch(images, data_sharding(mesh, 1, images.ndim))
        vi = make_global_batch(videos, data_sharding(mesh, 1, videos.ndim))
        assert im.sharding.spec[1] == "data"
        new_state, metrics = step(state, im, vi, jax.random.PRNGKey(1))
        assert all(np.isfinite(float(v)) for v in metrics.values())
        assert int(new_state.step) == 1

    def test_two_process_feeding(self):
        """TRUE multi-process feeding (VERDICT r2 #8): two
        jax.distributed-initialized CPU processes, each contributing its own
        host stripe via make_global_batch, run one jitted DP step over the
        global 4-device mesh. Both processes must report the identical
        globally-reduced metrics — proof the psum rode the cross-process
        collective, not two independent computations."""
        import json
        import socket
        import subprocess

        # free port for the coordinator
        s = socket.socket()
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
        s.close()

        here = os.path.dirname(os.path.abspath(__file__))
        worker = os.path.join(here, "multiproc_worker.py")
        env = {**os.environ,
               "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
               "JAX_PLATFORMS": "cpu"}
        procs = [subprocess.Popen(
            [sys.executable, worker, str(port), str(i), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True) for i in range(2)]
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=900)
                outs.append(out)
                assert p.returncode == 0, out[-3000:]
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        results = []
        for out in outs:
            lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
            assert lines, out[-3000:]
            results.append(json.loads(lines[0][len("RESULT "):]))
        assert {r["process"] for r in results} == {0, 1}
        assert all(r["step"] == 1 for r in results)
        for k in ("dis_img_loss", "dis_vid_loss", "gen_loss"):
            assert np.isfinite(results[0][k])
            # bit-identical across processes: one global computation
            assert results[0][k] == results[1][k], (k, results)

    def test_tp_param_sharding(self):
        from ganode_tpu.parallel import make_mesh, shard_params_tp

        mesh = make_mesh(8, ("data", "model"), shape=(4, 2))
        params = {"big": np.zeros((4, 4, 64, 128), np.float32),
                  "small": np.zeros((3,), np.float32)}
        sharded = shard_params_tp(params, mesh, min_elements=1 << 10)
        assert sharded["big"].sharding.spec[-1] == "model"
        # small params replicated
        assert all(s is None for s in sharded["small"].sharding.spec)

    def test_ep_step_matches_single_device(self):
        """Expert parallelism: the moe_ode generator's stacked expert params
        (and their Adam moments) sharded over an 'expert' mesh axis — the full
        train step must match the single-device step (GSPMD computes each
        expert's dispatch on its owner and psums the gated combine)."""
        from ganode_tpu.models import (
            PatchImageDiscriminator, VideoDiscriminator, make_generator)
        from ganode_tpu.parallel import (
            make_mesh, replicate, shard_batch, shard_params_ep)
        from ganode_tpu.train import GANTrainer

        T = 8
        gen = make_generator("moe_ode", n_channels=1, trunk="mnist28",
                             video_length=T, dim_z_content=4, dim_z_motion=4,
                             ngf=8, n_experts=4)
        tr = GANTrainer(gen=gen, dis_img=PatchImageDiscriminator(ndf=8),
                        dis_vid=VideoDiscriminator(ksize=2, ndf=8),
                        batch_size=8, d_iters=1)
        state = tr.init_state(jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        images = rng.uniform(-1, 1, (1, 8, 28, 28, 1)).astype(np.float32)
        videos = rng.uniform(-1, 1, (1, 8, T, 28, 28, 1)).astype(np.float32)
        key = jax.random.PRNGKey(1)

        s1, m1 = jax.jit(tr.train_step)(state, images, videos, key)

        mesh = make_mesh(8, ("data", "expert"), shape=(2, 4))
        st = replicate(state, mesh)
        st = st.replace(gen=st.gen.replace(
            params=shard_params_ep(st.gen.params, mesh),
            opt_state=shard_params_ep(st.gen.opt_state, mesh)))
        # the stacked expert leaves are actually sharded over 'expert'
        ep_leaf = st.gen.params["motion"]["moe_fn"]["expert_w1"]
        assert ep_leaf.sharding.spec[0] == "expert"
        im = shard_batch(images, mesh, batch_axis=1)
        vi = shard_batch(videos, mesh, batch_axis=1)
        s8, m8 = jax.jit(tr.train_step)(st, im, vi, key)

        np.testing.assert_allclose(float(m1["gen_loss"]), float(m8["gen_loss"]),
                                   rtol=1e-4)
        for a, b in zip(jax.tree.leaves(s1.gen.params),
                        jax.tree.leaves(s8.gen.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-5)

    def test_pp_pipeline_matches_sequential_and_grads(self):
        """GPipe over heterogeneous toy stages: forward == sequential
        composition and the gradient through the scan+ppermute schedule ==
        the sequential gradient."""
        from flax import linen as nn
        from ganode_tpu.parallel import make_mesh, pipeline_apply

        dims = [(7, 16), (16, 5), (5, 12), (12, 3)]
        mods = [nn.Dense(o) for _, o in dims]
        x0 = jax.random.normal(jax.random.PRNGKey(0), (8, 7))
        params, cur = [], x0
        for m, (i, o) in zip(mods, dims):
            v = m.init(jax.random.PRNGKey(i * o), cur)
            params.append(v["params"])
            cur = m.apply(v, cur)
        fns = [lambda p, x, m=m: jnp.tanh(m.apply({"params": p}, x))
               for m in mods]

        def seq(ps, x):
            for f, p in zip(fns, ps):
                x = f(p, x)
            return x

        mesh = make_mesh(4, ("pipe",))
        out = pipeline_apply(fns, params, x0, mesh, n_microbatches=4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(seq(params, x0)),
                                   rtol=1e-5, atol=1e-6)

        g_pipe = jax.grad(lambda ps: jnp.sum(
            pipeline_apply(fns, ps, x0, mesh, n_microbatches=2) ** 2))(params)
        g_seq = jax.grad(lambda ps: jnp.sum(seq(ps, x0) ** 2))(params)
        for a, b in zip(jax.tree.leaves(g_pipe), jax.tree.leaves(g_seq)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)

    def test_pp_trunk_matches_eval_forward(self):
        """The pipelined generator trunk (DP x PP on a (2, 4) mesh) must decode
        bit-compatibly with the sequential eval-mode sample_videos path."""
        from ganode_tpu.models import make_generator
        from ganode_tpu.models.pipeline import pipelined_sample_videos
        from ganode_tpu.parallel import make_mesh

        gen = make_generator("ode", n_channels=3, trunk="dcgan64",
                             video_length=8, dim_z_content=10, dim_z_motion=8,
                             ngf=8)
        k = jax.random.PRNGKey(0)
        vs = gen.init({"params": k, "sample": k}, 2)
        sk = jax.random.PRNGKey(7)
        ref, _ = gen.apply(vs, 4, train=False, method="sample_videos",
                           rngs={"sample": sk})
        mesh = make_mesh(8, ("data", "pipe"), shape=(2, 4))
        out, _ = pipelined_sample_videos(gen, vs, 4, mesh, data_axis="data",
                                         sample_key=sk, n_microbatches=4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)


class TestMotionSolverOptions:
    """sde/cde/ode_rnn solver options must be reachable from ExperimentConfig
    (they were ode-only before)."""

    def test_sde_method_and_dt_forwarded(self):
        from ganode_tpu.train.runner import build_trainer

        c = get_config("mnist_sde", motion_method="milstein", sde_dt=0.05,
                       ngf=8, ndf=8, batch_size=2)
        tr = build_trainer(c)
        assert tr.gen.motion.method == "milstein"
        assert tr.gen.motion.dt == 0.05

    def test_cde_method_forwarded(self):
        from ganode_tpu.train.runner import build_trainer

        c = get_config("mnist_cde", motion_method="euler",
                       ngf=8, ndf=8, batch_size=2)
        tr = build_trainer(c)
        assert tr.gen.motion.method == "euler"

    def test_moe_options_forwarded(self):
        from ganode_tpu.train.runner import build_trainer

        c = get_config("mnist_moe_ode", moe_experts=8, moe_top_k=2,
                       ngf=8, ndf=8, batch_size=2)
        tr = build_trainer(c)
        assert tr.gen.motion.n_experts == 8
        assert tr.gen.motion.top_k == 2

    def test_none_keeps_variant_defaults(self):
        from ganode_tpu.train.runner import build_trainer

        for name, default in (("mnist_ode", "rk4"), ("mnist_sde", "euler"),
                              ("mnist_cde", "rk4"), ("mnist_ode_rnn", "rk4")):
            tr = build_trainer(get_config(name, ngf=8, ndf=8, batch_size=2))
            assert tr.gen.motion.method == default, name


def test_target_transforms():
    """ClassLabel / VideoID / Compose parity
    (reference dataset/transform/target_transforms.py:17-27)."""
    from ganode_tpu.data import transforms

    target = {"label": 7, "video_id": "v_Clap_g01"}
    assert transforms.class_label(target) == 7
    assert transforms.video_id(target) == "v_Clap_g01"
    both = transforms.compose_targets(transforms.class_label,
                                      transforms.video_id)
    assert both(target) == [7, "v_Clap_g01"]
