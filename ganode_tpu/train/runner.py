"""Config -> trainer/data assembly and the training driver loop.

The glue the reference spread across seven near-identical scripts: build models
from an ExperimentConfig, wire data samplers, run the jitted step loop with
logging / GIF sampling / checkpointing at the reference's cadences.
"""
from __future__ import annotations

import os
import signal
from typing import Optional, Tuple

import jax
import numpy as np

from ..data import (
    RotMNISTImages,
    RotMNISTVideos,
    UCF101ClipSampler,
    UCF101ImageSampler,
    load_rotmnist,
)
from ..models import (
    ImageDiscriminator,
    PatchImageDiscriminator,
    PatchVideoDiscriminator,
    SNImageDiscriminator,
    SNVideoDiscriminator,
    VideoDiscriminator,
    make_generator,
)
from ..utils.config import ExperimentConfig
from ..utils.gifs import save_sample_grid
from ..utils.metrics import MetricsLogger, Throughput
from .gan import GANTrainer


def build_trainer(config: ExperimentConfig) -> GANTrainer:
    import jax.numpy as jnp

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[config.compute_dtype]
    motion_kwargs = {}
    if config.use_pallas and config.variant in ("ode", "gru"):
        motion_kwargs["use_pallas"] = True
    # every solver-backed variant accepts a method override (ode also via
    # dopri5); None keeps the variant's reference default
    if config.motion_method is not None and config.variant != "gru":
        motion_kwargs["method"] = config.motion_method
    if config.variant == "sde" and config.sde_dt is not None:
        motion_kwargs["dt"] = config.sde_dt
    if config.variant == "moe_ode":
        motion_kwargs["n_experts"] = config.moe_experts
        motion_kwargs["top_k"] = config.moe_top_k
    gen = make_generator(
        config.variant,
        n_channels=config.n_channels,
        trunk=config.trunk,
        dim_z_content=config.dim_z_content,
        dim_z_category=config.dim_z_category,
        dim_z_motion=config.dim_z_motion,
        video_length=config.video_length,
        ngf=config.ngf,
        dtype=dtype,
        **motion_kwargs,
    )
    if config.image_disc == "patch":
        dis_img = PatchImageDiscriminator(ndf=config.ndf, dtype=dtype)
    elif config.image_disc == "sn":
        dis_img = SNImageDiscriminator(ndf=config.ndf)
    elif config.image_disc == "full":
        dis_img = ImageDiscriminator(ndf=config.ndf, dtype=dtype)
    else:
        raise ValueError(f"unknown image_disc {config.image_disc!r}")
    if config.video_disc == "sn":
        dis_vid = SNVideoDiscriminator(ksize=config.video_disc_ksize,
                                       ndf=config.ndf)
    elif config.video_disc == "patch":
        dis_vid = PatchVideoDiscriminator(ndf=config.ndf, dtype=dtype)
    elif config.video_disc == "full":
        dis_vid = VideoDiscriminator(ksize=config.video_disc_ksize,
                                     ndf=config.ndf, dtype=dtype)
    else:
        raise ValueError(f"unknown video_disc {config.video_disc!r}")
    return GANTrainer(
        gen=gen, dis_img=dis_img, dis_vid=dis_vid,
        batch_size=config.batch_size, d_iters=config.d_iters,
        loss=config.loss, lr=config.lr, betas=config.betas,
        weight_decay=config.weight_decay,
        param_noise_sigma=config.param_noise_sigma,
        gp_weight=config.gp_weight,
        r1_weight=config.r1_weight,
        ema_decay=config.ema_decay,
        fused_real_fake=config.fused_real_fake,
        diffaug=config.diffaug,
        ada_target=config.ada_target,
        ada_step=config.ada_step,
        ada_p_max=config.ada_p_max,
    )


def synthetic_rotmnist(config: ExperimentConfig, n_videos: int = 64,
                       seed: int = 0):
    """Synthetic rotated-square videos with the real dataset's geometry — for
    dry runs and benches when no dataset file is present."""
    from ..data.rotmnist import rotate_videos

    rng = np.random.RandomState(seed)
    imgs = np.full((n_videos, 28, 28), -0.5, np.float32)
    for i in range(n_videos):
        y, x = rng.randint(4, 18, 2)
        imgs[i, y:y + 8, x:x + 8] = 0.5
    if config.digits:  # synthetic labels honor the class filter too
        labels = np.asarray(config.digits)[rng.randint(0, len(config.digits),
                                                       n_videos)]
    else:
        labels = rng.randint(0, 10, n_videos)
    X, Y = rotate_videos(imgs, labels, num_frames=config.video_length)
    return X.reshape(-1, config.video_length, 28, 28, 1), Y


def synthetic_ucf(config: ExperimentConfig, n_videos: int = 16, seed: int = 0):
    size = 128 if config.trunk == "dcgan128" else 64
    rng = np.random.RandomState(seed)
    videos = rng.randint(0, 255, (n_videos, config.video_length + 8, size, size,
                                  config.n_channels), dtype=np.uint8)
    videos = (videos.astype(np.float32) - 128.0) / 128.0
    return videos, rng.randint(0, 101, n_videos)


def build_data(config: ExperimentConfig, *, synthetic: bool = False,
               value_range=None, start_step: int = 0):
    """Returns (image_sampler, video_sampler) with .sample(key) methods.

    ``value_range`` (rotmnist only) rescales the served values; training keeps
    the reference's [0, 1] quirk (reference dataset/mnist_rotation.py:28-32),
    but evaluation must compare reals and tanh fakes on the same [-1, 1] scale.

    ``start_step`` (native loader only) fast-forwards the C++ batch streams on
    resume so the continuation is bit-identical to an uninterrupted run; the
    keyed Python samplers don't need it (their batches derive from the step
    key alone).
    """
    if config.dataset == "rotmnist":
        if synthetic or not os.path.exists(config.data_path):
            if not synthetic:
                raise FileNotFoundError(
                    f"dataset not found at {config.data_path}; build it with "
                    "scripts/build_rotmnist.py or pass synthetic=True")
            videos, labels = synthetic_rotmnist(config)
        else:
            videos, labels = load_rotmnist(
                config.data_path, train=True, num_frames=config.video_length,
                digits=config.digits)
        kw = {"value_range": value_range} if value_range is not None else {}
        return (RotMNISTImages(videos, labels, config.batch_size, **kw),
                RotMNISTVideos(videos, labels, config.batch_size, **kw))
    if config.dataset == "ucf101":
        if synthetic or not os.path.exists(config.data_path):
            if not synthetic:
                raise FileNotFoundError(
                    f"packed UCF101 not found at {config.data_path}; pack it "
                    "with scripts/pack_ucf101.py or pass synthetic=True")
            videos, labels = synthetic_ucf(config)

            class _Imgs:
                def sample(self, key):
                    k1, k2 = jax.random.split(key)
                    i = np.asarray(jax.random.randint(k1, (config.batch_size,), 0,
                                                      len(videos)))
                    t = np.asarray(jax.random.randint(k2, (config.batch_size,), 0,
                                                      videos.shape[1]))
                    return videos[i, t], labels[i]

            class _Vids:
                def sample(self, key):
                    k1, k2 = jax.random.split(key)
                    i = np.asarray(jax.random.randint(k1, (config.batch_size,), 0,
                                                      len(videos)))
                    s = np.asarray(jax.random.randint(
                        k2, (config.batch_size,), 0,
                        videos.shape[1] - config.video_length + 1))
                    return (np.stack([videos[ii, ss:ss + config.video_length]
                                      for ii, ss in zip(i, s)]), labels[i])

            return _Imgs(), _Vids()
        if config.data_loader == "native":
            # C++ thread-ring feeding (runtime/clip_loader.cc): replaces the
            # Python per-batch window gather with prefetched native batches.
            # One training step consumes d_iters batches from each stream.
            from ..runtime import NativeClipSampler, NativeImageSampler

            start = start_step * config.d_iters
            return (
                NativeImageSampler(
                    config.data_path, config.batch_size,
                    n_threads=max(1, config.data_loader_threads // 2),
                    seed=config.seed + 1, start_batch=start),
                NativeClipSampler(
                    config.data_path, config.batch_size,
                    n_frame=config.video_length,
                    n_threads=config.data_loader_threads,
                    seed=config.seed, start_batch=start),
            )
        if config.data_loader != "python":
            raise ValueError(
                f"unknown data_loader {config.data_loader!r}; "
                "choose 'python' or 'native'")
        return (UCF101ImageSampler(config.data_path, config.batch_size),
                UCF101ClipSampler(config.data_path, config.batch_size,
                                  n_frame=config.video_length))
    raise ValueError(f"unknown dataset {config.dataset!r}")


def _stack_d_batches(sampler, key, d_iters):
    return np.stack([sampler.sample(jax.random.fold_in(key, i))[0]
                     for i in range(d_iters)])


def make_device_data_step(trainer: GANTrainer, d_iters: int, video_length: int):
    """A jitted step whose real batches are gathered ON DEVICE from a resident
    dataset array — zero host->device traffic per step.

    For datasets that fit in HBM (rotated-MNIST is ~6 MB) this removes the data
    path entirely: ``videos`` (N, T, H, W, C) is uploaded once; each step draws
    random clips and random frames with device-side PRNG. Returns
    ``step(state, videos, key) -> (state, metrics)``.
    """
    B = trainer.batch_size

    def step(state, videos, key):
        k_v, k_i, k_f, k_t = jax.random.split(key, 4)
        n = videos.shape[0]
        vid_idx = jax.random.randint(k_v, (d_iters, B), 0, n)
        vid_batches = videos[vid_idx]                      # (d, B, T, H, W, C)
        img_vid_idx = jax.random.randint(k_i, (d_iters, B), 0, n)
        frame_idx = jax.random.randint(k_f, (d_iters, B), 0, video_length)
        img_batches = videos[img_vid_idx,                   # (d, B, H, W, C)
                             frame_idx]
        return trainer.train_step(state, img_batches, vid_batches, k_t)

    return jax.jit(step, donate_argnums=(0,))


class GracefulStop:
    """Preemption-safe stop request: SIGTERM/SIGINT (the notice a preempted
    TPU-pod worker gets) or a ``<workdir>/STOP`` file end the run gracefully —
    the in-flight step completes, the state is checkpointed, and
    ``run_training`` returns cleanly, so re-issuing the same command with
    ``resume=True`` continues bit-deterministically (the PRNG key lives in the
    checkpointed state). The reference had no preemption story at all — long
    runs were resumed by hand-editing a flag (reference
    mnist_moco_ode.py:92-103); SURVEY.md §5.3 names this gap explicitly.
    """

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self.requested = False
        self._signals = signals
        self._saved = {}

    def _handle(self, signum, frame):
        self.requested = True

    def __enter__(self):
        try:
            for s in self._signals:
                self._saved[s] = signal.signal(s, self._handle)
        except ValueError:  # not the main thread: STOP-file polling only
            self._saved = {}
        return self

    def __exit__(self, *exc):
        for s, h in self._saved.items():
            signal.signal(s, h)
        return False


def _parse_mesh(spec: str):
    """'data=4,seq=2' -> (('data', 'seq'), (4, 2))."""
    names, sizes = [], []
    for part in spec.split(","):
        name, _, size = part.partition("=")
        names.append(name.strip())
        sizes.append(int(size))
    allowed = {("data",), ("data", "seq")}
    if tuple(names) not in allowed:
        raise ValueError(
            f"mesh axes {names} unsupported by the runner; use 'data=N' or "
            "'data=N,seq=M' (TP/EP placements are model-specific — use "
            "ganode_tpu.parallel directly)")
    return tuple(names), tuple(sizes)


def run_training(
    config: ExperimentConfig,
    workdir: str,
    *,
    steps: Optional[int] = None,
    synthetic: bool = False,
    resume: bool = False,
    jit: bool = True,
) -> Tuple[object, dict]:
    """The reference's train() loop (mnist_moco_ode.py:51-195), config-driven.

    ``config.mesh`` (e.g. "data=8", "data=4,seq=2") runs the same jitted step
    GSPMD-parallelized over a device mesh: parameters replicated, real batches
    sharded over 'data' (and clips over 'seq' — the frame axis), gradients
    psum-reduced over ICI. Numerically identical to the single-device step
    (tests/test_infra.py::TestParallel).

    Preemption-safe: SIGTERM/SIGINT or ``<workdir>/STOP`` (checked every
    ``log_every`` steps) finish the current step, checkpoint, and return with
    ``"preempted"`` in the metrics dict; rerunning with ``resume=True``
    continues bit-deterministically. Periodic checkpoints are written
    asynchronously (orbax) so saving never stalls the step loop; only the
    final/preemption save blocks.
    """
    from ..utils.checkpoint import CheckpointManager

    os.makedirs(workdir, exist_ok=True)
    steps = steps if steps is not None else config.steps
    trainer = build_trainer(config)

    key = jax.random.PRNGKey(config.seed)
    # jitted init: eager per-op dispatch over the axon tunnel is ~100x slower
    # for the full-size state (CLAUDE.md environment rules)
    state = jax.jit(trainer.init_state)(key)

    mesh = None
    if config.mesh:
        from ..parallel import make_mesh
        axis_names, shape = _parse_mesh(config.mesh)
        mesh = make_mesh(int(np.prod(shape)), axis_names, shape=shape)

    ckpt = CheckpointManager(os.path.join(workdir, "checkpoints"))
    start_step = 0
    if resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        start_step = int(state.step)
    if mesh is not None:
        from ..parallel import replicate
        state = replicate(state, mesh)
    # data comes up after restore so the native loader's batch streams can
    # fast-forward to the resume point (python samplers ignore start_step)
    img_sampler, vid_sampler = build_data(config, synthetic=synthetic,
                                          start_step=start_step)

    logger = MetricsLogger(os.path.join(workdir, "metrics.jsonl"),
                           print_every=config.log_every)
    # TensorBoard scalars alongside JSONL (the reference's stage-2 notebook
    # logged via SummaryWriter; reference test_ODE_training_with_cifar_GAN.ipynb)
    tb = None
    if config.tensorboard:
        from ..utils.tb import EventWriter
        tb = EventWriter(os.path.join(workdir, "tb"))
    throughput = Throughput(config.batch_size)
    step_fn = trainer.jitted_step(donate=False) if jit else trainer.train_step

    place_batch = None
    if mesh is not None:
        from ..parallel import shard_batch, shard_batch_seq
        seq = "seq" in mesh.axis_names

        def place_batch(images, videos):
            images = shard_batch(images, mesh, batch_axis=1)
            videos = (shard_batch_seq(videos, mesh, batch_axis=1, time_axis=2)
                      if seq else shard_batch(videos, mesh, batch_axis=1))
            return images, videos

    metrics = {}
    preempted = False
    stop_path = os.path.join(workdir, "STOP")
    throughput.start()
    try:
        with GracefulStop() as stop:
            for step in range(start_step, steps):
                k_step = jax.random.fold_in(key, step)
                k_img, k_vid, k_train = jax.random.split(k_step, 3)
                images = _stack_d_batches(img_sampler, k_img, config.d_iters)
                videos = _stack_d_batches(vid_sampler, k_vid, config.d_iters)
                if place_batch is not None:
                    images, videos = place_batch(images, videos)
                state, metrics = step_fn(state, images, videos, k_train)
                throughput.update()

                if step % config.log_every == 0:
                    # failure detection (SURVEY.md §5.3 — the reference had
                    # none): a non-finite loss means the run is dead;
                    # checkpoint the last good state and stop instead of
                    # silently training on NaNs.
                    vals = {k: float(v) for k, v in metrics.items()}
                    if not all(np.isfinite(v) for v in vals.values()):
                        logger.log(step, metrics,
                                   extra={"event": "non_finite_loss"})
                        ckpt.save(step, state, wait=True)
                        raise FloatingPointError(
                            f"non-finite loss at step {step}: {vals}; "
                            f"last state checkpointed to {workdir}/checkpoints")
                    logger.log(step, metrics, extra={
                        "clips_per_sec": throughput.clips_per_sec_per_chip()})
                    if tb is not None:
                        tb.add_scalars(
                            {f"train/{k}": v for k, v in vals.items()}
                            | {"perf/clips_per_sec":
                               throughput.clips_per_sec_per_chip()}, step)
                        tb.flush()
                if config.sample_every and step % config.sample_every == 0:
                    _write_samples(trainer, state, os.path.join(
                        workdir, "samples", f"gensamples_id{step}.gif"), config)
                if config.checkpoint_every and step % config.checkpoint_every == 0:
                    ckpt.save(step, state)
                if stop.requested or (step % config.log_every == 0
                                      and os.path.exists(stop_path)):
                    preempted = True
                    logger.log(step, metrics, extra={"event": "preempted"})
                    if os.path.exists(stop_path):
                        os.remove(stop_path)  # honored; let --resume continue
                    break

        final_step = int(np.asarray(jax.device_get(state.step)))
        ckpt.save(final_step, state, wait=True)
    finally:
        # runs on the non-finite-loss raise too: without it a caller that
        # catches the error and relaunches in-process would leak the native
        # samplers' C++ prefetch threads and mmap (both closes are idempotent)
        logger.close()
        if tb is not None:
            tb.close()
        for s in (img_sampler, vid_sampler):  # native samplers own C++ threads
            if hasattr(s, "close"):
                s.close()
    out = {k: float(v) for k, v in metrics.items()}
    if preempted:
        out["preempted"] = float(final_step)
    return state, out


def _write_samples(trainer: GANTrainer, state, path: str,
                   config: ExperimentConfig, n: int = 8):
    """8x8 grid GIF in eval mode (the reference flips g.eval()/g.train() around
    sampling, mnist_moco_ode.py:32-35)."""
    variables = trainer.eval_gen_variables(state)
    (videos, _) = trainer.gen.apply(
        variables, n * n, method="sample_videos",
        rngs={"sample": jax.random.PRNGKey(int(state.step))}, train=False)
    save_sample_grid(path, np.asarray(videos), n=n)
    return path
