"""Worker for the true multi-process feeding test (SURVEY §5.8, VERDICT r2 #8).

Launched twice by tests/test_infra.py::test_two_process_feeding — each process
jax.distributed-initializes against a shared coordinator, contributes its host
stripe of the global batch via make_global_batch, and runs ONE jitted DP step
over the global 4-device CPU mesh (2 local virtual devices x 2 processes).
Prints one JSON line of metrics; the parent asserts both processes computed the
identical globally-reduced result.
"""
import json
import os
import sys

# env preparation BEFORE jax backend init (parent also sets these; the
# sitecustomize on this machine may pre-import jax, so force via live config too)
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 2 * nproc      # global device view
    assert len(jax.local_devices()) == 2

    import numpy as np

    from ganode_tpu.data import make_global_batch
    from ganode_tpu.models import (
        PatchImageDiscriminator, VideoDiscriminator, make_generator)
    from ganode_tpu.parallel import data_sharding, make_mesh, make_parallel_step
    from ganode_tpu.train import GANTrainer

    T, B = 8, 8  # global batch 8 -> stripe of 4 per process
    gen = make_generator("gru", n_channels=1, trunk="mnist28", video_length=T,
                         dim_z_content=4, dim_z_motion=4, ngf=8)
    tr = GANTrainer(gen=gen, dis_img=PatchImageDiscriminator(ndf=8),
                    dis_vid=VideoDiscriminator(ksize=2, ndf=8),
                    batch_size=B, d_iters=1)
    mesh = make_mesh(2 * nproc, ("data",))
    step, place_state, _ = make_parallel_step(tr, mesh, donate=False)
    state = place_state(tr.init_state(jax.random.PRNGKey(0)))

    # each process contributes ITS OWN stripe — different data per host, as in
    # real multi-host feeding (host_id striding of the samplers)
    local = B // nproc
    rng = np.random.RandomState(100 + pid)
    images = rng.uniform(-1, 1, (1, local, 28, 28, 1)).astype(np.float32)
    videos = rng.uniform(-1, 1, (1, local, T, 28, 28, 1)).astype(np.float32)
    im = make_global_batch(images, data_sharding(mesh, 1, images.ndim))
    vi = make_global_batch(videos, data_sharding(mesh, 1, videos.ndim))
    assert im.shape == (1, B, 28, 28, 1)        # global shape, local stripe

    new_state, metrics = step(state, im, vi, jax.random.PRNGKey(1))
    out = {k: float(v) for k, v in metrics.items()}
    out["step"] = int(new_state.step)
    out["process"] = pid
    print("RESULT " + json.dumps(out), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
