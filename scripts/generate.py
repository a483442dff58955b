#!/usr/bin/env python
"""Generate videos from a trained checkpoint (the serving path).

  python scripts/generate.py --config mnist_ode --workdir runs/mnist_ode \
      --num 64 [--out samples.npz] [--gif grid.gif] [--video-len 32]

Writes an .npz of videos (N, T, H, W, C in [-1, 1]) and/or an n x n GIF grid.
``--video-len`` demonstrates the continuous-dynamics payoff: the ODE/SDE/CDE
motion samplers generate clips LONGER than trained (the reference exposed this
as the video_len override, models/mocogan.py:271).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--workdir", required=True)
    p.add_argument("--num", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--video-len", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None, help=".npz output path")
    p.add_argument("--gif", default=None, help="GIF grid output path")
    p.add_argument("--set", dest="sets", action="append", default=[],
                   metavar="FIELD=VALUE",
                   help="config overrides (train.py --set syntax); the restore "
                        "template must match the checkpointed model's sizes")
    p.add_argument("--int8", action="store_true",
                   help="run the trunk through the int8-quantized serving "
                        "path (ganode_tpu.ops.quant; output error <=5e-4; "
                        "measured a wash vs bf16 on v5e — see docs/DESIGN.md "
                        "'Int8 serving path' — but 4x smaller weights)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import numpy as np

    from ganode_tpu.train.runner import build_trainer
    from ganode_tpu.utils.checkpoint import CheckpointManager
    from ganode_tpu.utils.config import get_config, overrides_from_strings
    from ganode_tpu.utils.gifs import save_sample_grid

    try:
        overrides = overrides_from_strings(args.sets)
    except ValueError as e:
        p.error(f"--set {e}")
    config = get_config(args.config, **overrides)
    trainer = build_trainer(config)
    # jitted: eager full-size init dispatches thousands of tiny remote ops
    # over the axon tunnel (~100x slower; CLAUDE.md environment rules)
    state = jax.jit(trainer.init_state)(jax.random.PRNGKey(config.seed))
    mgr = CheckpointManager(os.path.join(args.workdir, "checkpoints"))
    if mgr.latest_step() is not None:
        state = mgr.restore(state)
        print(f"restored step {mgr.latest_step()}")
    else:
        print("WARNING: no checkpoint — generating from the initial model")

    variables = trainer.eval_gen_variables(state)  # EMA weights when enabled
    key = jax.random.PRNGKey(args.seed)
    T = args.video_len or config.video_length
    if args.int8:
        from ganode_tpu.ops import int8_trunk_apply, quantize_trunk

        qp = quantize_trunk(config.trunk, variables["params"]["main"],
                            variables["batch_stats"]["main"])

        def sample(n, k):
            z, _ = trainer.gen.apply(variables, n, T,
                                     method="sample_z_video",
                                     rngs={"sample": k}, train=False)
            h = int8_trunk_apply(config.trunk, qp, z[:, None, None, :])
            return h.reshape(n, T, *h.shape[1:])
    else:
        def sample(n, k):
            (v, _) = trainer.gen.apply(
                variables, n, method="sample_videos", rngs={"sample": k},
                train=False, video_len=args.video_len)
            return v

    videos = []
    for j in range(0, args.num, args.batch_size):
        n = min(args.batch_size, args.num - j)
        videos.append(np.asarray(sample(n, jax.random.fold_in(key, j))))
    videos = np.concatenate(videos)
    print(f"generated {videos.shape} in [{videos.min():.3f}, {videos.max():.3f}]")

    if args.out:
        np.savez_compressed(args.out, videos=videos)
        print(f"wrote {args.out}")
    if args.gif:
        n = int(np.sqrt(len(videos)))
        save_sample_grid(args.gif, videos[: n * n], n=n)
        print(f"wrote {args.gif}")


if __name__ == "__main__":
    main()
