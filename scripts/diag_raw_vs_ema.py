#!/usr/bin/env python
"""Diagnose EMA-vs-raw generator quality on a long-run checkpoint.

The demo runner's eval path samples with `eval_gen_variables` — the EMA
weights whenever the run trains with `--ema` (train/gan.py:171-179). In an
oscillating GAN the weight-space average can lag or wash out modes, so a
rising eval-FVD curve is ambiguous: is the *model* stuck, or only the
*smoothed view* of it? This script answers that with one checkpoint read:
FVD + sample grids for BOTH parameter sets, against the identical reals and
persisted embedder the long run scores with (same synthetic_moving_shapes
draw, same eval_assets feature model, same 256-clip protocol).

  python scripts/diag_raw_vs_ema.py --workdir runs/wgan128_r4 \
      --out-json DEMO_RESULTS_WGAN128_RAWEMA.json
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="ucf_wgan_gp_128")
    p.add_argument("--workdir", default="runs/wgan128_r4")
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--out-json", default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from demo_tpu_train import synthetic_moving_shapes
    from ganode_tpu.eval import (VideoEmbedder, embed_videos, fvd, load_params,
                                 train_video_embedder)
    from ganode_tpu.train.runner import build_trainer
    from ganode_tpu.utils.checkpoint import CheckpointManager
    from ganode_tpu.utils.config import get_config
    from ganode_tpu.utils.gifs import save_sample_grid

    # identical config the long run trains with (demo_tpu_train.py resume
    # recipe: --bf16 --ema 0.999 --set diffaug=color,translation,cutout)
    config = get_config(args.config, batch_size=32, compute_dtype="bfloat16",
                        ema_decay=0.999, diffaug="color,translation,cutout")
    trainer = build_trainer(config)
    state = jax.jit(trainer.init_state)(jax.random.PRNGKey(0))
    mgr = CheckpointManager(os.path.join(args.workdir, "checkpoints"))
    step = mgr.latest_step()
    state = mgr.restore(state)
    mgr.close()
    print(f"restored step {step}", flush=True)

    # identical reals + embedder the demo runner scores with
    videos_np, labels_np = synthetic_moving_shapes(512, config.video_length,
                                                   size=128)
    videos = jnp.asarray(videos_np)
    emb_path = os.path.join("eval_assets", "ucf101", "embedder_c64_s128.msgpack")
    embedder, emb_params, _ = train_video_embedder(
        videos_np[:512], labels_np[:512], n_classes=64, steps=0)
    emb_params = load_params(emb_path, emb_params)
    emb_bs = 32  # 128px clips (demo_tpu_train.py emb_bs threshold)
    feats_real = embed_videos(embedder, emb_params, videos[:256], emb_bs)

    sample = jax.jit(lambda v, k: trainer.gen.apply(
        v, 64, method="sample_videos", rngs={"sample": k}, train=False)[0])

    def score(variables, tag):
        feats, gif16 = [], None
        for j in range(0, args.n, 64):
            vids = sample(variables, jax.random.PRNGKey(10_000 + step + j))
            feats.append(embed_videos(embedder, emb_params, vids, emb_bs))
            if j == 0:
                gif16 = np.asarray(vids[:16])
        value = fvd(feats_real, np.concatenate(feats))
        save_sample_grid(os.path.join(args.workdir,
                                      f"diag_{tag}_{step:05d}.gif"), gif16, n=4)
        stats = {"fvd": round(float(value), 4),
                 "sample_mean": round(float(gif16.mean()), 4),
                 "sample_std": round(float(gif16.std()), 4),
                 "sample_max": round(float(gif16.max()), 4)}
        print(tag, json.dumps(stats), flush=True)
        return stats

    raw_vars = {"params": state.gen.params,
                "batch_stats": state.gen.batch_stats}
    if state.gen.spectral is not None:
        raw_vars["spectral"] = state.gen.spectral
    out = {"config": config.name, "step": int(step),
           "raw": score(raw_vars, "raw"),
           "ema": score(trainer.eval_gen_variables(state), "ema"),
           "note": "same reals/embedder/protocol as the long run's eval rows "
                   "(trained-embedder-relative FVD); 'ema' reproduces the "
                   "runner's view, 'raw' is the live training parameters."}
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
