#!/usr/bin/env python
"""Per-phase profile of the north-star WGAN-GP@128 training step.

bench.py profiles the reference-parity flagship (ucf_ode, 64px, BCE, d_iters=2);
this profiles the step this framework ADDS — `ucf_wgan_gp_128`: batch 32,
32-frame 128x128 clips, adaptive dopri5 motion, spectral-norm critics,
Wasserstein loss with gradient penalty (a second-order backward through each
critic), d_iters=5. The phases are chosen to answer: where does the ~2x-per-
d_iter cost go — critic convs, the GP double-backward, or the generator's
sample calls that feed every D iteration?

Methodology follows bench.py: jitted init, two-point-slope timing with host
syncs, K-repeat scan bodies with a 1e-9 data dependence so XLA cannot hoist
loop-invariant work, XLA-counted FLOPs for MFU.

Writes one JSON object to stdout (and optionally --out FILE).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _slope_time(run, sync, n1=2, n2=8):
    t0 = time.time()
    sync(run(n1, 100))
    ta = time.time() - t0
    t0 = time.time()
    sync(run(n2, 100 + n1))
    tb = time.time() - t0
    return (tb - ta) / (n2 - n1)


def _flops_of(jitted, *args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        f = float(ca.get("flops", 0))
        return f if f > 0 else None
    except Exception:
        return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="shrink sizes for a CPU smoke run")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ganode_tpu.train.losses import gradient_penalty
    from ganode_tpu.train.runner import build_trainer
    from ganode_tpu.utils.config import get_config

    on_tpu = jax.default_backend() == "tpu"
    overrides = {"compute_dtype": "bfloat16" if on_tpu else "float32"}
    if args.tiny:
        # d_iters=1 keeps the one-core CPU smoke compile tractable: the step
        # graph unrolls d_iters GP double-backwards (5x is a 30+ min compile)
        overrides.update(batch_size=2, video_length=32, ngf=8, ndf=8,
                         dim_z_content=4, dim_z_motion=4, d_iters=1)
    config = get_config("ucf_wgan_gp_128", **overrides)
    trainer = build_trainer(config)
    B, T = config.batch_size, config.video_length

    key = jax.random.PRNGKey(0)
    state = jax.jit(trainer.init_state)(key)
    rng = np.random.RandomState(0)
    D = config.d_iters
    images = jnp.asarray(rng.uniform(-1, 1, (D, B, 128, 128, 3)), jnp.float32)
    videos = jnp.asarray(rng.uniform(-1, 1, (D, B, T, 128, 128, 3)),
                         jnp.float32)

    # ---- whole step ---------------------------------------------------------
    step = jax.jit(trainer.train_step)
    t0 = time.time()
    step_flops = _flops_of(step, state, images, videos, key)
    state, metrics = step(state, images, videos, key)
    float(metrics["gen_loss"])
    compile_s = time.time() - t0
    for i in range(3):
        state, metrics = step(state, images, videos, jax.random.fold_in(key, i))
    float(metrics["gen_loss"])

    def run_steps(n, offset):
        s, m = state, metrics
        for i in range(n):
            s, m = step(s, images, videos, jax.random.fold_in(key, offset + i))
        return m

    step_s = _slope_time(run_steps, lambda m: float(m["gen_loss"]))

    result = {
        "what": "per-phase profile of the ucf_wgan_gp_128 training step "
                "(north-star config: dopri5 motion, SN critics, WGAN-GP, "
                f"d_iters={D})",
        "batch_size": B, "video_length": T, "d_iters": D,
        "backend": jax.default_backend(),
        "device_kind": jax.devices()[0].device_kind,
        "precision": config.compute_dtype,
        "compile_s": round(compile_s, 1),
        "step_time_ms": round(step_s * 1000, 2),
        "clips_per_sec": round(B / step_s, 1),
    }
    if step_flops:
        result["step_tflops"] = round(step_flops / 1e12, 2)
        if on_tpu:
            peak = 197e12 if "v5" in result["device_kind"].lower() else None
            if peak:
                result["mfu"] = round(step_flops / step_s / peak, 4)

    # ---- phases -------------------------------------------------------------
    gvars = {"params": state.gen.params, "batch_stats": state.gen.batch_stats}
    if state.gen.spectral is not None:
        gvars["spectral"] = state.gen.spectral
    dv = {"params": state.dis_vid.params,
          "batch_stats": state.dis_vid.batch_stats}
    if state.dis_vid.spectral is not None:
        dv["spectral"] = state.dis_vid.spectral

    def sample_videos(x, k):
        (v, _), _ = trainer.gen.apply(
            gvars, B, method="sample_videos", rngs={"sample": k},
            mutable=["batch_stats", "spectral"])
        return v

    def sample_images(x, k):
        (v, _), _ = trainer.gen.apply(
            gvars, B, method="sample_images", rngs={"sample": k},
            mutable=["batch_stats", "spectral"])
        return v

    def d_vid_fwd(x, k):
        logits, _ = trainer.dis_vid.apply(dv, x, train=False,
                                          rngs={"noise": k})
        return logits

    def d_vid_fwd_bwd_x(x, k):
        return jax.grad(lambda x_: jnp.sum(d_vid_fwd(x_, k))
                        .astype(jnp.float32))(x)

    vid_real = videos[0]
    vid_fake = videos[1] if D > 1 else videos[0] * 0.5

    def gp_vid_update(x, k):
        """Forward+backward (wrt critic params) of the GP term alone — the
        second-order cost each of the d_iters D_vid updates pays."""
        def term(params):
            d_apply = lambda xx: trainer.dis_vid.apply(
                {**dv, "params": params}, xx, train=False,
                rngs={"noise": k})[0]
            return gradient_penalty(d_apply, x, vid_fake, k)
        g = jax.grad(term)(dv["params"])
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                   for l in jax.tree.leaves(g))

    def d_vid_loss_bwd(x, k):
        """Forward+backward (wrt params) of the plain Wasserstein critic loss
        (no GP) — the first-order half of a D_vid update."""
        def term(params):
            logits_r = trainer.dis_vid.apply({**dv, "params": params}, x,
                                             train=False, rngs={"noise": k})[0]
            logits_f = trainer.dis_vid.apply({**dv, "params": params},
                                             vid_fake, train=False,
                                             rngs={"noise": k})[0]
            return jnp.mean(logits_f) - jnp.mean(logits_r)
        g = jax.grad(term)(dv["params"])
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                   for l in jax.tree.leaves(g))

    K = 8 if on_tpu else 1

    def timed(fn_one, x):
        def run_k(x, kk):
            def body(acc, k):
                xi = x + (acc * 1e-9).astype(x.dtype)
                return jnp.sum(fn_one(xi, k)).astype(jnp.float32), None
            out, _ = jax.lax.scan(body, jnp.float32(0),
                                  jax.random.split(kk, K))
            return out
        fn = jax.jit(run_k)
        float(fn(x, jax.random.fold_in(key, 0)))

        def run(n, offset):
            o = None
            for i in range(n):
                o = fn(x, jax.random.fold_in(key, offset + i))
            return o

        ms = max(_slope_time(run, lambda o: float(o)) * 1000 / K, 0.0)
        one = jax.jit(lambda x, k: jnp.sum(fn_one(x, k)).astype(jnp.float32))
        return ms, _flops_of(one, x, key)

    img_real = images[0]
    phases, tflops = {}, {}
    for name, fn_one, x_in in (
        ("gen_sample_videos", sample_videos, img_real),
        ("gen_sample_images", sample_images, img_real),
        ("d_vid_forward", d_vid_fwd, vid_real),
        ("d_vid_fwd_bwd_x", d_vid_fwd_bwd_x, vid_real),
        ("d_vid_loss_bwd_params", d_vid_loss_bwd, vid_real),
        ("gp_vid_update", gp_vid_update, vid_real),
    ):
        ms, f = timed(fn_one, x_in)
        phases[name] = round(ms, 2)
        if f and ms > 0:
            tflops[name] = round(f / (ms / 1e3) / 1e12, 1)

    result["phase_ms"] = phases
    result["phase_tflops_per_sec"] = tflops
    # what one full step is made of, in phase terms:
    #   d_iters x (D_img + D_vid update) + 1 G update; each D_vid update =
    #   sample_videos (fake) + loss fwd/bwd + GP; G = sample_videos +
    #   sample_images + both critics' input-gradients.
    out = json.dumps(result, indent=1)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
