#!/usr/bin/env python
"""Quantify what BatchNorm costs the video discriminator's fwd+bwd on TPU.

BENCH_r02 put d_vid_fwd_bwd at 64.6 TFLOP/s vs ~112 forward-only: the backward
is the whole-step bottleneck. DESIGN.md names BN statistics passes as a
suspected contributor; this harness measures that contribution directly by
timing four variants of the SAME geometry (B=32, 16x64x64x3, ksize=4, ndf=64):

  train_bn    — training-mode BN (batch stats computed + normalize), the bench
                configuration's real cost
  eval_bn     — running-stats BN (no stats reduction; normalize only)
  no_bn       — BN deleted outright (upper bound for any conv+BN fusion)
  sn          — the spectral-norm critic (BatchNorm-free WGAN geometry)

If (train_bn - no_bn) is small, no Pallas conv+BN+leaky fusion can move the
step materially and the refutation gets committed to DESIGN.md; if large, the
gap IS the fusion opportunity.

  python scripts/bench_dvid_bn.py [--batch-size 32] [--steps 30]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--video-length", type=int, default=16)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from ganode_tpu.models import SNVideoDiscriminator, VideoDiscriminator
    from ganode_tpu.models.mocogan import (
        FastGradConv3D, _bn, _conv3d, leaky_relu)

    ndf = 8 if args.tiny else 64
    B, T = args.batch_size, args.video_length
    dt = jnp.bfloat16

    class NoBNVideoDiscriminator(nn.Module):
        """VideoDiscriminator(ksize=4) with every BN deleted — the upper bound
        on what any conv+BN fusion could recover."""

        ndf: int = 64

        @nn.compact
        def __call__(self, x, *, train: bool = True):
            k, s, pd = (4, 4, 4), (1, 2, 2), (0, 1, 1)
            h = leaky_relu(FastGradConv3D(self.ndf, dtype=dt)(x.astype(dt)))
            h = leaky_relu(_conv3d(h, self.ndf * 2, k, s, pd, dtype=dt))
            h = leaky_relu(_conv3d(h, self.ndf * 4, k, s, pd, dtype=dt))
            h = leaky_relu(_conv3d(h, self.ndf * 8, k, s, pd, dtype=dt))
            h = _conv3d(h, 1, k, (1, 1, 1), (0, 0, 0), dtype=dt)
            return jnp.squeeze(h).astype(jnp.float32), None

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, T, 64, 64, 3)), jnp.float32)

    def timed_fwd_bwd(mod, variables, mutable, train):
        def loss(params, x):
            kw = {}
            out = mod.apply({**variables, "params": params}, x, train=train,
                            mutable=mutable, **kw)
            (logits, _) = out[0] if mutable else out
            return jnp.sum(jnp.square(logits))

        g = jax.jit(jax.grad(loss, argnums=(0, 1)))
        params = variables["params"]
        out = g(params, x)  # compile
        float(jnp.sum(out[1][0, 0, 0, 0]))

        def run(n, off):
            t0 = time.time()
            o = None
            for _ in range(n):
                o = g(params, x)
            float(jnp.sum(o[1][0, 0, 0, 0]))
            return time.time() - t0

        n1, n2 = max(args.steps // 4, 2), args.steps
        t1, t2 = run(n1, 0), run(n2, 100)
        return (t2 - t1) / (n2 - n1)

    results = {}

    d = VideoDiscriminator(ksize=4, ndf=ndf, dtype=dt)
    v = d.init({"params": jax.random.PRNGKey(0)}, x)
    results["train_bn_ms"] = timed_fwd_bwd(
        d, v, ["batch_stats"], True) * 1e3
    results["eval_bn_ms"] = timed_fwd_bwd(d, v, False, False) * 1e3

    nb = NoBNVideoDiscriminator(ndf=ndf)
    vnb = nb.init({"params": jax.random.PRNGKey(0)}, x)
    results["no_bn_ms"] = timed_fwd_bwd(nb, vnb, False, True) * 1e3

    sn = SNVideoDiscriminator(ksize=4, ndf=ndf)
    vsn = sn.init({"params": jax.random.PRNGKey(0)}, x)
    results["sn_ms"] = timed_fwd_bwd(sn, vsn, ["spectral"], True) * 1e3

    results = {k: round(v, 3) for k, v in results.items()}
    results["stats_pass_cost_ms"] = round(
        results["train_bn_ms"] - results["eval_bn_ms"], 3)
    results["bn_total_cost_ms"] = round(
        results["train_bn_ms"] - results["no_bn_ms"], 3)
    results["backend"] = jax.default_backend()
    results["batch_size"] = B
    print(json.dumps(results))


if __name__ == "__main__":
    main()
