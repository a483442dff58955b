#!/usr/bin/env python
"""Stage-2 experiment: train a small image GAN with the ODE-GAN trainer
(optimizer-as-ODE, euler/rk2/rk4 in parameter space).

Reproduces the reference's stage-2 notebook protocol
(reference stage2/test_ODE_training_with_MNIST_GAN.ipynb: MLP generator
100 -> 256 -> 512 -> 1024 -> 784 tanh, MLP discriminator with dropout-free
leaky-relu trunk here, fixed seed, euler/rk2/rk4 vs Adam comparison) as a CLI.

  python scripts/train_odegan.py --method rk4 --steps 200 --cpu

``--arch dcgan`` switches to the conv generator/discriminator pair of the
reference's CIFAR stage-2 notebook (reference
stage2/test_ODE_training_with_cifar_GAN.ipynb cell 1: DCGAN-ish G/D, euler,
dry-run smoke flag) on 32x32x3 images; ``--dry-run`` caps training to one batch
exactly like the notebook's smoke mode.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--method", default="rk4",
                   choices=["adam", "euler", "rk2", "rk4"],
                   help="'adam' is the notebook's baseline alternating-Adam "
                        "loop; the rest integrate the training ODE")
    p.add_argument("--arch", default="mlp", choices=["mlp", "dcgan"])
    p.add_argument("--dry-run", action="store_true",
                   help="one-batch smoke mode (the CIFAR notebook's dry_run)")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=0.02)
    p.add_argument("--reg", type=float, default=0.01)
    p.add_argument("--d-iter", type=int, default=1)
    p.add_argument("--seed", type=int, default=97382)  # the notebook's seed
    p.add_argument("--workdir", default="runs/odegan")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="train on synthetic blobs instead of rotated-MNIST frames")
    p.add_argument("--data", default="data/rot-mnist.npz")
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from ganode_tpu.train import ODEGANTrainer, bce_logits

    class MLPGen(nn.Module):
        @nn.compact
        def __call__(self, z):
            for w in (256, 512, 1024):
                z = nn.leaky_relu(nn.Dense(w)(z), 0.2)
            return jnp.tanh(nn.Dense(784)(z))

    class MLPDisc(nn.Module):
        @nn.compact
        def __call__(self, x):
            for w in (512, 256):
                x = nn.leaky_relu(nn.Dense(w)(x), 0.2)
            return nn.Dense(1)(x).squeeze(-1)

    class DCGANGen(nn.Module):
        """32x32x3 conv generator (the CIFAR notebook's stage-2 G)."""

        @nn.compact
        def __call__(self, z):
            h = nn.Dense(4 * 4 * 256)(z).reshape(-1, 4, 4, 256)
            # torch ConvTranspose(k=4, s=2, p=1) doubling == flax padding (2, 2)
            for feats in (128, 64):
                h = nn.relu(nn.GroupNorm(num_groups=8)(
                    nn.ConvTranspose(feats, (4, 4), strides=(2, 2),
                                     padding=((2, 2), (2, 2)))(h)))
            h = nn.ConvTranspose(3, (4, 4), strides=(2, 2),
                                 padding=((2, 2), (2, 2)))(h)
            return jnp.tanh(h)

    class DCGANDisc(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = x
            for feats in (64, 128, 256):
                h = nn.leaky_relu(
                    nn.Conv(feats, (4, 4), strides=(2, 2),
                            padding=((1, 1), (1, 1)))(h), 0.2)
            return nn.Dense(1)(h.reshape(h.shape[0], -1)).squeeze(-1)

    key = jax.random.PRNGKey(args.seed)
    if args.arch == "dcgan":
        gen, disc = DCGANGen(), DCGANDisc()
        data_shape = (32, 32, 3)
    else:
        gen, disc = MLPGen(), MLPDisc()
        data_shape = (784,)
    g_params = gen.init(key, jnp.zeros((1, 100)))["params"]
    d_params = disc.init(jax.random.fold_in(key, 1),
                         jnp.zeros((1,) + data_shape))["params"]
    all_params = {"gen": g_params, "dis_img": d_params, "dis_vid": None}

    # data in [-1, 1]
    if args.synthetic or not os.path.exists(args.data) or args.arch == "dcgan":
        rng = np.random.RandomState(0)
        n = 2048
        data = np.full((n,) + data_shape, -1.0, np.float32)
        for i in range(n):
            y, x = rng.randint(0, data_shape[0] - 8 if args.arch == "dcgan" else 20, 2)
            if args.arch == "dcgan":
                data[i, y:y + 8, x:x + 8, :] = 1.0
            else:
                img = data[i].reshape(28, 28)
                img[y:y + 8, x:x + 8] = 1.0
        data = jnp.asarray(data)
    else:
        from ganode_tpu.data import load_rotmnist
        videos, _ = load_rotmnist(args.data, train=True)
        data = jnp.asarray(videos.reshape(-1, 784) * 2.0 - 1.0)

    if args.dry_run:
        args.steps = 1

    B = args.batch_size

    def g_loss(params, key_, batch):
        z = jax.random.normal(jax.random.fold_in(key_, 1), (B, 100))
        fake = gen.apply({"params": params["gen"]}, z)
        logits = disc.apply({"params": params["dis_img"]}, fake)
        return bce_logits(logits, 1.0)

    def d_loss(params, key_, batch):
        z = jax.random.normal(jax.random.fold_in(key_, 2), (B, 100))
        fake = gen.apply({"params": params["gen"]}, z)
        pf = disc.apply({"params": params["dis_img"]}, fake)
        pr = disc.apply({"params": params["dis_img"]}, batch)
        return bce_logits(pr, 1.0) + bce_logits(pf, 0.0)

    if args.method == "adam":
        # the notebook's baseline: alternating Adam(2e-4, betas=(0.5, 0.999))
        # (reference stage2/test_ODE_training_with_MNIST_GAN.ipynb cells 3-4)
        import optax

        tx = optax.adam(2e-4, b1=0.5, b2=0.999)
        opt = {"gen": tx.init(all_params["gen"]),
               "dis_img": tx.init(all_params["dis_img"])}

        @jax.jit
        def _d_update(p, o, k_, b):
            grads = jax.grad(
                lambda dp: d_loss({**p, "dis_img": dp}, k_, b))(p["dis_img"])
            upd, o = tx.update(grads, o)
            return {**p, "dis_img": optax.apply_updates(p["dis_img"], upd)}, o

        @jax.jit
        def _g_update(p, o, k_):
            grads = jax.grad(
                lambda gp: g_loss({**p, "gen": gp}, k_, None))(p["gen"])
            upd, o = tx.update(grads, o)
            return {**p, "gen": optax.apply_updates(p["gen"], upd)}, o

        def d_step(p, k_, b):
            p, opt["dis_img"] = _d_update(p, opt["dis_img"], k_, b)
            return p

        def g_step(p, k_):
            p, opt["gen"] = _g_update(p, opt["gen"], k_)
            return p
    else:
        trainer = ODEGANTrainer(g_loss=g_loss, d_img_loss=d_loss, lr=args.lr,
                                reg=args.reg, method=args.method,
                                d_iter=args.d_iter)

        d_step = jax.jit(lambda p, k, b: trainer.step(p, k, b, model="dis_img"))
        g_step = jax.jit(lambda p, k: trainer.step(p, k, model="gen"))

    # logging losses jitted: eager apply through a remote-tunnel backend
    # dispatches thousands of tiny ops (see CLAUDE.md)
    g_loss_j = jax.jit(lambda p, k_: g_loss(p, k_, None))
    d_loss_j = jax.jit(d_loss)
    losses = []
    os.makedirs(args.workdir, exist_ok=True)
    # TensorBoard scalars, as the reference's CIFAR notebook did via
    # SummaryWriter (reference stage2/test_ODE_training_with_cifar_GAN.ipynb)
    from ganode_tpu.utils.tb import EventWriter
    tb = EventWriter(os.path.join(args.workdir, "tb"))
    for step in range(args.steps):
        k = jax.random.fold_in(key, 10_000 + step)
        idx = jax.random.randint(jax.random.fold_in(k, 0), (B,), 0, len(data))
        batch = data[idx]
        for i in range(args.d_iter):
            all_params = d_step(all_params, jax.random.fold_in(k, 100 + i), batch)
        all_params = g_step(all_params, jax.random.fold_in(k, 200))
        if step % 20 == 0:
            gl = float(g_loss_j(all_params, k))
            dl = float(d_loss_j(all_params, k, batch))
            losses.append({"step": step, "g_loss": gl, "d_loss": dl})
            tb.add_scalars({f"{args.method}/g_loss": gl,
                            f"{args.method}/d_loss": dl}, step)
            print(f"step {step}: G {gl:.4f} D {dl:.4f}", flush=True)

    tb.close()
    with open(os.path.join(args.workdir, f"losses_{args.method}.json"), "w") as f:
        json.dump(losses, f)
    print(f"done; losses -> {args.workdir}/losses_{args.method}.json")


if __name__ == "__main__":
    main()
