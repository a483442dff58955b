"""Alternating-Adam GAN training as one jitted, donate-able step function.

Rebuilds the reference's inline training loop (reference mnist_moco_ode.py:111-163):
per step, ``d_iters`` updates of the image and video discriminators on fresh real
batches against no-grad generator samples, then one generator update through both
discriminators — here expressed as a single pure function

    train_step(state, images, videos, key) -> (state', metrics)

with images (d_iters, B, H, W, C) and videos (d_iters, B, T, H, W, C). The whole
step — including every ODE/SDE/CDE solve — compiles to one XLA program; batch
semantics match the reference:

* generator samples inside D updates are ``stop_gradient``-ed (torch ``no_grad``)
  but still refresh the generator's BatchNorm batch stats, as train-mode torch
  BN does under no_grad;
* discriminator BN stats advance on real and fake passes separately, and again
  during the G step (train-mode D in the reference's G update);
* optimizer = Adam(lr 2e-4, betas (0.5, 0.999)) with torch-style additive weight
  decay 1e-5 (decay added to the gradient BEFORE the moment update, matching
  torch.optim.Adam(weight_decay=...), not decoupled AdamW);
* optional parameter noise after each update (reference
  mnist_moco_ode_noise.py:31-35 / _wgan.py) and WGAN-GP (new).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from .diffaug import ada_update, diff_augment, parse_policy
from .losses import LOSSES, gradient_penalty, r1_penalty
from .state import GANState, NetState


def reference_adam(lr: float = 2e-4, b1: float = 0.5, b2: float = 0.999,
                   weight_decay: float = 1e-5) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, betas, weight_decay) semantics."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.adam(lr, b1=b1, b2=b2))
    return optax.chain(*parts)


def _add_param_noise(params, key, sigma: float):
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, len(leaves))
    return treedef.unflatten([
        p + sigma * jax.random.normal(k, p.shape, p.dtype)
        for p, k in zip(leaves, keys)
    ])


@dataclasses.dataclass
class GANTrainer:
    """Builds init/step functions for the alternating GAN loop.

    gen: VideoGenerator module; dis_img / dis_vid: discriminator modules.
    """

    gen: nn.Module
    dis_img: nn.Module
    dis_vid: nn.Module
    batch_size: int = 32
    d_iters: int = 2
    loss: str = "bce"
    lr: float = 2e-4
    betas: Tuple[float, float] = (0.5, 0.999)
    weight_decay: float = 1e-5
    param_noise_sigma: float = 0.0
    gp_weight: float = 0.0
    # R1 zero-centered gradient penalty on real samples (Mescheder et al.
    # 2018; losses.r1_penalty). 0 = off. Pairs with bce/hinge, where WGAN-GP's
    # unit-norm target is the wrong fixed point.
    r1_weight: float = 0.0
    # EMA of generator params (0 = off). Sampling helpers prefer the EMA
    # weights in eval mode; the raw params keep training unchanged.
    ema_decay: float = 0.0
    # Run real and fake through ONE concatenated discriminator pass (batch 2B)
    # instead of two B-sized passes. Doubles the GEMM batch of every D conv —
    # a measured TPU throughput win at the parity batch — at a documented
    # semantic delta from the reference: train-mode BatchNorm statistics are
    # computed over the combined real+fake batch (the reference normalizes
    # real and fake separately, reference mnist_moco_ode.py:117-131), and
    # spectral-norm power iteration advances once per loss instead of twice.
    # Default False = reference semantics.
    fused_real_fake: bool = False
    # DiffAugment policy (arXiv:2006.10738), e.g. "color,translation,cutout":
    # every discriminator input — real and fake, D and G updates alike — passes
    # through the same keyed differentiable transform, so D cannot overfit the
    # finite real set and the augmentation gradient reaches G. Draws are
    # per-clip (shared across frames). "" = off (reference semantics: the
    # reference never augments D inputs). See train/diffaug.py.
    diffaug: str = ""
    # Adaptive DiffAugment (ADA, arXiv:2006.06676): when > 0, the diffaug
    # policy is applied per sample with a learned probability p (one per
    # discriminator, carried in GANState.ada) driven by an integral controller
    # toward E[sign(D(aug(real)))] = ada_target (0.6 is the paper's default).
    # Requires a non-empty diffaug policy. 0 = fixed-p DiffAugment (p=1).
    ada_target: float = 0.0
    # controller increment per D update; p traverses [0, ada_p_max] in
    # p_max/step updates (the paper's 500k-image constant = batch/500_000).
    ada_step: float = 5e-4
    ada_p_max: float = 0.8

    def __post_init__(self):
        if self.loss not in LOSSES:
            raise ValueError(f"unknown loss {self.loss!r}; choose from {sorted(LOSSES)}")
        self.d_loss_fn, self.g_loss_fn = LOSSES[self.loss]
        self.tx = reference_adam(self.lr, *self.betas, self.weight_decay)
        self._diffaug_ops = parse_policy(self.diffaug)  # validates eagerly
        if self.ada_target > 0 and not self._diffaug_ops:
            raise ValueError("ada_target > 0 needs a non-empty diffaug policy")

    # ----------------------------------------------------------- state utils
    @staticmethod
    def _vars_of(net: NetState):
        v = {"params": net.params, "batch_stats": net.batch_stats}
        if net.spectral is not None:
            v["spectral"] = net.spectral
        return v

    @staticmethod
    def _mutable_of(net: NetState):
        return ["batch_stats", "spectral"] if net.spectral is not None \
            else ["batch_stats"]

    # ------------------------------------------------------------------ init
    def init_state(self, key) -> GANState:
        k_gen, k_sample, k_img, k_vid = jax.random.split(key, 4)
        gen_vars = self.gen.init({"params": k_gen, "sample": k_sample}, 2)

        gen_mutable = ["batch_stats"] + (
            ["spectral"] if "spectral" in gen_vars else [])
        (videos, _), _ = self.gen.apply(
            gen_vars, 2, method="sample_videos",
            rngs={"sample": k_sample}, mutable=gen_mutable)
        (images, _), _ = self.gen.apply(
            gen_vars, 2, method="sample_images",
            rngs={"sample": k_sample}, mutable=gen_mutable)

        img_vars = self.dis_img.init({"params": k_img}, images)
        vid_vars = self.dis_vid.init({"params": k_vid}, videos)

        def net_state(variables):
            return NetState(
                params=variables["params"],
                batch_stats=variables.get("batch_stats", {}),
                opt_state=self.tx.init(variables["params"]),
                spectral=variables.get("spectral", None),
            )

        return GANState(
            gen=net_state(gen_vars),
            dis_img=net_state(img_vars),
            dis_vid=net_state(vid_vars),
            step=jnp.asarray(0, jnp.int32),
            key=key,
            ema_params=(jax.tree.map(jnp.asarray, gen_vars["params"])
                        if self.ema_decay > 0 else None),
            ada=({"p_img": jnp.asarray(0.0, jnp.float32),
                  "p_vid": jnp.asarray(0.0, jnp.float32)}
                 if self.ada_target > 0 else None),
        )

    def eval_gen_variables(self, state: GANState) -> dict:
        """Generator variables for eval-mode sampling: the EMA weights when
        enabled (the stabilized view of training), raw params otherwise."""
        params = state.ema_params if state.ema_params is not None \
            else state.gen.params
        v = {"params": params, "batch_stats": state.gen.batch_stats}
        if state.gen.spectral is not None:
            v["spectral"] = state.gen.spectral
        return v

    # ------------------------------------------------------------- internals
    def _sample(self, net: NetState, key, n: int, what: str):
        """Generator sample in train mode; returns (tensor, refreshed NetState)."""
        (out, _), mut = self.gen.apply(
            self._vars_of(net), n, method=what, rngs={"sample": key},
            mutable=self._mutable_of(net))
        return out, net.replace(batch_stats=mut["batch_stats"],
                                spectral=mut.get("spectral", net.spectral))

    def _d_forward(self, mod, params, extras: dict, x, key):
        """extras: {'batch_stats': ..., 'spectral': ...(optional)}. Returns
        (logits, refreshed extras) — spectral-normed discriminators need their
        power-iteration state threaded exactly like BatchNorm stats."""
        variables = {"params": params, **extras}
        (logits, _), mut = mod.apply(
            variables, x, mutable=list(extras.keys()),
            rngs={"noise": key})
        return logits, {**extras, **mut}

    @staticmethod
    def _extras_of(net: NetState) -> dict:
        extras = {"batch_stats": net.batch_stats}
        if net.spectral is not None:
            extras["spectral"] = net.spectral
        return extras

    def _d_update(self, mod, d_state: NetState, real, fake, key,
                  aug_p=None) -> tuple:
        """Returns (new NetState, loss, rt) — rt = E[sign(D(real))], the ADA
        overfitting heuristic, measured on the (augmented) reals D judged."""
        k_noise_r, k_noise_f, k_gp, k_gp_noise, k_pnoise = jax.random.split(key, 5)
        if self._diffaug_ops:
            # D only ever sees augmented samples; the gradient penalty below
            # then also regularizes D on the inputs it is actually judged on.
            # fold_in (not a wider split) keeps the key stream bit-identical
            # to the no-diffaug trainer when the policy is off.
            real = diff_augment(real, jax.random.fold_in(key, 101),
                                self._diffaug_ops, aug_p)
            fake = diff_augment(fake, jax.random.fold_in(key, 102),
                                self._diffaug_ops, aug_p)

        def loss_fn(params):
            if self.fused_real_fake:
                both, ex2 = self._d_forward(
                    mod, params, self._extras_of(d_state),
                    jnp.concatenate([real, fake], axis=0), k_noise_r)
                pr, pf = both[:real.shape[0]], both[real.shape[0]:]
            else:
                pr, ex1 = self._d_forward(mod, params,
                                          self._extras_of(d_state),
                                          real, k_noise_r)
                pf, ex2 = self._d_forward(mod, params, ex1, fake, k_noise_f)
            loss = self.d_loss_fn(pr, pf)
            if self.gp_weight > 0 or self.r1_weight > 0:
                # the 'noise' rng must be supplied even in eval-style applies:
                # use_noise=True discriminators call make_rng unconditionally
                d_apply = lambda x: mod.apply(
                    {"params": params, **ex2}, x, train=False,
                    rngs={"noise": k_gp_noise})[0]
                if self.gp_weight > 0:
                    loss = loss + self.gp_weight * gradient_penalty(
                        d_apply, real, fake, k_gp)
                if self.r1_weight > 0:
                    # on the (possibly augmented) reals D actually judges
                    loss = loss + self.r1_weight * r1_penalty(d_apply, real)
            return loss, (ex2, jnp.mean(jnp.sign(pr)))

        (loss, (new_ex, rt)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(d_state.params)
        updates, new_opt = self.tx.update(grads, d_state.opt_state, d_state.params)
        new_params = optax.apply_updates(d_state.params, updates)
        if self.param_noise_sigma > 0:
            new_params = _add_param_noise(new_params, k_pnoise, self.param_noise_sigma)
        return d_state.replace(params=new_params,
                               batch_stats=new_ex["batch_stats"],
                               spectral=new_ex.get("spectral", d_state.spectral),
                               opt_state=new_opt), loss, rt

    def _g_update(self, state: GANState, key) -> tuple:
        n = self.batch_size
        k_vid, k_img, k_dv, k_di, k_pnoise = jax.random.split(key, 5)

        def loss_fn(g_params):
            g_net = state.gen.replace(params=g_params)
            fake_vid, g_net = self._sample(g_net, k_vid, n, "sample_videos")
            fake_img, g_net = self._sample(g_net, k_img, n, "sample_images")
            if self._diffaug_ops:
                # inside the loss so the augmentation gradient reaches G;
                # under ADA each branch uses its discriminator's current p
                # (G must be judged through the same view D was trained on)
                ada = state.ada or {}
                fake_vid = diff_augment(fake_vid, jax.random.fold_in(key, 201),
                                        self._diffaug_ops, ada.get("p_vid"))
                fake_img = diff_augment(fake_img, jax.random.fold_in(key, 202),
                                        self._diffaug_ops, ada.get("p_img"))
            pf_vid, dv_ex = self._d_forward(
                self.dis_vid, state.dis_vid.params,
                self._extras_of(state.dis_vid), fake_vid, k_dv)
            pf_img, di_ex = self._d_forward(
                self.dis_img, state.dis_img.params,
                self._extras_of(state.dis_img), fake_img, k_di)
            loss = self.g_loss_fn(pf_vid) + self.g_loss_fn(pf_img)
            return loss, (g_net.batch_stats, g_net.spectral, dv_ex, di_ex)

        (loss, (g_bs, g_spec, dv_ex, di_ex)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.gen.params)
        updates, new_opt = self.tx.update(grads, state.gen.opt_state, state.gen.params)
        new_params = optax.apply_updates(state.gen.params, updates)
        if self.param_noise_sigma > 0:
            new_params = _add_param_noise(new_params, k_pnoise, self.param_noise_sigma)
        gen = state.gen.replace(params=new_params, batch_stats=g_bs,
                                spectral=g_spec, opt_state=new_opt)
        dis_vid = state.dis_vid.replace(
            batch_stats=dv_ex["batch_stats"],
            spectral=dv_ex.get("spectral", state.dis_vid.spectral))
        dis_img = state.dis_img.replace(
            batch_stats=di_ex["batch_stats"],
            spectral=di_ex.get("spectral", state.dis_img.spectral))
        return state.replace(gen=gen, dis_vid=dis_vid, dis_img=dis_img), loss

    # ------------------------------------------------------------------ step
    def train_step(self, state: GANState, images, videos, key):
        """One full alternating step. images: (d_iters, B, H, W, C);
        videos: (d_iters, B, T, H, W, C); key: fresh per-step PRNG key."""
        n = self.batch_size
        dis_img_loss = dis_vid_loss = jnp.asarray(0.0)
        rt_img = rt_vid = jnp.asarray(0.0)
        # ADA (arXiv:2006.06676): each discriminator carries its own
        # augmentation probability p, nudged once per D update by the integral
        # controller on rt = E[sign(D(aug(real)))]. ada is None when disabled;
        # aug_p=None then makes _d_update bit-identical to the pre-ADA stream
        # (diff_augment draws no gate keys for p=None).
        ada = state.ada

        for i in range(self.d_iters):
            k = jax.random.fold_in(key, i)
            k_si, k_di, k_sv, k_dv = jax.random.split(k, 4)

            # image discriminator: real batch vs no-grad fake images
            fake_img, gen_net = self._sample(state.gen, k_si, n, "sample_images")
            fake_img = jax.lax.stop_gradient(fake_img)
            state = state.replace(gen=gen_net)
            new_di, dis_img_loss, rt_img = self._d_update(
                self.dis_img, state.dis_img, images[i], fake_img, k_di,
                aug_p=None if ada is None else ada["p_img"])
            state = state.replace(dis_img=new_di)
            if ada is not None:
                ada = {**ada, "p_img": ada_update(
                    ada["p_img"], rt_img, target=self.ada_target,
                    step=self.ada_step, p_max=self.ada_p_max)}

            # video discriminator: real clips vs no-grad fake videos
            fake_vid, gen_net = self._sample(state.gen, k_sv, n, "sample_videos")
            fake_vid = jax.lax.stop_gradient(fake_vid)
            state = state.replace(gen=gen_net)
            new_dv, dis_vid_loss, rt_vid = self._d_update(
                self.dis_vid, state.dis_vid, videos[i], fake_vid, k_dv,
                aug_p=None if ada is None else ada["p_vid"])
            state = state.replace(dis_vid=new_dv)
            if ada is not None:
                ada = {**ada, "p_vid": ada_update(
                    ada["p_vid"], rt_vid, target=self.ada_target,
                    step=self.ada_step, p_max=self.ada_p_max)}

        if ada is not None:
            # commit the controller state BEFORE the G update: _g_update gates
            # G's fakes with state.ada, and G must be judged through the view
            # D now trains on (the two differ by at most ada_step per iter).
            state = state.replace(ada=ada)
        state, gen_loss = self._g_update(state, jax.random.fold_in(key, 1000))
        if self.ema_decay > 0 and state.ema_params is not None:
            d = self.ema_decay
            state = state.replace(ema_params=jax.tree.map(
                lambda e, p: d * e + (1.0 - d) * p,
                state.ema_params, state.gen.params))
        state = state.replace(step=state.step + 1)
        metrics = {
            "dis_img_loss": dis_img_loss,
            "dis_vid_loss": dis_vid_loss,
            "gen_loss": gen_loss,
        }
        if ada is not None:
            # controller observability: the overfitting heuristics from the
            # last D iter and the committed augmentation probabilities
            metrics.update(rt_img=rt_img, rt_vid=rt_vid,
                           ada_p_img=ada["p_img"], ada_p_vid=ada["p_vid"])
        return state, metrics

    def jitted_step(self, donate: bool = True):
        return jax.jit(self.train_step, donate_argnums=(0,) if donate else ())
