"""ODE-GAN: integrating GAN training dynamics as an ODE in parameter space.

Functional rebuild of the reference's ``GANODETrainer``
(reference stage2/ode_training.py:3-201, after Qin et al., "Training GANs by
solving ODEs"). The reference performs multi-stage Runge-Kutta steps by displacing
network parameters *in place* and algebraically recombining gradients so only one
parameter copy exists (comments at reference stage2/ode_training.py:109-113,
184-188). Here each step is a pure function

    new_params = step(params, loss_fn, ...)

over parameter pytrees — displaced evaluations are just loss/grad calls at
``tree_lincomb`` offsets, recombined with the *same* final algebra:

    euler:  p - lr * g1                                   (:59-82)
    rk2:    p - lr/2 * (g1 + g2),        g2 at p - lr*g1  (:84-126)
    rk4:    p - lr/6 * (g1+2g2+2g3+g4),  classic stages   (:128-201)

The discriminator regularizer (:48-57) is the ODE-GAN gradient penalty
R = ||grad_{theta_g} L_G||^2 differentiated w.r.t. the *discriminator* params,
computed here with nested jax.grad (double backward). Reference quirks preserved:

* the penalty is evaluated once at the UNDISPLACED parameters and applied at the
  end (reference evaluates calculate_reg before the first displacement);
* euler applies ``- reg * gp`` (no lr factor, :76) while rk2/rk4 apply
  ``- reg * lr * gp`` (:120, :194) — an inconsistency in the reference that golden
  tests pin down;
* generator loss closures that resample latents draw fresh noise at every RK
  stage (the reference's closures hit the global torch RNG per call) — pass a
  ``key`` and each stage uses ``fold_in(key, stage)``.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..ode.tree import tree_axpy, tree_lincomb, tree_sq_norm

# loss_fn signature: loss_fn(params, key, batch) -> scalar
LossFn = Callable[[Any, Any, Any], jnp.ndarray]


def _grad(loss_fn: LossFn, params, key, batch):
    return jax.grad(loss_fn)(params, key, batch)


def euler_step(params, loss_fn: LossFn, lr: float, key, batch=None,
               penalty_grad=None, reg: float = 0.0):
    g1 = _grad(loss_fn, params, jax.random.fold_in(key, 0), batch)
    new = tree_axpy(-lr, g1, params)
    if penalty_grad is not None:
        # reference euler: param += lr*(-grad) + reg*(-gp)  — NO lr on the penalty
        new = tree_axpy(-reg, penalty_grad, new)
    return new


def rk2_step(params, loss_fn: LossFn, lr: float, key, batch=None,
             penalty_grad=None, reg: float = 0.0):
    g1 = _grad(loss_fn, params, jax.random.fold_in(key, 0), batch)
    p1 = tree_axpy(-lr, g1, params)
    g2 = _grad(loss_fn, p1, jax.random.fold_in(key, 1), batch)
    new = tree_lincomb([-lr / 2, -lr / 2], [g1, g2], base=params)
    if penalty_grad is not None:
        new = tree_axpy(-reg * lr, penalty_grad, new)
    return new


def rk4_step(params, loss_fn: LossFn, lr: float, key, batch=None,
             penalty_grad=None, reg: float = 0.0):
    g1 = _grad(loss_fn, params, jax.random.fold_in(key, 0), batch)
    g2 = _grad(loss_fn, tree_axpy(-lr / 2, g1, params),
               jax.random.fold_in(key, 1), batch)
    g3 = _grad(loss_fn, tree_axpy(-lr / 2, g2, params),
               jax.random.fold_in(key, 2), batch)
    g4 = _grad(loss_fn, tree_axpy(-lr, g3, params),
               jax.random.fold_in(key, 3), batch)
    new = tree_lincomb([-lr / 6, -lr / 3, -lr / 3, -lr / 6], [g1, g2, g3, g4],
                       base=params)
    if penalty_grad is not None:
        new = tree_axpy(-reg * lr, penalty_grad, new)
    return new


_STEPPERS = {"euler": euler_step, "rk2": rk2_step, "rk4": rk4_step}


def discriminator_regularizer(g_loss_fn: Callable[[Any, Any], jnp.ndarray],
                              g_params, d_params, key):
    """grad_{theta_d} || grad_{theta_g} L_G(theta_g, theta_d) ||^2.

    ``g_loss_fn(g_params, d_params)`` closes over the key internally if needed.
    """
    def magnitude(d_p):
        g_grad = jax.grad(lambda g_p: g_loss_fn(g_p, d_p))(g_params)
        return tree_sq_norm(g_grad)

    return jax.grad(magnitude)(d_params)


def make_mocogan_losses(gen, dis_img, dis_vid, gen_stats, img_stats, vid_stats,
                        batch_size: int, *, loss: str = "bce"):
    """Functional loss closures wiring the full MoCoGAN triple into the ODE-GAN
    trainer — the integration the reference's GANODETrainer signature was built
    for (its ctor takes g/dImg/dVid params, reference stage2/ode_training.py:5)
    but that no committed script ever ran.

    Batch statistics are held fixed (eval-mode normalization) during the RK
    displaced evaluations: the parameter-space RK step evaluates the loss at
    four intermediate parameter points, and mutating running stats at
    displaced parameters has no well-defined reference semantics.

    Returns (g_loss, d_img_loss, d_vid_loss) with the
    ``loss(all_params, key, batch) -> scalar`` signature ODEGANTrainer expects;
    d losses take real batches (images / NTHWC videos), g_loss takes None.
    """
    from .losses import LOSSES

    d_loss_fn, g_loss_fn = LOSSES[loss]

    def _sample(params, key, what, n):
        (out, _) = gen.apply(
            {"params": params["gen"], "batch_stats": gen_stats},
            n, method=what, rngs={"sample": key}, train=False)
        return out

    def _disc(mod, params_key, stats, params, x):
        (logits, _) = mod.apply(
            {"params": params[params_key], "batch_stats": stats},
            x, train=False)
        return logits

    def g_loss(params, key, batch):
        k_v, k_i = jax.random.split(key)
        fake_vid = _sample(params, k_v, "sample_videos", batch_size)
        fake_img = _sample(params, k_i, "sample_images", batch_size)
        pf_vid = _disc(dis_vid, "dis_vid", vid_stats, params, fake_vid)
        pf_img = _disc(dis_img, "dis_img", img_stats, params, fake_img)
        return g_loss_fn(pf_vid) + g_loss_fn(pf_img)

    def d_img_loss(params, key, batch):
        fake = _sample(params, key, "sample_images", batch_size)
        pr = _disc(dis_img, "dis_img", img_stats, params, batch)
        pf = _disc(dis_img, "dis_img", img_stats, params, fake)
        return d_loss_fn(pr, pf)

    def d_vid_loss(params, key, batch):
        fake = _sample(params, key, "sample_videos", batch_size)
        pr = _disc(dis_vid, "dis_vid", vid_stats, params, batch)
        pf = _disc(dis_vid, "dis_vid", vid_stats, params, fake)
        return d_loss_fn(pr, pf)

    return g_loss, d_img_loss, d_vid_loss


@dataclasses.dataclass
class ODEGANTrainer:
    """Drop-in functional equivalent of reference GANODETrainer.

    Loss closures take (all_params, key, batch) where all_params is a dict
    {'gen': ..., 'dis_img': ..., 'dis_vid': ...}; each step updates exactly one
    entry, holding the others fixed — matching the reference's per-network
    ``step(x, model=...)`` dispatch (stage2/ode_training.py:37-46).
    """

    g_loss: LossFn
    d_img_loss: LossFn
    d_vid_loss: Optional[LossFn] = None
    lr: float = 0.02
    reg: float = 0.01
    method: str = "rk4"
    d_iter: int = 2
    g_iter: int = 1

    def __post_init__(self):
        if self.method not in _STEPPERS:
            raise ValueError(
                f"Choose method between 'euler', 'rk2' and 'rk4', not {self.method!r}")
        self._stepper = _STEPPERS[self.method]
        self.penalty = self.reg > 0

    def _sub_step(self, all_params, net: str, loss_fn: LossFn, key, batch,
                  with_penalty: bool):
        params = all_params[net]

        def net_loss(p, k, b):
            merged = dict(all_params)
            merged[net] = p
            return loss_fn(merged, k, b)

        penalty_grad = None
        if with_penalty and self.penalty:
            def g_of(g_p, d_p):
                merged = dict(all_params)
                merged["gen"] = g_p
                merged[net] = d_p
                return self.g_loss(merged, jax.random.fold_in(key, 99), None)
            penalty_grad = discriminator_regularizer(
                g_of, all_params["gen"], params, key)

        new_params = self._stepper(params, net_loss, self.lr, key, batch,
                                   penalty_grad, self.reg)
        out = dict(all_params)
        out[net] = new_params
        return out

    def step(self, all_params, key, batch=None, model: str = "gen"):
        """One RK step for the chosen network ('gen' | 'dis_img' | 'dis_vid')."""
        if model == "gen":
            return self._sub_step(all_params, "gen", self.g_loss, key, batch, False)
        if model == "dis_img":
            return self._sub_step(all_params, "dis_img", self.d_img_loss, key,
                                  batch, True)
        if model == "dis_vid":
            if self.d_vid_loss is None:
                raise ValueError("trainer built without a video discriminator loss")
            return self._sub_step(all_params, "dis_vid", self.d_vid_loss, key,
                                  batch, True)
        raise ValueError(f"model must be gen|dis_img|dis_vid, got {model!r}")
