"""GAN loss menu: BCE-with-logits (the reference's default,
mnist_moco_ode.py:89,126-128), Wasserstein (torchgan semantics used by the wgan
variant, mnist_moco_ode_wgan.py:96-98), hinge, and the WGAN-GP gradient penalty
(new — the north-star stabilization for the variant the reference could not train).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_logits(logits, target: float):
    """Mean binary cross-entropy with logits against a constant target."""
    # numerically stable: max(x,0) - x*z + log(1+exp(-|x|))
    x = logits
    z = target
    return jnp.mean(jnp.maximum(x, 0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x))))


def d_loss_bce(real_logits, fake_logits):
    """BCE(pr, 1) + BCE(pf, 0) — the reference discriminator loss."""
    return bce_logits(real_logits, 1.0) + bce_logits(fake_logits, 0.0)


def g_loss_bce(fake_logits):
    """BCE(pf, 1) — the reference generator loss."""
    return bce_logits(fake_logits, 1.0)


def d_loss_wasserstein(real_logits, fake_logits):
    """mean(fake) - mean(real) (torchgan WassersteinDiscriminatorLoss)."""
    return jnp.mean(fake_logits) - jnp.mean(real_logits)


def g_loss_wasserstein(fake_logits):
    """-mean(fake) (torchgan WassersteinGeneratorLoss)."""
    return -jnp.mean(fake_logits)


def d_loss_hinge(real_logits, fake_logits):
    return jnp.mean(jax.nn.relu(1.0 - real_logits)) + jnp.mean(jax.nn.relu(1.0 + fake_logits))


def g_loss_hinge(fake_logits):
    return -jnp.mean(fake_logits)


LOSSES = {
    "bce": (d_loss_bce, g_loss_bce),
    "wasserstein": (d_loss_wasserstein, g_loss_wasserstein),
    "hinge": (d_loss_hinge, g_loss_hinge),
}


def gradient_penalty(d_apply, real, fake, key, *, batch_axes: int = 1):
    """WGAN-GP penalty: E[(||grad_x D(x_hat)||_2 - 1)^2] on straight-line
    interpolates x_hat between real and fake samples.

    ``d_apply`` maps a batch to logits; ``batch_axes`` is how many leading axes
    index independent samples (1 for images/videos with a plain batch axis).
    """
    shape = (real.shape[0],) + (1,) * (real.ndim - batch_axes)
    eps = jax.random.uniform(key, shape, dtype=real.dtype)
    x_hat = eps * real + (1.0 - eps) * fake

    def scalar_d(x):
        return jnp.sum(d_apply(x))

    grads = jax.grad(scalar_d)(x_hat)
    grads = grads.reshape(real.shape[0], -1)
    norms = jnp.sqrt(jnp.sum(jnp.square(grads), axis=1) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)


def r1_penalty(d_apply, real):
    """R1 regularization: (1/2) E[||grad_x D(x)||^2] on REAL samples only
    (Mescheder et al., "Which Training Methods for GANs do actually
    Converge?", ICML 2018 — the StyleGAN-family zero-centered penalty).

    Cheaper than WGAN-GP (no interpolates, one batch instead of three in the
    double-backward) and pairs with saturating losses (bce/hinge), where the
    WGAN-GP unit-norm target is the wrong fixed point: R1's zero-centered
    gradient target is what makes the (real-data) equilibrium locally
    convergent. New capability — the reference has no D regularizer at all.
    """
    def scalar_d(x):
        return jnp.sum(d_apply(x))

    grads = jax.grad(scalar_d)(real)
    grads = grads.reshape(real.shape[0], -1)
    return 0.5 * jnp.mean(jnp.sum(jnp.square(grads), axis=1))
