"""Pallas TPU kernel: the full GRU motion recurrence fused into one kernel.

The baseline MoCoGAN motion sampler runs T sequential GRUCell steps (reference
models/mocogan.py:217-229). Fused here: hidden state and the two fused gate
matrices (D x 3D) stay in VMEM across all T steps; per step the kernel issues two
GEMMs (input and hidden projections, torch gate ordering [r | z | n]) plus VPU
gate math, and writes one (T, B, D) trajectory to HBM.

Gate semantics match ganode_tpu.nn.layers.GRUCell (torch parity-tested):
    r = sigmoid(gi_r + gh_r); z = sigmoid(gi_z + gh_z)
    n = tanh(gi_n + r * gh_n); h' = (1-z) n + z h

Zero-padding note: the lane padding of D to 128 stays self-consistent only for
the n/h lanes (sigmoid(0)=0.5 mixes zeros with zeros), so padded lanes of h
remain 0 through every step: h'_pad = (1-z)*tanh(0 + r*0) + z*0 = 0.

Backward: rematerialized through the identical pure-JAX scan.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_rk4 import LANE, _pad_to


def reference_gru_motion(h0, e, wi, wh, bi, bh):
    """Pure-JAX ground truth: scan the torch-semantics GRU over noise e (T, B, D).
    Returns trajectory (T, B, D) of h_1..h_T."""
    d = h0.shape[-1]

    def step(h, e_t):
        gi = e_t @ wi + bi
        gh = h @ wh + bh
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h1 = (1.0 - z) * n + z * h
        return h1, h1

    _, hs = jax.lax.scan(step, h0, e)
    return hs


def _gru_kernel(n_steps: int, d: int, dp: int,
                h0_ref, e_ref, wi_ref, wh_ref, bi_ref, bh_ref, out_ref):
    wi = wi_ref[:]
    wh = wh_ref[:]
    bi = bi_ref[:]
    bh = bh_ref[:]
    h = h0_ref[:]

    for t in range(n_steps):
        gi = jnp.dot(e_ref[t], wi, preferred_element_type=jnp.float32) + bi
        gh = jnp.dot(h, wh, preferred_element_type=jnp.float32) + bh
        r = jax.nn.sigmoid(gi[:, :dp] + gh[:, :dp])
        z = jax.nn.sigmoid(gi[:, dp:2 * dp] + gh[:, dp:2 * dp])
        n = jnp.tanh(gi[:, 2 * dp:] + r * gh[:, 2 * dp:])
        h = (1.0 - z) * n + z * h
        out_ref[t] = h


def _pad_gates(w, d, dp):
    """(in, 3d) -> (in_pad, 3*dp) keeping the [r | z | n] block layout."""
    blocks = jnp.split(w, 3, axis=-1)
    return jnp.concatenate([_pad_to(b, dp, -1) for b in blocks], axis=-1)


def _fused_forward(h0, e, wi, wh, bi, bh, *, interpret):
    # the kernel computes in f32 regardless of the ambient dtype (x64 mode etc.)
    h0, e, wi, wh, bi, bh = (jnp.asarray(a, jnp.float32)
                             for a in (h0, e, wi, wh, bi, bh))
    t, b, d = e.shape
    dp = max(LANE, ((d + LANE - 1) // LANE) * LANE)
    bt = max(8, ((b + 7) // 8) * 8)

    h0p = _pad_to(_pad_to(h0, bt, 0), dp, 1)
    ep = _pad_to(_pad_to(e, bt, 1), dp, 2)
    wip = _pad_to(_pad_gates(wi, d, dp), dp, 0)
    whp = _pad_to(_pad_gates(wh, d, dp), dp, 0)
    bip = _pad_gates(bi.reshape(1, -1), d, dp)
    bhp = _pad_gates(bh.reshape(1, -1), d, dp)

    out = pl.pallas_call(
        partial(_gru_kernel, t, d, dp),
        out_shape=jax.ShapeDtypeStruct((t, bt, dp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(h0p, ep, wip, whp, bip, bhp)
    return out[:, :b, :d]


@partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_gru_motion(h0, e, wi, wh, bi, bh, interpret: bool = False):
    """T-step GRU recurrence fused in one Pallas TPU kernel.

    h0: (B, D) initial state; e: (T, B, D) per-step noise; wi/wh: (D, 3D)
    fused gate weights (torch ordering); bi/bh: (3D,). Returns (T, B, D).
    """
    return _fused_forward(h0, e, wi, wh, bi, bh, interpret=interpret)


def _fwd(h0, e, wi, wh, bi, bh, interpret):
    out = _fused_forward(h0, e, wi, wh, bi, bh, interpret=interpret)
    return out, (h0, e, wi, wh, bi, bh)


def _bwd(interpret, residuals, g):
    h0, e, wi, wh, bi, bh = residuals
    out, vjp = jax.vjp(reference_gru_motion, h0, e, wi, wh, bi, bh)
    return vjp(jnp.asarray(g, out.dtype))


fused_gru_motion.defvjp(_fwd, _bwd)
