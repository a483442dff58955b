"""Mixture-of-experts ODE vector field — the expert-parallel (EP) object.

The reference has no mixture-of-experts anywhere (SURVEY.md §2.2: no
parallelism at all), so this is new capability, not a port: the motion ODE's
RHS f(y) becomes a *gated mixture* of E independent tanh-MLP experts,

    f(y) = sum_e softmax(gate(y))_e * f_e(y),
    f_e  = Linear(d, h) -> tanh -> Linear(h, d)   (each expert is the
           reference field geometry, models/mocogan_ode.py:10-14)

which both widens the dynamics family (piecewise-specialized flows with a
smooth learned partition of state space) and gives expert parallelism a real
object to shard.

TPU-native formulation (GShard-style dense dispatch): expert parameters are
stacked on a leading E axis — ``expert_w1 (E, d, h)`` etc. — and the forward
is three einsums over that axis. Sharding the stacked parameters over an
'expert' mesh axis (``parallel.shard_params_ep``) makes GSPMD compute each
expert's branch on the device that owns it and reduce the gated combine with
one ``psum`` over the axis; no hand-written all_to_all is needed at these
state sizes (the y activations are (B, 16) — bytes, not megabytes, so
replicating them over the expert axis is the right layout; the *parameters
and their optimizer moments* are what EP shards).

Gating is dense-softmax by default: inside an ODE solve the RHS must stay
continuous in y (top-k routing makes f piecewise-discontinuous, which
fixed-grid solvers tolerate but adaptive controllers thrash on). ``top_k > 0``
is available for the sparse variant and is exact for fixed-grid methods.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class MoEField(nn.Module):
    """Gated mixture of E tanh-MLP vector fields over (B, dim) states.

    Dense dispatch: every expert runs on its shard of the stacked weights for
    the full batch; the combine weights zero out non-selected experts when
    ``top_k`` routing is on. Output shape == input shape (an ODE RHS).
    """

    dim: int
    dim_hidden: int
    n_experts: int = 4
    top_k: int = 0  # 0 = dense softmax mixture (smooth); k>0 = sparse top-k

    @nn.compact
    def __call__(self, y):
        e, d, h = self.n_experts, self.dim, self.dim_hidden
        # per-expert fan-in init: variance scaling over (in=-2, out=-1) with the
        # expert axis as a batch axis, matching Dense's lecun_normal per expert
        stacked_init = nn.initializers.variance_scaling(
            1.0, "fan_in", "truncated_normal", in_axis=-2, out_axis=-1,
            batch_axis=(0,))
        w1 = self.param("expert_w1", stacked_init, (e, d, h))
        b1 = self.param("expert_b1", nn.initializers.zeros, (e, h))
        w2 = self.param("expert_w2", stacked_init, (e, h, d))
        b2 = self.param("expert_b2", nn.initializers.zeros, (e, d))

        logits = nn.Dense(e, name="gate")(y)                    # (B, E)
        if self.top_k and self.top_k < e:
            kth = jnp.sort(logits, axis=-1)[..., -self.top_k][..., None]
            logits = jnp.where(logits >= kth, logits, -jnp.inf)
        gates = jax.nn.softmax(logits, axis=-1)                 # (B, E)

        # dense dispatch: (B,d) x (E,d,h) -> (E,B,h); combine contracts E
        hidden = jnp.tanh(jnp.einsum("bd,edh->ebh", y, w1) + b1[:, None, :])
        out = jnp.einsum("ebh,ehd->ebd", hidden, w2) + b2[:, None, :]
        return jnp.einsum("ebd,be->bd", out, gates)
