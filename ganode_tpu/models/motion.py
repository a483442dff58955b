"""Motion-latent samplers: the variant point of the MoCoGAN family.

The reference implements five variants as subclass overrides of
``VideoGenerator.sample_z_m`` (reference models/mocogan.py:217-229 for the GRU
baseline; models/mocogan_ode.py:133-147, mocogan_sde.py:50-62, mocogan_cde.py:59-82,
mocogan_ode_rnn.py:40-53). Here each is a small flax module with one contract:

    sampler(n, video_len, train=...) -> z_motion of shape (n, video_len, dim)

drawing its randomness from the 'sample' RNG stream. All time recursion is
``lax.scan`` (GRU, ODE-RNN) or a solver call (ODE/SDE/CDE) — XLA sees one fused
loop per sampler, and the batch axis stays free for data-parallel sharding.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .. import ode
from ..nn.layers import GRUCell, MLP, WarmupMLP


class MotionGRU(nn.Module):
    """Baseline MoCoGAN recurrence: h_0 ~ N(0,I); h_t = GRU(e_t, h_{t-1}) with
    fresh per-step noise e_t ~ N(0,I); output [h_1..h_T]
    (reference models/mocogan.py:217-229,297-301).

    ``use_pallas=True`` runs the whole recurrence inside one fused Pallas TPU
    kernel (ganode_tpu.ops.fused_gru_motion) instead of a lax.scan.
    """

    dim: int
    use_pallas: bool = False

    @nn.compact
    def __call__(self, n: int, video_len: int, *, train: bool = True):
        key = self.make_rng("sample")
        k_h0, k_e = jax.random.split(key)
        h0 = jax.random.normal(k_h0, (n, self.dim))
        e = jax.random.normal(k_e, (video_len, n, self.dim))

        cell = GRUCell(self.dim, name="gru")
        if self.use_pallas and not self.is_initializing():
            from ..ops import fused_gru_motion
            p = _get_params(self, "gru")
            hs = fused_gru_motion(h0, e, p["wi"], p["wh"], p["bi"], p["bh"],
                                  jax.default_backend() != "tpu")
        else:
            hs = _manual_scan(cell, h0, e)
        return jnp.transpose(hs, (1, 0, 2))  # (n, T, dim)


def _manual_scan(cell, h0, e):
    """Scan a GRU cell whose params are already materialized.

    flax's nn.scan lifts module params; for a single cell reused across steps the
    simpler route is: force parameter creation with one call, then scan the pure
    function. During linen init (params being created) we fall back to a Python
    loop so parameter creation happens outside lax.scan tracing.
    """
    if cell.is_initializing():
        hs = []
        h = h0
        for t in range(e.shape[0]):
            h = cell(h, e[t])
            hs.append(h)
        return jnp.stack(hs)

    def step(h, e_t):
        h1 = cell(h, e_t)
        return h1, h1

    _, hs = jax.lax.scan(step, h0, e)
    return hs


class MotionODE(nn.Module):
    """Neural-ODE motion: x ~ N(0,I) -> warm-up MLP -> odeint(f, x, linspace(0,1,T))
    with f = Linear(d,h)->tanh->Linear(h,d), autonomous
    (reference models/mocogan_ode.py:114-147; rk4, 60 NFE at T=16)."""

    dim: int
    dim_hidden: int | None = None
    use_warmup: bool = True
    method: str = "rk4"          # any fixed-grid method, or 'dopri5' (adaptive)
    steps_per_interval: int = 1
    adjoint: str = "checkpoint"  # 'checkpoint' | 'backsolve'
    # adaptive (dopri5) tolerances — the north-star WGAN-GP config solves its
    # motion latent adaptively (BASELINE.md)
    rtol: float = 1e-5
    atol: float = 1e-6
    # Run the whole rk4 solve in one fused Pallas TPU kernel
    # (ganode_tpu.ops.fused_rk4_motion; ~5x over the XLA scan on v5e).
    use_pallas: bool = False

    @nn.compact
    def __call__(self, n: int, video_len: int, *, train: bool = True):
        h = self.dim_hidden or self.dim
        x = jax.random.normal(self.make_rng("sample"), (n, self.dim))
        if self.use_warmup:
            x = WarmupMLP(self.dim)(x)

        field = MLP((h, self.dim), activation=jnp.tanh, name="ode_fn")
        if self.is_initializing():
            _ = field(x)  # materialize params outside the solver scan

        ts = jnp.linspace(0.0, 1.0, video_len)
        if (self.use_pallas and self.method == "rk4"
                and self.steps_per_interval == 1
                and self.adjoint == "checkpoint"
                and not self.is_initializing()):
            from ..ops import fused_rk4_motion
            p = _get_params(self, "ode_fn")
            zs = fused_rk4_motion(
                x, p["Dense_0"]["kernel"], p["Dense_0"]["bias"],
                p["Dense_1"]["kernel"], p["Dense_1"]["bias"], ts,
                jax.default_backend() != "tpu")
            return jnp.transpose(zs, (1, 0, 2))
        params = {"field": _get_params(self, "ode_fn")}
        rhs = lambda t, y, p: field.apply({"params": p["field"]}, y)
        if self.method == "dopri5":
            zs = ode.odeint_adaptive_adjoint(rhs, x, ts, params,
                                             self.rtol, self.atol)
        elif self.adjoint == "backsolve":
            zs = ode.odeint_backsolve(rhs, x, ts, params, self.method,
                                      self.steps_per_interval)
        else:
            zs = ode.odeint(rhs, x, ts, params, method=self.method,
                            steps_per_interval=self.steps_per_interval)
        return jnp.transpose(zs, (1, 0, 2))  # (n, T, dim)


def _get_params(parent: nn.Module, child_name: str):
    """Fetch an already-created child's params from the live scope so the solver
    can close over them differentiably."""
    return parent.scope.get_variable("params", child_name)


class MotionSDE(nn.Module):
    """Neural-SDE motion: Ito diagonal noise, Euler-Maruyama with dt=2.5e-2 —
    40 internal steps per unit time (reference models/mocogan_sde.py:6-62).

    ``method`` selects the stepper: 'euler' (reference parity), 'milstein',
    'reversible_heun' (higher weak accuracy at the same per-step cost), or
    'reversible_heun_adjoint' (same scheme with the O(1)-memory
    trajectory-exact backward pass of arXiv:2105.13493)."""

    dim: int
    dim_hidden: int | None = None
    use_warmup: bool = True
    dt: float = 2.5e-2
    method: str = "euler"

    @nn.compact
    def __call__(self, n: int, video_len: int, *, train: bool = True):
        h = self.dim_hidden or self.dim
        k_x, k_path = jax.random.split(self.make_rng("sample"))
        x = jax.random.normal(k_x, (n, self.dim))
        if self.use_warmup:
            x = WarmupMLP(self.dim)(x)

        drift = MLP((h, self.dim), activation=jnp.tanh, name="drift_fn")
        diffusion = MLP((h, self.dim), activation=jnp.tanh, name="diffusion_fn")
        if self.is_initializing():
            _ = drift(x), diffusion(x)

        ts = np.linspace(0.0, 1.0, video_len)
        params = {"f": _get_params(self, "drift_fn"),
                  "g": _get_params(self, "diffusion_fn")}
        # UNBOUND twins for the solver's vector fields: the bound `drift`/
        # `diffusion` instances hold the live compact scope (traced params),
        # and a custom_vjp backward pass (reversible_heun_adjoint) re-invokes
        # these callables in a different trace, where captured scope tracers
        # cannot be lowered; parent=None makes .apply a pure function of the
        # explicit params pytree
        drift_pure = MLP((h, self.dim), activation=jnp.tanh, parent=None)
        diffusion_pure = MLP((h, self.dim), activation=jnp.tanh, parent=None)
        f_fn = lambda t, y, p: drift_pure.apply({"params": p["f"]}, y)       # noqa: E731
        g_fn = lambda t, y, p: diffusion_pure.apply({"params": p["g"]}, y)   # noqa: E731
        if self.method == "reversible_heun_adjoint":
            # O(1)-memory trajectory-exact adjoint (ode.sde docstring;
            # arXiv:2105.13493) — config-reachable via
            # --set motion_method=reversible_heun_adjoint
            zs = ode.sdeint_reversible_adjoint(
                f_fn, g_fn, x, ts, k_path, params, dt=self.dt)
        else:
            zs = ode.sdeint(
                f_fn, g_fn, x, ts, k_path, params, dt=self.dt,
                method=self.method,
            )
        return jnp.transpose(zs, (1, 0, 2))


class MotionCDE(nn.Module):
    """Neural-CDE motion: a 2-D control path (t, per-frame noise) is spline-
    interpolated (Hermite, backward differences); the hidden state follows
    dz = f(z) dX with f: R^h -> R^{h x 2}, z0 = init_net(X(t_0))
    (reference models/mocogan_cde.py:13-82). Output dim == hidden dim ==
    dim_z_motion; the reference additionally requires dim == video_len for its
    final reshape — here the output is simply (n, T, dim) with no such coupling.
    """

    dim: int
    cde_input_dim: int = 2
    field_width: int = 128
    method: str = "rk4"

    @nn.compact
    def __call__(self, n: int, video_len: int, *, train: bool = True):
        noise = jax.random.normal(self.make_rng("sample"), (n, video_len))
        ts = jnp.arange(video_len, dtype=jnp.float32)
        t_path = jnp.broadcast_to(ts, (n, video_len))
        path = jnp.stack([t_path, noise], axis=-1)  # (n, T, 2)
        spline = ode.hermite_cubic_coefficients(path, ts)

        init_net = MLP((64, self.dim), activation=lambda x: nn.leaky_relu(x, 0.2),
                       activate_final=True, name="init_net")
        z0 = init_net(spline.evaluate(ts[0]))

        # matrix field: Linear(h,128) -> relu -> Linear(128, h*2) -> tanh -> (h,2)
        field = MLP((self.field_width, self.dim * self.cde_input_dim),
                    activation=nn.relu, name="cde_fn")
        if self.is_initializing():
            _ = field(z0)

        params = _get_params(self, "cde_fn")

        def mat_field(t, z, p):
            out = jnp.tanh(field.apply({"params": p}, z))
            return out.reshape(z.shape[:-1] + (self.dim, self.cde_input_dim))

        zs = ode.cdeint(spline, z0, mat_field, ts, args=params, method=self.method)
        return jnp.transpose(zs, (1, 0, 2))


class MotionMoEODE(nn.Module):
    """Mixture-of-experts Neural-ODE motion — new capability (no reference
    counterpart; SURVEY.md §2.2 records the reference has no MoE anywhere) and
    the expert-parallel object: the RHS is a smooth gated mixture of
    ``n_experts`` tanh-MLP fields (nn/moe.py), whose stacked parameters shard
    over an 'expert' mesh axis via ``parallel.shard_params_ep``.

    Same solve contract as MotionODE: x ~ N(0,I) -> warm-up MLP ->
    odeint(f, x, linspace(0,1,T)).
    """

    dim: int
    dim_hidden: int | None = None
    n_experts: int = 4
    top_k: int = 0               # 0 = dense softmax mixture (smooth field)
    use_warmup: bool = True
    method: str = "rk4"
    steps_per_interval: int = 1
    adjoint: str = "checkpoint"  # 'checkpoint' | 'backsolve'
    rtol: float = 1e-5
    atol: float = 1e-6

    @nn.compact
    def __call__(self, n: int, video_len: int, *, train: bool = True):
        from ..nn.moe import MoEField

        h = self.dim_hidden or self.dim
        x = jax.random.normal(self.make_rng("sample"), (n, self.dim))
        if self.use_warmup:
            x = WarmupMLP(self.dim)(x)

        field = MoEField(dim=self.dim, dim_hidden=h, n_experts=self.n_experts,
                         top_k=self.top_k, name="moe_fn")
        if self.is_initializing():
            _ = field(x)

        ts = jnp.linspace(0.0, 1.0, video_len)
        params = {"field": _get_params(self, "moe_fn")}
        rhs = lambda t, y, p: field.apply({"params": p["field"]}, y)
        if self.method == "dopri5":
            zs = ode.odeint_adaptive_adjoint(rhs, x, ts, params,
                                             self.rtol, self.atol)
        elif self.adjoint == "backsolve":
            zs = ode.odeint_backsolve(rhs, x, ts, params, self.method,
                                      self.steps_per_interval)
        else:
            zs = ode.odeint(rhs, x, ts, params, method=self.method,
                            steps_per_interval=self.steps_per_interval)
        return jnp.transpose(zs, (1, 0, 2))  # (n, T, dim)


class MotionODERNN(nn.Module):
    """ODE-RNN motion: per frame, evolve the hidden state by one [0,1] ODE solve,
    then apply a GRU update with fresh noise (reference
    models/mocogan_ode_rnn.py:40-53; torchdiffeq rk4 on t=[0,1] is one RK4 step).
    """

    dim: int
    dim_hidden: int | None = None
    method: str = "rk4"
    solve_steps: int = 1

    @nn.compact
    def __call__(self, n: int, video_len: int, *, train: bool = True):
        h_dim = self.dim_hidden or self.dim
        key = self.make_rng("sample")
        k_h0, k_e = jax.random.split(key)
        h0 = jax.random.normal(k_h0, (n, self.dim))
        e = jax.random.normal(k_e, (video_len, n, self.dim))

        field = MLP((h_dim, self.dim), activation=jnp.tanh, name="ode_fn")
        cell = GRUCell(self.dim, name="gru")
        if self.is_initializing():
            _ = cell(h0, e[0])
            _ = field(h0)
            hs = []
            h = h0
            for t in range(video_len):
                h = cell(h, e[t])
                hs.append(h)
            return jnp.transpose(jnp.stack(hs), (1, 0, 2))

        fparams = _get_params(self, "ode_fn")

        def step(h, e_t):
            h_prime = ode.odeint_final(
                lambda t, y, p: field.apply({"params": p}, y),
                h, 0.0, 1.0, fparams, method=self.method, num_steps=self.solve_steps,
            )
            h1 = cell(h_prime, e_t)
            return h1, h1

        _, hs = jax.lax.scan(step, h0, e)
        return jnp.transpose(hs, (1, 0, 2))


MOTION_SAMPLERS: dict[str, Callable[..., nn.Module]] = {
    "gru": MotionGRU,
    "ode": MotionODE,
    "sde": MotionSDE,
    "cde": MotionCDE,
    "ode_rnn": MotionODERNN,
    "moe_ode": MotionMoEODE,
}


def make_motion_sampler(kind: str, dim: int, **kwargs) -> nn.Module:
    if kind not in MOTION_SAMPLERS:
        raise ValueError(f"unknown motion sampler {kind!r}; choose from {sorted(MOTION_SAMPLERS)}")
    return MOTION_SAMPLERS[kind](dim=dim, **kwargs)
