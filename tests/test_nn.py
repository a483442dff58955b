"""Module-layer tests: GRU gate parity vs torch, spectral norm vs exact SVD,
GResBlock / ODE-GResBlock shape and gradient checks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganode_tpu.nn import (
    ConditionalNorm,
    GResBlock,
    GRUCell,
    Noise,
    ODEGResBlock,
    SNConv,
    SNDense,
    spectral_normalize,
)


def test_gru_cell_matches_torch():
    torch = pytest.importorskip("torch")
    d = 8
    cell = GRUCell(d)
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (3, d), jnp.float32)
    h = jax.random.normal(jax.random.fold_in(k, 1), (3, d), jnp.float32)
    params = cell.init(k, h, x)["params"]
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)

    f32 = lambda a: torch.tensor(np.asarray(a, np.float32))
    tcell = torch.nn.GRUCell(d, d)
    # torch weight_ih: (3d, d) rows ordered [r, z, n]; ours wi: (d, 3d) cols [r, z, n]
    with torch.no_grad():
        tcell.weight_ih.copy_(f32(params["wi"]).T)
        tcell.weight_hh.copy_(f32(params["wh"]).T)
        tcell.bias_ih.copy_(f32(params["bi"]))
        tcell.bias_hh.copy_(f32(params["bh"]))
        expected = tcell(f32(x), f32(h)).numpy()

    got = cell.apply({"params": params}, h, x)
    np.testing.assert_allclose(np.asarray(got, np.float32), expected,
                               rtol=1e-5, atol=1e-6)


def test_spectral_normalize_converges_to_top_singular_value():
    k = jax.random.PRNGKey(0)
    w = jax.random.normal(k, (16, 32))
    u = jax.random.normal(jax.random.fold_in(k, 1), (16,))
    u = u / jnp.linalg.norm(u)
    sigma, u, v = spectral_normalize(w, u, n_iter=300)
    top = jnp.linalg.svd(w, compute_uv=False)[0]
    # power iteration converges geometrically in (s2/s1)^2 — allow 1e-3
    np.testing.assert_allclose(float(sigma), float(top), rtol=1e-3)


def test_snconv_state_updates_and_bounds_norm():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    conv = SNConv(6, (3, 3))
    variables = conv.init(jax.random.PRNGKey(1), x)
    y, mutated = conv.apply(variables, x, mutable=["spectral"])
    assert y.shape == (2, 8, 8, 6)
    # u must move under power iteration
    assert not np.allclose(np.asarray(mutated["spectral"]["u"]),
                           np.asarray(variables["spectral"]["u"]))
    # eval mode: no state change requested -> apply without mutable succeeds
    y2 = conv.apply(variables, x, update_stats=False)
    assert np.all(np.isfinite(np.asarray(y2)))


def test_sndense_normalizes():
    x = jnp.eye(5)
    layer = SNDense(5, use_bias=False, n_power_iterations=50)
    variables = layer.init(jax.random.PRNGKey(0), x)
    y, _ = layer.apply(variables, x, mutable=["spectral"])
    # after normalization the top singular value of the effective matrix is ~1
    s = np.linalg.svd(np.asarray(y), compute_uv=False)[0]
    np.testing.assert_allclose(s, 1.0, rtol=1e-3)


def test_conditional_norm_shapes_and_identity_start():
    x = jax.random.normal(jax.random.PRNGKey(0), (6, 8, 8, 10))
    cond = jax.random.normal(jax.random.PRNGKey(1), (6, 96))
    norm = ConditionalNorm(10)
    variables = norm.init(jax.random.PRNGKey(2), x, cond)
    y, _ = norm.apply(variables, x, cond, mutable=["batch_stats"])
    assert y.shape == x.shape
    # gamma starts near 1, beta near 0 -> output approximately standard-normalized
    assert abs(float(jnp.mean(y))) < 0.3
    assert 0.5 < float(jnp.std(y)) < 1.5


def test_noise_layer():
    x = jnp.zeros((4, 5))
    off = Noise(use_noise=False)
    assert np.array_equal(off.apply({}, x), x)
    on = Noise(use_noise=True, sigma=0.5)
    y = on.apply({}, x, rngs={"noise": jax.random.PRNGKey(0)})
    assert float(jnp.std(y)) > 0.1


class TestGResBlock:
    def test_upsample_shapes(self):
        # the reference's __main__ smoke test: (B*T, 64, 64, 3) -> (B*T, 128, 128, 100)
        # with a repeated condition (stage1/GResBlock.py:170-186)
        bt = 8
        x = jax.random.normal(jax.random.PRNGKey(0), (bt, 16, 16, 3))
        cond = jax.random.normal(jax.random.PRNGKey(1), (bt, 96))
        block = GResBlock(out_channels=20)
        variables = block.init(jax.random.PRNGKey(2), x, cond)
        y, _ = block.apply(variables, x, cond, mutable=["batch_stats", "spectral"])
        assert y.shape == (bt, 32, 32, 20)

    def test_downsample_shapes(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 8))
        block = GResBlock(out_channels=12, upsample_factor=1, downsample_factor=2)
        variables = block.init(jax.random.PRNGKey(2), x, None)
        y, _ = block.apply(variables, x, None, mutable=["batch_stats", "spectral"])
        assert y.shape == (4, 8, 8, 12)

    def test_grads_flow(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 3))
        cond = jax.random.normal(jax.random.PRNGKey(1), (4, 96))
        block = GResBlock(out_channels=6)
        variables = block.init(jax.random.PRNGKey(2), x, cond)

        def loss(p):
            y, _ = block.apply({**variables, "params": p}, x, cond,
                               mutable=["batch_stats", "spectral"])
            return jnp.mean(y ** 2)

        g = jax.grad(loss)(variables["params"])
        assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree.leaves(g))


class TestODEGResBlock:
    def test_continuous_depth_upsample(self):
        # stage-1 notebook cell 10 geometry (shrunk): 3 -> C channels, spatial x2
        bt = 4
        x = jax.random.normal(jax.random.PRNGKey(0), (bt, 8, 8, 3))
        cond = jax.random.normal(jax.random.PRNGKey(1), (bt, 96))
        block = ODEGResBlock(in_channels=3, out_channels=10, num_steps=2)
        variables = block.init(jax.random.PRNGKey(2), x, cond)
        y, _ = block.apply(variables, x, cond, mutable=["batch_stats", "spectral"])
        assert y.shape == (bt, 16, 16, 10)
        assert block.nfe == 8  # rk4 x 2 steps

    def test_grads_flow_through_solver(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
        cond = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
        block = ODEGResBlock(in_channels=3, out_channels=6, num_steps=1,
                             n_condition=16)
        variables = block.init(jax.random.PRNGKey(2), x, cond)

        def loss(p):
            y, _ = block.apply({**variables, "params": p}, x, cond,
                               mutable=["batch_stats", "spectral"])
            return jnp.mean(y ** 2)

        g = jax.grad(loss)(variables["params"])
        leaves = jax.tree.leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        assert any(float(jnp.linalg.norm(l)) > 0 for l in leaves)


class TestMoEField:
    """nn/moe.py — the expert-parallel ODE field (new capability; the
    reference has no MoE anywhere, SURVEY.md §2.2)."""

    def _setup(self, top_k=0):
        from ganode_tpu.nn import MoEField
        f = MoEField(dim=6, dim_hidden=10, n_experts=4, top_k=top_k)
        y = jax.random.normal(jax.random.PRNGKey(1), (5, 6))
        v = f.init(jax.random.PRNGKey(0), y)
        return f, v, y

    def test_dense_mixture_closed_form(self):
        f, v, y = self._setup()
        out = np.asarray(f.apply(v, y))
        p = v["params"]
        logits = np.asarray(y @ p["gate"]["kernel"] + p["gate"]["bias"])
        g = np.exp(logits - logits.max(-1, keepdims=True))
        g /= g.sum(-1, keepdims=True)
        expected = np.zeros_like(out)
        for e in range(4):
            h = np.tanh(np.asarray(y) @ np.asarray(p["expert_w1"][e])
                        + np.asarray(p["expert_b1"][e]))
            o = h @ np.asarray(p["expert_w2"][e]) + np.asarray(p["expert_b2"][e])
            expected += g[:, e:e + 1] * o
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)

    def test_top1_routes_to_argmax_expert(self):
        f0, v, y = self._setup()
        f1, _, _ = self._setup(top_k=1)
        out = np.asarray(f1.apply(v, y))
        p = v["params"]
        logits = np.asarray(y @ p["gate"]["kernel"] + p["gate"]["bias"])
        am = logits.argmax(-1)
        expected = np.stack([
            np.tanh(np.asarray(y[i]) @ np.asarray(p["expert_w1"][am[i]])
                    + np.asarray(p["expert_b1"][am[i]]))
            @ np.asarray(p["expert_w2"][am[i]])
            + np.asarray(p["expert_b2"][am[i]])
            for i in range(y.shape[0])])
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)

    def test_grads_flow_to_all_experts_when_dense(self):
        f, v, y = self._setup()
        g = jax.grad(lambda p: jnp.sum(f.apply({"params": p}, y) ** 2))(
            v["params"])
        # dense softmax gating -> every expert receives gradient
        per_expert = np.asarray(jnp.abs(g["expert_w1"]).sum(axis=(1, 2)))
        assert (per_expert > 0).all()
