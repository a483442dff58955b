"""Pallas kernel tests (interpret mode on CPU): fused solves vs pure-JAX ground
truth, gradient agreement."""
import jax
import jax.numpy as jnp
import numpy as np

from ganode_tpu.ops import (
    fused_gru_motion,
    fused_rk4_motion,
    reference_gru_motion,
    reference_rk4_motion,
)


def _rk4_inputs(b=32, d=16, t=16, seed=0):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 5)
    x = jax.random.normal(ks[0], (b, d))
    w1 = jax.random.normal(ks[1], (d, d)) * 0.4
    b1 = jax.random.normal(ks[2], (d,)) * 0.1
    w2 = jax.random.normal(ks[3], (d, d)) * 0.4
    b2 = jax.random.normal(ks[4], (d,)) * 0.1
    ts = jnp.linspace(0.0, 1.0, t)
    return x, w1, b1, w2, b2, ts


class TestFusedRK4:
    def test_matches_reference_impl(self):
        args = _rk4_inputs()
        got = fused_rk4_motion(*args, True)
        want = reference_rk4_motion(*args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_matches_solver_core(self):
        from ganode_tpu.ode import odeint
        x, w1, b1, w2, b2, ts = _rk4_inputs(b=4, t=8)
        got = fused_rk4_motion(x, w1, b1, w2, b2, ts, True)
        want = odeint(
            lambda t, y, p: jnp.tanh(y @ p[0] + p[1]) @ p[2] + p[3],
            x, ts, (w1, b1, w2, b2), method="rk4")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_odd_batch_and_dim_padding(self):
        args = _rk4_inputs(b=5, d=10, t=6)
        got = fused_rk4_motion(*args, True)
        want = reference_rk4_motion(*args)
        assert got.shape == (6, 5, 10)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_gradients_match(self):
        x, w1, b1, w2, b2, ts = _rk4_inputs(b=4, t=8)

        def loss_fused(w1_, w2_):
            return jnp.sum(fused_rk4_motion(x, w1_, b1, w2_, b2, ts, True) ** 2)

        def loss_ref(w1_, w2_):
            return jnp.sum(reference_rk4_motion(x, w1_, b1, w2_, b2, ts) ** 2)

        g1 = jax.grad(loss_fused, argnums=(0, 1))(w1, w2)
        g2 = jax.grad(loss_ref, argnums=(0, 1))(w1, w2)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)

    def test_jittable(self):
        args = _rk4_inputs(b=8, t=4)
        f = jax.jit(lambda *a: fused_rk4_motion(*a, True))
        out = f(*args)
        assert out.shape == (4, 8, 16)


class TestFusedGRU:
    def _inputs(self, b=16, d=16, t=8, seed=0):
        k = jax.random.PRNGKey(seed)
        ks = jax.random.split(k, 6)
        h0 = jax.random.normal(ks[0], (b, d))
        e = jax.random.normal(ks[1], (t, b, d))
        wi = jax.random.normal(ks[2], (d, 3 * d)) * 0.3
        wh = jax.random.normal(ks[3], (d, 3 * d)) * 0.3
        bi = jax.random.normal(ks[4], (3 * d,)) * 0.1
        bh = jax.random.normal(ks[5], (3 * d,)) * 0.1
        return h0, e, wi, wh, bi, bh

    def test_matches_reference_impl(self):
        args = self._inputs()
        got = fused_gru_motion(*args, True)
        want = reference_gru_motion(*args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_matches_nn_gru_cell(self):
        from ganode_tpu.nn import GRUCell
        h0, e, wi, wh, bi, bh = self._inputs(b=3, t=5)
        cell = GRUCell(16)
        params = {"wi": wi, "wh": wh, "bi": bi, "bh": bh}
        h = h0
        outs = []
        for t in range(5):
            h = cell.apply({"params": params}, h, e[t])
            outs.append(h)
        want = jnp.stack(outs)
        got = fused_gru_motion(h0, e, wi, wh, bi, bh, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_padding(self):
        args = self._inputs(b=7, d=12, t=4)
        got = fused_gru_motion(*args, True)
        want = reference_gru_motion(*args)
        assert got.shape == (4, 7, 12)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_gradients_match(self):
        h0, e, wi, wh, bi, bh = self._inputs(b=4, t=4)

        g1 = jax.grad(lambda w: jnp.sum(
            fused_gru_motion(h0, e, w, wh, bi, bh, True) ** 2))(wi)
        g2 = jax.grad(lambda w: jnp.sum(
            reference_gru_motion(h0, e, w, wh, bi, bh) ** 2))(wi)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-6)


class TestPallasMotionIntegration:
    def test_rect_hidden_dim(self):
        k = jax.random.PRNGKey(0)
        ks = jax.random.split(k, 5)
        b, d, h, t = 4, 10, 24, 6
        x = jax.random.normal(ks[0], (b, d))
        w1 = jax.random.normal(ks[1], (d, h)) * 0.3
        b1 = jax.random.normal(ks[2], (h,)) * 0.1
        w2 = jax.random.normal(ks[3], (h, d)) * 0.3
        b2 = jax.random.normal(ks[4], (d,)) * 0.1
        ts = jnp.linspace(0.0, 1.0, t)
        got = fused_rk4_motion(x, w1, b1, w2, b2, ts, True)
        want = reference_rk4_motion(x, w1, b1, w2, b2, ts)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_motion_ode_pallas_matches_plain(self):
        from ganode_tpu.models.motion import MotionODE
        plain = MotionODE(dim=16)
        fused = MotionODE(dim=16, use_pallas=True)
        k = jax.random.PRNGKey(0)
        params = plain.init({"params": k, "sample": k}, 4, 8)["params"]
        out_p = plain.apply({"params": params}, 4, 8,
                            rngs={"sample": jax.random.PRNGKey(5)})
        out_f = fused.apply({"params": params}, 4, 8,
                            rngs={"sample": jax.random.PRNGKey(5)})
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_f),
                                   rtol=1e-4, atol=1e-5)

    def test_motion_gru_pallas_matches_plain(self):
        from ganode_tpu.models.motion import MotionGRU
        plain = MotionGRU(dim=16)
        fused = MotionGRU(dim=16, use_pallas=True)
        k = jax.random.PRNGKey(0)
        params = plain.init({"params": k, "sample": k}, 4, 8)["params"]
        out_p = plain.apply({"params": params}, 4, 8,
                            rngs={"sample": jax.random.PRNGKey(5)})
        out_f = fused.apply({"params": params}, 4, 8,
                            rngs={"sample": jax.random.PRNGKey(5)})
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_f),
                                   rtol=1e-4, atol=1e-5)


class TestConv3DFoldedGrad:
    """MXU-folded input gradient for the video discriminators' first conv
    (ops/conv3d_grad.py) — must be numerically identical to XLA's autodiff."""

    def _inputs(self, B=2, T=12, S=32, ci=3, co=16, seed=0):
        k = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(k, 3)
        x = jax.random.normal(k1, (B, T, S, S, ci))
        w = jax.random.normal(k2, (4, 4, 4, ci, co)) * 0.1
        return x, w, k3

    def test_forward_identical(self):
        from ganode_tpu.ops import conv3d_first, conv3d_s122

        x, w, _ = self._inputs()
        np.testing.assert_array_equal(conv3d_first(x, w), conv3d_s122(x, w))

    def test_gradients_match_autodiff(self):
        from ganode_tpu.ops import conv3d_first, conv3d_s122

        x, w, k = self._inputs()
        # nonlinear loss so the cotangent depends on the data
        def loss(f, x, w):
            return jnp.sum(jnp.square(f(x, w)))

        gx_ref, gw_ref = jax.grad(loss, argnums=(1, 2))(conv3d_s122, x, w)
        gx, gw = jax.grad(loss, argnums=(1, 2))(conv3d_first, x, w)
        np.testing.assert_allclose(gx, gx_ref, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(gw, gw_ref, rtol=1e-5, atol=1e-5)

    def test_odd_and_nonsquare_spatial_fall_back_correctly(self):
        """ADVICE r2: the folded reconstruction is exact only for even H/W.
        Odd or non-square inputs must still produce correct values AND
        gradients (odd dispatches to the native path; even non-square uses the
        per-axis slice)."""
        from ganode_tpu.ops import conv3d_first, conv3d_s122

        def loss(f, x, w):
            return jnp.sum(jnp.square(f(x, w)))

        k = jax.random.PRNGKey(4)
        for (H, W) in ((31, 31), (32, 30), (33, 32)):
            k, k1, k2 = jax.random.split(k, 3)
            x = jax.random.normal(k1, (2, 8, H, W, 3))
            w = jax.random.normal(k2, (4, 4, 4, 3, 8)) * 0.1
            np.testing.assert_array_equal(conv3d_first(x, w),
                                          conv3d_s122(x, w))
            gx_ref, gw_ref = jax.grad(loss, argnums=(1, 2))(conv3d_s122, x, w)
            gx, gw = jax.grad(loss, argnums=(1, 2))(conv3d_first, x, w)
            np.testing.assert_allclose(gx, gx_ref, rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(gw, gw_ref, rtol=1e-5, atol=1e-5)

    def test_double_backward_for_gradient_penalty(self):
        """The WGAN-GP penalty is grad-of-grad through the conv — the
        custom_vjp's backward must itself be differentiable."""
        from ganode_tpu.ops import conv3d_first, conv3d_s122

        x, w, _ = self._inputs(B=1, T=8, S=16, co=8)

        def gp(f, w_):
            g = jax.grad(lambda x_: jnp.sum(jnp.square(f(x_, w_))))(x)
            return jnp.sum(jnp.square(g))

        gp_ref = jax.grad(lambda w_: gp(conv3d_s122, w_))(w)
        gp_new = jax.grad(lambda w_: gp(conv3d_first, w_))(w)
        np.testing.assert_allclose(gp_new, gp_ref, rtol=1e-4, atol=1e-4)

    def test_video_discriminator_uses_it(self):
        """VideoDiscriminator(ksize=4) output and grads are unchanged by the
        fast-grad first layer vs a native-conv stand-in."""
        from ganode_tpu.models import VideoDiscriminator

        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64, 64, 3))
        d = VideoDiscriminator(ksize=4, ndf=8)
        variables = d.init({"params": jax.random.PRNGKey(1)}, x)
        assert "FastGradConv3D_0" in variables["params"]
        (logits, _), _ = d.apply(variables, x, mutable=["batch_stats"])
        assert np.all(np.isfinite(logits))

        def loss(x_):
            (l, _), _ = d.apply(variables, x_, mutable=["batch_stats"])
            return jnp.sum(jnp.square(l))

        g = jax.grad(loss)(x)
        assert np.all(np.isfinite(g)) and float(jnp.max(jnp.abs(g))) > 0

    def test_mnist_ksize2_keeps_native_conv(self):
        from ganode_tpu.models import VideoDiscriminator

        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 28, 28, 1))
        d = VideoDiscriminator(ksize=2, ndf=8)
        variables = d.init({"params": jax.random.PRNGKey(1)}, x)
        assert "FastGradConv3D_0" not in variables["params"]


class TestInt8Serving:
    """ganode_tpu.ops.quant: int8 post-training quantization of the deconv
    trunks (the serving path; measured 1.16-1.28x on v5e, scripts/bench_int8.py)."""

    def test_int8_deconv_geometry_is_exact(self):
        """With integer-valued inputs (no quantization error) the int8 dilated
        deconv must equal flax's ConvTranspose bit-for-bit — pins kernel
        orientation, padding, and stride of the serving reimplementation."""
        from flax import linen as nn

        from ganode_tpu.ops.quant import _deconv_i8

        k = jax.random.PRNGKey(0)
        xq = jax.random.randint(k, (2, 8, 8, 6), -5, 6).astype(jnp.int8)
        kq = jax.random.randint(jax.random.fold_in(k, 1), (4, 4, 6, 10),
                                -5, 6).astype(jnp.int8)
        got = _deconv_i8(xq, kq, stride=2, torch_pad=1)  # int32

        # torch (k=4, s=2, p=1) semantics == flax padding k-1-p = 2
        ct = nn.ConvTranspose(10, (4, 4), strides=(2, 2),
                              padding=((2, 2), (2, 2)), use_bias=False)
        want = ct.apply({"params": {"kernel": kq.astype(jnp.float32)}},
                        xq.astype(jnp.float32))
        assert got.shape == want.shape == (2, 16, 16, 10)
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(want))

    def _trunk_pair(self, trunk_cls, trunk_name, n_channels, spatial_in=1):
        from ganode_tpu.ops import int8_trunk_apply, quantize_trunk

        trunk = trunk_cls(n_channels=n_channels, ngf=8)
        z = jax.random.normal(jax.random.PRNGKey(0), (4, 1, 1, 14)) \
            if spatial_in == 1 else None
        variables = trunk.init({"params": jax.random.PRNGKey(1)}, z)
        # make BN stats non-trivial so the fold is actually exercised
        _, upd = trunk.apply(variables, z, train=True, mutable=["batch_stats"])
        variables = {"params": variables["params"],
                     "batch_stats": upd["batch_stats"]}
        want = trunk.apply(variables, z, train=False)
        qp = quantize_trunk(trunk_name, variables["params"],
                            variables["batch_stats"])
        got = int8_trunk_apply(trunk_name, qp, z)
        return np.asarray(want), np.asarray(got)

    def test_dcgan64_int8_close_to_f32(self):
        from ganode_tpu.models.mocogan import DCGANTrunk64

        want, got = self._trunk_pair(DCGANTrunk64, "dcgan64", 3)
        assert got.shape == want.shape == (4, 64, 64, 3)
        assert np.all(np.isfinite(got))
        assert np.max(np.abs(got - want)) < 0.15
        assert np.mean(np.abs(got - want)) < 0.02

    def test_mnist28_int8_close_to_f32(self):
        from ganode_tpu.models.mocogan import MNISTTrunk28

        want, got = self._trunk_pair(MNISTTrunk28, "mnist28", 1)
        assert got.shape == want.shape == (4, 28, 28, 1)
        assert np.max(np.abs(got - want)) < 0.15
        assert np.mean(np.abs(got - want)) < 0.02

    def test_dcgan128_int8_close_to_f32(self):
        from ganode_tpu.models.mocogan import DCGANTrunk128

        want, got = self._trunk_pair(DCGANTrunk128, "dcgan128", 3)
        assert got.shape == want.shape == (4, 128, 128, 3)
        assert np.max(np.abs(got - want)) < 0.15
        assert np.mean(np.abs(got - want)) < 0.02

    def test_unknown_trunk_is_loud(self):
        from ganode_tpu.ops import quantize_trunk

        import pytest
        with pytest.raises(ValueError, match="int8 geometry"):
            quantize_trunk("gres64", {}, {})

    def test_static_act_scales_close_to_f32(self):
        from ganode_tpu.models.mocogan import DCGANTrunk64
        from ganode_tpu.ops import int8_trunk_apply, quantize_trunk
        from ganode_tpu.ops.quant import calibrate_act_scales

        trunk = DCGANTrunk64(n_channels=3, ngf=8)
        z = jax.random.normal(jax.random.PRNGKey(0), (4, 1, 1, 14))
        variables = trunk.init({"params": jax.random.PRNGKey(1)}, z)
        _, upd = trunk.apply(variables, z, train=True, mutable=["batch_stats"])
        variables = {"params": variables["params"],
                     "batch_stats": upd["batch_stats"]}
        want = np.asarray(trunk.apply(variables, z, train=False))
        qp = quantize_trunk("dcgan64", variables["params"],
                            variables["batch_stats"])
        scales = calibrate_act_scales("dcgan64", variables["params"],
                                      variables["batch_stats"], z)
        # fresh latents (NOT the calibration batch) must still be close
        z2 = jax.random.normal(jax.random.PRNGKey(7), (4, 1, 1, 14))
        want2 = np.asarray(trunk.apply(variables, z2, train=False))
        got2 = np.asarray(int8_trunk_apply("dcgan64", qp, z2,
                                           act_scales=scales))
        assert np.max(np.abs(got2 - want2)) < 0.2
        assert np.mean(np.abs(got2 - want2)) < 0.02
        # calibration batch itself
        got = np.asarray(int8_trunk_apply("dcgan64", qp, z, act_scales=scales))
        assert np.max(np.abs(got - want)) < 0.15

    def test_int8_trunk_shards_over_dp_mesh(self):
        """The quantized serving path is a pure function of (pytree, z): jit
        over an 8-device DP mesh must shard the frame axis and reproduce the
        single-device JIT output bitwise (GSPMD inserts no cross-frame
        compute). Both sides are jitted: eager dispatch constant-folds scale
        arithmetic differently from XLA (ULP-level, and dependent on the
        process-global x64 flag other test files enable), which is a
        compilation-mode artifact, not a sharding one."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from ganode_tpu.models.mocogan import DCGANTrunk64
        from ganode_tpu.ops import int8_trunk_apply, quantize_trunk

        trunk = DCGANTrunk64(n_channels=3, ngf=8)
        z = jax.random.normal(jax.random.PRNGKey(0), (16, 1, 1, 14))
        variables = trunk.init({"params": jax.random.PRNGKey(1)}, z)
        qp = quantize_trunk("dcgan64", variables["params"],
                            jax.tree.map(lambda x: x, variables["batch_stats"]))
        apply = jax.jit(lambda q, x: int8_trunk_apply("dcgan64", q, x))
        single = np.asarray(apply(qp, z))

        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        zs = jax.device_put(z, NamedSharding(mesh, P("data")))
        qs = jax.device_put(qp, NamedSharding(mesh, P()))
        out = apply(qs, zs)
        assert out.sharding.spec == P("data")
        np.testing.assert_array_equal(np.asarray(out), single)
