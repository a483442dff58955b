"""Solver-core unit tests: closed-form flows, convergence orders, gradient checks.

The reference had no tests; per SURVEY.md §4 the rebuild tests each solver against
analytic solutions (linear ODE exp(At), OU process with a fixed Brownian path,
spline interpolation identities) and checks adjoint-vs-autodiff agreement.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganode_tpu.ode import (
    cdeint,
    hermite_cubic_coefficients,
    linear_coefficients,
    natural_cubic_coefficients,
    nfe_fixed_grid,
    odeint,
    odeint_adaptive,
    odeint_adaptive_adjoint,
    odeint_backsolve,
    odeint_final,
    sdeint,
)

jax.config.update("jax_enable_x64", True)


def _exp_decay(t, y):
    return -y


class TestFixedGrid:
    def test_exponential_decay_rk4(self):
        y0 = jnp.array([1.0, 2.0, -0.5])
        ts = jnp.linspace(0.0, 1.0, 16)
        ys = odeint(_exp_decay, y0, ts, method="rk4")
        expected = y0[None] * jnp.exp(-ts)[:, None]
        np.testing.assert_allclose(ys, expected, rtol=1e-6)

    def test_first_output_is_y0(self):
        y0 = jnp.array([3.0])
        ys = odeint(_exp_decay, y0, jnp.linspace(0, 1, 5))
        np.testing.assert_array_equal(ys[0], y0)

    def test_linear_system_matches_expm(self):
        key = jax.random.PRNGKey(0)
        A = jax.random.normal(key, (4, 4)) * 0.5
        y0 = jnp.arange(4.0)
        ts = jnp.linspace(0.0, 2.0, 33)
        ys = odeint(lambda t, y: A @ y, y0, ts, method="rk4")
        expected = jax.scipy.linalg.expm(2.0 * A) @ y0
        np.testing.assert_allclose(ys[-1], expected, rtol=1e-5)

    def test_pytree_state(self):
        y0 = {"a": jnp.ones(3), "b": (jnp.zeros(2), jnp.array(2.0))}
        def f(t, y):
            return jax.tree.map(lambda x: -x, y)
        ys = odeint(f, y0, jnp.linspace(0, 1, 8))
        np.testing.assert_allclose(ys["a"][-1], np.exp(-1.0) * np.ones(3), rtol=1e-5)
        np.testing.assert_allclose(ys["b"][1][-1], 2.0 * np.exp(-1.0), rtol=1e-5)

    def test_args_closure(self):
        args = {"rate": jnp.array(0.7)}
        ys = odeint(lambda t, y, a: -a["rate"] * y, jnp.array([1.0]),
                    jnp.linspace(0, 1, 16), args)
        np.testing.assert_allclose(ys[-1], np.exp(-0.7), rtol=1e-6)

    @pytest.mark.parametrize("method,order", [
        ("euler", 1), ("midpoint", 2), ("rk2", 2), ("rk3", 3), ("rk4", 4),
        ("rk38", 4),
    ])
    def test_convergence_order(self, method, order):
        # y' = y, compare error at two resolutions; ratio ~ 2^order.
        y0 = jnp.array([1.0])
        def err(n):
            ys = odeint(lambda t, y: y, y0, jnp.linspace(0, 1, n + 1), method=method)
            return float(abs(ys[-1, 0] - np.exp(1.0)))
        ratio = err(16) / err(32)
        assert 2 ** order * 0.7 < ratio < 2 ** order * 1.4, ratio

    def test_steps_per_interval(self):
        y0 = jnp.array([1.0])
        coarse = odeint(lambda t, y: y * jnp.cos(t), y0, jnp.linspace(0, 3, 4),
                        method="euler")
        fine = odeint(lambda t, y: y * jnp.cos(t), y0, jnp.linspace(0, 3, 4),
                      method="euler", steps_per_interval=64)
        exact = np.exp(np.sin(3.0))
        assert abs(float(fine[-1, 0]) - exact) < abs(float(coarse[-1, 0]) - exact)
        np.testing.assert_allclose(fine[-1, 0], exact, rtol=1e-2)

    def test_nfe_counts(self):
        # The reference's canonical config: rk4 over 16 output times = 60 RHS evals
        # (SURVEY.md §6, models/mocogan_ode.py:48-50).
        assert nfe_fixed_grid("rk4", 16) == 60
        _, stats = odeint(_exp_decay, jnp.ones(2), jnp.linspace(0, 1, 16),
                          return_stats=True)
        assert stats.nfe == 60
        assert stats.n_steps == 15

    def test_odeint_final_matches_trajectory_end(self):
        y0 = jnp.array([1.0, -1.0])
        ts = jnp.linspace(0.0, 1.0, 2)
        full = odeint(_exp_decay, y0, ts, method="rk4")
        final = odeint_final(_exp_decay, y0, 0.0, 1.0, method="rk4", num_steps=1)
        np.testing.assert_allclose(full[-1], final, rtol=1e-7, atol=1e-9)

    def test_jit_and_grad(self):
        ts = jnp.linspace(0, 1, 16)
        @jax.jit
        def loss(y0):
            return jnp.sum(odeint(_exp_decay, y0, ts)[-1] ** 2)
        g = jax.grad(loss)(jnp.array([1.0, 2.0]))
        # d/dy0 sum((y0 e^-1)^2) = 2 y0 e^-2
        np.testing.assert_allclose(g, 2 * np.array([1.0, 2.0]) * np.exp(-2.0), rtol=1e-5)


class TestBacksolveAdjoint:
    def test_matches_checkpointed_grads(self):
        key = jax.random.PRNGKey(1)
        W1 = jax.random.normal(key, (3, 8)) * 0.4
        W2 = jax.random.normal(jax.random.fold_in(key, 1), (8, 3)) * 0.4
        args = {"W1": W1, "W2": W2}
        ts = jnp.linspace(0.0, 1.0, 16)
        y0 = jnp.array([0.3, -0.2, 0.1])

        def f(t, y, a):
            return jnp.tanh(y @ a["W1"]) @ a["W2"]

        def loss_ckpt(y0_, args_):
            return jnp.sum(odeint(f, y0_, ts, args_) ** 2)

        def loss_adj(y0_, args_):
            return jnp.sum(odeint_backsolve(f, y0_, ts, args_) ** 2)

        g1 = jax.grad(loss_ckpt, argnums=(0, 1))(y0, args)
        g2 = jax.grad(loss_adj, argnums=(0, 1))(y0, args)
        np.testing.assert_allclose(g1[0], g2[0], rtol=1e-4, atol=1e-7)
        for k in args:
            np.testing.assert_allclose(g1[1][k], g2[1][k], rtol=1e-4, atol=1e-7)

    def test_forward_values_identical(self):
        ts = jnp.linspace(0, 1, 8)
        y0 = jnp.array([1.0])
        a = jnp.array(0.5)
        ys1 = odeint(lambda t, y, a_: -a_ * y, y0, ts, a)
        ys2 = odeint_backsolve(lambda t, y, a_: -a_ * y, y0, ts, a)
        np.testing.assert_allclose(ys1, ys2, rtol=1e-12)


class TestAdaptive:
    def test_dopri5_stiffish_accuracy(self):
        y0 = jnp.array([1.0])
        ts = jnp.linspace(0.0, 2.0, 5)
        ys, stats = odeint_adaptive(lambda t, y: -10.0 * y, y0, ts,
                                    rtol=1e-7, atol=1e-9, return_stats=True)
        np.testing.assert_allclose(ys[:, 0], np.exp(-10.0 * np.asarray(ts)),
                                   rtol=1e-5, atol=1e-9)
        assert int(stats.n_steps) > 4          # actually adapted
        assert int(stats.nfe) > 0

    def test_dopri5_cheap_on_easy_problem(self):
        # Nearly-linear slow dynamics should need few steps.
        y0 = jnp.array([1.0])
        ts = jnp.linspace(0.0, 1.0, 3)
        _, stats = odeint_adaptive(lambda t, y: 0.01 * y, y0, ts,
                                   rtol=1e-4, atol=1e-6, return_stats=True)
        assert int(stats.n_steps) <= 6
        assert int(stats.n_rejected) <= 2

    def test_adaptive_adjoint_grads_close_to_fixed(self):
        key = jax.random.PRNGKey(3)
        W = jax.random.normal(key, (3, 3)) * 0.3
        ts = jnp.linspace(0.0, 1.0, 4)
        y0 = jnp.array([0.5, -0.1, 0.2])

        def f(t, y, w):
            return jnp.tanh(y @ w)

        g_fixed = jax.grad(
            lambda w: jnp.sum(odeint(f, y0, ts, w, method="rk4",
                                     steps_per_interval=16)[-1] ** 2)
        )(W)
        g_adapt = jax.grad(
            lambda w: jnp.sum(odeint_adaptive_adjoint(f, y0, ts, w, 1e-8, 1e-10)[-1] ** 2)
        )(W)
        np.testing.assert_allclose(g_fixed, g_adapt, rtol=1e-4, atol=1e-7)

    def test_jittable(self):
        fn = jax.jit(lambda y0: odeint_adaptive(lambda t, y: -y, y0,
                                                jnp.linspace(0, 1, 3))[-1])
        np.testing.assert_allclose(fn(jnp.array([1.0]))[0], np.exp(-1.0), rtol=1e-4)

    def test_dense_output_grid_keeps_step_size(self):
        """Landing on an output time must not shrink the carried step: on an
        easy problem a dense grid should average ~1 accepted attempt per
        output interval rather than re-growing the step each landing."""
        y0 = jnp.array([1.0])
        ts = jnp.linspace(0.0, 1.0, 33)
        ys, stats = odeint_adaptive(lambda t, y: -y, y0, ts,
                                    rtol=1e-5, atol=1e-7, return_stats=True)
        np.testing.assert_allclose(ys[:, 0], np.exp(-np.asarray(ts)),
                                   rtol=1e-4, atol=1e-7)
        # 32 intervals; allow a handful of extra attempts for startup/rejects
        assert int(stats.nfe) <= 6 * (32 + 8), int(stats.nfe)


class TestSDE:
    def test_deterministic_limit_matches_ode(self):
        # zero diffusion -> Euler-Maruyama == explicit Euler
        y0 = jnp.array([1.0])
        ts = jnp.linspace(0.0, 1.0, 16)
        key = jax.random.PRNGKey(0)
        ys = sdeint(lambda t, y: -y, lambda t, y: jnp.zeros_like(y), y0, ts, key,
                    dt=2.5e-2)
        ode = odeint(lambda t, y: -y, y0, ts, method="euler", steps_per_interval=3)
        np.testing.assert_allclose(ys, ode, rtol=1e-10)

    def test_reference_substep_count(self):
        # dt=2.5e-2 over linspace(0,1,16): interval 1/15 -> ceil(0.0667/0.025)=3
        # substeps per interval, 45 total (torchsde fixed-step semantics).
        _, stats = sdeint(lambda t, y: -y, lambda t, y: 0.1 * jnp.ones_like(y),
                          jnp.ones(2), jnp.linspace(0, 1, 16),
                          jax.random.PRNGKey(1), dt=2.5e-2, return_stats=True)
        assert stats.n_steps == 45

    def test_path_reproducible_and_key_sensitive(self):
        y0 = jnp.ones(4)
        ts = jnp.linspace(0, 1, 8)
        args = None
        run = lambda k: sdeint(lambda t, y: -y, lambda t, y: jnp.ones_like(y),
                               y0, ts, k, dt=0.05)
        a = run(jax.random.PRNGKey(7))
        b = run(jax.random.PRNGKey(7))
        c = run(jax.random.PRNGKey(8))
        np.testing.assert_array_equal(a, b)
        assert not np.allclose(a, c)

    def test_ou_process_moments(self):
        # dX = -theta X dt + sigma dW, X0=x0:
        # E X_t = x0 e^{-theta t}; Var X_t = sigma^2/(2 theta) (1 - e^{-2 theta t})
        theta, sigma, x0, t1 = 1.5, 0.8, 2.0, 1.0
        n = 4096
        y0 = jnp.full((n,), x0)
        ts = jnp.linspace(0.0, t1, 11)
        ys = sdeint(lambda t, y: -theta * y,
                    lambda t, y: sigma * jnp.ones_like(y),
                    y0, ts, jax.random.PRNGKey(42), dt=5e-3)
        xT = np.asarray(ys[-1])
        mean_exp = x0 * np.exp(-theta * t1)
        var_exp = sigma ** 2 / (2 * theta) * (1 - np.exp(-2 * theta * t1))
        assert abs(xT.mean() - mean_exp) < 4 * np.sqrt(var_exp / n) + 5e-3
        assert abs(xT.var() - var_exp) / var_exp < 0.1

    def test_grad_flows_through_sde(self):
        ts = jnp.linspace(0, 1, 8)
        def loss(scale):
            ys = sdeint(lambda t, y, s: -s * y, lambda t, y, s: 0.1 * jnp.ones_like(y),
                        jnp.ones(3), ts, jax.random.PRNGKey(0), args=scale, dt=0.05)
            return jnp.sum(ys[-1])
        g = jax.grad(loss)(jnp.array(1.0))
        assert np.isfinite(float(g)) and float(g) != 0.0

    def test_milstein_beats_euler_on_multiplicative_noise(self):
        # Geometric Brownian motion has a closed-form strong solution per path:
        # X_t = X0 exp((mu - sigma^2/2) t + sigma W_t). With the SAME driving path
        # (same key/substeps), Milstein's strong error should be below Euler's.
        mu, sigma = 0.7, 0.5
        n = 512
        y0 = jnp.ones((n,))
        ts = jnp.linspace(0.0, 1.0, 2)
        key = jax.random.PRNGKey(9)
        kw = dict(dt=1.0 / 64)
        drift = lambda t, y: mu * y
        diff = lambda t, y: sigma * y
        ys_e = sdeint(drift, diff, y0, ts, key, method="euler", **kw)
        ys_m = sdeint(drift, diff, y0, ts, key, method="milstein", **kw)
        # reconstruct W_1 from the increments the solver drew (same fold pattern)
        h = 1.0 / 64
        dWs = []
        for k in range(64):
            kk = jax.random.split(jax.random.fold_in(key, k), 1)[0]
            dWs.append(np.sqrt(h) * np.asarray(jax.random.normal(kk, (n,))))
        W1 = np.sum(dWs, axis=0)
        exact = np.exp((mu - sigma ** 2 / 2) + sigma * W1)
        err_e = np.abs(np.asarray(ys_e[-1]) - exact).mean()
        err_m = np.abs(np.asarray(ys_m[-1]) - exact).mean()
        assert err_m < err_e

    def test_milstein_dense_diffusion_uses_true_diagonal(self):
        """For a DENSE diffusion g(y) = y @ A, the diagonal-Milstein correction
        must use the true Jacobian diagonal dg_i/dy_i = A_ii — the directional
        derivative of g along g is exact only for elementwise diffusions."""
        A = jnp.array([[0.5, 0.3], [-0.2, 0.8]])
        y0 = jnp.array([[0.7, -0.4]])
        ts = np.array([0.0, 1.0])
        key = jax.random.PRNGKey(3)
        ys = sdeint(lambda t, y: jnp.zeros_like(y), lambda t, y: y @ A,
                    y0, ts, key, method="milstein")
        # replicate the solver's single Brownian increment (substep index 0)
        kk = jax.random.split(jax.random.fold_in(key, 0), 1)[0]
        dW = np.asarray(jax.random.normal(kk, y0.shape))  # sqrt(h)=1
        g0 = np.asarray(y0 @ A)
        expected = (np.asarray(y0) + g0 * dW
                    + 0.5 * g0 * np.diag(np.asarray(A)) * (dW ** 2 - 1.0))
        np.testing.assert_allclose(np.asarray(ys[-1]), expected, rtol=1e-5)


class TestReversibleHeun:
    """Reversible Heun (arXiv:2105.13493): same per-step cost as
    Euler-Maruyama, algebraically invertible pair update, O(1)-memory exact
    adjoint via sdeint_reversible_adjoint."""

    def test_deterministic_limit_is_second_order(self):
        # zero diffusion -> the scheme reduces to a two-step trapezoidal
        # (Heun-class) method: errors on y'=-y shrink ~4x when h halves,
        # and at dt=1/64 the solution is far more accurate than Euler's
        y0 = jnp.array([1.0])
        ts = jnp.linspace(0.0, 1.0, 5)
        key = jax.random.PRNGKey(0)
        zero_g = lambda t, y: jnp.zeros_like(y)
        sol = float(np.exp(-1.0))
        errs = []
        for dt in (1.0 / 16, 1.0 / 32, 1.0 / 64):
            ys = sdeint(lambda t, y: -y, zero_g, y0, ts, key, dt=dt,
                        method="reversible_heun")
            errs.append(abs(float(ys[-1, 0]) - sol))
        assert errs[0] / errs[1] > 3.0 and errs[1] / errs[2] > 3.0
        ys_e = sdeint(lambda t, y: -y, zero_g, y0, ts, key, dt=1.0 / 64)
        assert errs[2] < abs(float(ys_e[-1, 0]) - sol) / 50

    def test_additive_noise_is_pathwise_exact(self):
        # dX = sigma dW has X_t = X0 + sigma W_t; with constant diffusion the
        # pair update telescopes to exactly that partial sum per path
        sigma, n = 0.7, 64
        y0 = jnp.zeros((n,))
        ts = jnp.linspace(0.0, 1.0, 9)
        key = jax.random.PRNGKey(5)
        spi = 4
        ys = sdeint(lambda t, y: jnp.zeros_like(y),
                    lambda t, y: sigma * jnp.ones_like(y),
                    y0, ts, key, dt=(1.0 / 8) / spi, method="reversible_heun")
        h = (1.0 / 8) / spi
        W = np.zeros(n)
        for k in range(8 * spi):
            kk = jax.random.split(jax.random.fold_in(key, k), 1)[0]
            W += np.sqrt(h) * np.asarray(jax.random.normal(kk, (n,)))
        np.testing.assert_allclose(np.asarray(ys[-1]), sigma * W, rtol=1e-9)

    def test_ou_process_moments(self):
        theta, sigma, x0, t1 = 1.5, 0.8, 2.0, 1.0
        n = 4096
        y0 = jnp.full((n,), x0)
        ts = jnp.linspace(0.0, t1, 11)
        ys = sdeint(lambda t, y: -theta * y,
                    lambda t, y: sigma * jnp.ones_like(y),
                    y0, ts, jax.random.PRNGKey(42), dt=5e-3,
                    method="reversible_heun")
        xT = np.asarray(ys[-1])
        mean_exp = x0 * np.exp(-theta * t1)
        var_exp = sigma ** 2 / (2 * theta) * (1 - np.exp(-2 * theta * t1))
        assert abs(xT.mean() - mean_exp) < 4 * np.sqrt(var_exp / n) + 5e-3
        assert abs(xT.var() - var_exp) / var_exp < 0.1

    def test_adjoint_matches_autodiff(self):
        """The reconstructing backward pass returns the same gradients as
        backprop through the forward scan — in y0 AND in the vector-field
        params, with cotangents arriving at every output time."""
        from ganode_tpu.ode import sdeint_reversible_adjoint

        A = jnp.asarray(np.random.RandomState(0).randn(3, 3) * 0.4)
        B = jnp.asarray(np.random.RandomState(1).randn(3, 3) * 0.3)
        args = {"A": A, "B": B, "b": jnp.array([0.1, -0.2, 0.3])}
        y0 = jnp.asarray(np.random.RandomState(2).randn(5, 3))
        ts = np.linspace(0.0, 1.0, 5)
        key = jax.random.PRNGKey(11)
        drift = lambda t, y, p: jnp.tanh(y @ p["A"] + p["b"])
        diffusion = lambda t, y, p: 0.1 * jnp.tanh(y @ p["B"])
        w = jnp.linspace(0.5, 1.5, 5)[:, None, None]  # weight EVERY output

        def loss_adj(y0, p):
            ys = sdeint_reversible_adjoint(drift, diffusion, y0, ts, key, p,
                                           dt=0.1)
            return jnp.sum(w * ys ** 2)

        def loss_scan(y0, p):
            ys = sdeint(drift, diffusion, y0, ts, key, p, dt=0.1,
                        method="reversible_heun")
            return jnp.sum(w * ys ** 2)

        la, (ga, pa) = jax.value_and_grad(loss_adj, argnums=(0, 1))(y0, args)
        ls, (gs, ps) = jax.value_and_grad(loss_scan, argnums=(0, 1))(y0, args)
        np.testing.assert_allclose(float(la), float(ls), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gs),
                                   rtol=1e-6, atol=1e-10)
        for k in args:
            np.testing.assert_allclose(np.asarray(pa[k]), np.asarray(ps[k]),
                                       rtol=1e-6, atol=1e-10)
        # and the whole thing jits (scan-of-scan forward, custom_vjp backward)
        gj = jax.jit(jax.grad(loss_adj))(y0, args)
        np.testing.assert_allclose(np.asarray(gj), np.asarray(ga),
                                   rtol=1e-10, atol=1e-12)

    def test_stats_one_drift_one_diffusion_eval_per_substep(self):
        from ganode_tpu.ode import sdeint_reversible_adjoint

        _, stats = sdeint(lambda t, y: -y, lambda t, y: 0.1 * jnp.ones_like(y),
                          jnp.ones(2), jnp.linspace(0, 1, 16),
                          jax.random.PRNGKey(1), dt=2.5e-2,
                          method="reversible_heun", return_stats=True)
        assert stats.n_steps == 45 and stats.nfe == 2 * 46
        _, stats = sdeint_reversible_adjoint(
            lambda t, y: -y, lambda t, y: 0.1 * jnp.ones_like(y),
            jnp.ones(2), jnp.linspace(0, 1, 16), jax.random.PRNGKey(1),
            dt=2.5e-2, return_stats=True)
        assert stats.n_steps == 45 and stats.nfe == 2 * 46


class TestSpline:
    def test_hermite_interpolates_knots(self):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (4, 10, 3))
        sp = hermite_cubic_coefficients(x)
        for i in range(10):
            np.testing.assert_allclose(sp.evaluate(jnp.asarray(float(i))), x[:, i],
                                       rtol=1e-6, atol=1e-6)

    def test_hermite_backward_difference_derivative(self):
        # at knot i (i>=1, approached from the right) the derivative equals the
        # backward difference — the defining property of this scheme.
        x = jnp.asarray(np.random.RandomState(0).randn(1, 6, 2))
        sp = hermite_cubic_coefficients(x)
        for i in range(1, 5):
            bd = (x[:, i] - x[:, i - 1])
            np.testing.assert_allclose(sp.derivative(jnp.asarray(float(i) + 1e-9)),
                                       bd, rtol=1e-4, atol=1e-5)

    def test_linear_spline(self):
        x = jnp.asarray([[0.0], [2.0], [1.0]])[None]  # (1, 3, 1)
        sp = linear_coefficients(x)
        np.testing.assert_allclose(sp.evaluate(jnp.asarray(0.5))[0, 0], 1.0, rtol=1e-6)
        np.testing.assert_allclose(sp.evaluate(jnp.asarray(1.5))[0, 0], 1.5, rtol=1e-6)

    def test_natural_cubic_recovers_cubic_endpoints(self):
        x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 3))
        sp = natural_cubic_coefficients(x)
        for i in range(8):
            np.testing.assert_allclose(sp.evaluate(jnp.asarray(float(i))), x[:, i],
                                       rtol=1e-5, atol=1e-6)

    def test_nonuniform_times(self):
        t = jnp.asarray([0.0, 0.3, 1.0, 2.5])
        x = jnp.sin(t)[None, :, None]
        sp = hermite_cubic_coefficients(x, t)
        np.testing.assert_allclose(sp.evaluate(jnp.asarray(1.0))[0, 0], np.sin(1.0),
                                   rtol=1e-6)


class TestCDE:
    def test_cde_reduces_to_time_ode(self):
        # control path X(t) = t (1-D): dz = f(z) dX == f(z) dt, so the CDE must
        # match a plain ODE solve with the same vector field.
        T = 9
        t = jnp.arange(T, dtype=jnp.float64)
        x = t[None, :, None]  # (1, T, 1)
        sp = hermite_cubic_coefficients(x, t)
        z0 = jnp.asarray([[0.4, -0.3]])

        def mat_field(t_, z):
            return (-z)[..., None]  # (..., hidden, 1)

        zs = cdeint(sp, z0, mat_field, t)
        ode = odeint(lambda t_, z: -z, z0, t, method="rk4")
        np.testing.assert_allclose(zs, ode, rtol=1e-6, atol=1e-8)

    def test_cde_grad_flows(self):
        t = jnp.arange(5, dtype=jnp.float64)
        x = jnp.stack([t, jnp.cos(t)], axis=-1)[None]
        sp = hermite_cubic_coefficients(x, t)
        z0 = jnp.ones((1, 3))

        def loss(w):
            field = lambda t_, z, w_: jnp.tanh(z @ w_)[..., None] * jnp.ones((1, 3, 2))
            zs = cdeint(sp, z0, field, t, args=w)
            return jnp.sum(zs[-1] ** 2)

        g = jax.grad(loss)(jnp.eye(3) * 0.1)
        assert np.all(np.isfinite(np.asarray(g)))
