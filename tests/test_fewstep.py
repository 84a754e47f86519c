"""Few-step (respaced) sampling: reverse kernels generalized from t -> t-1
to t -> s, plus the strided sampler chain (`sample(n_steps=...)`).

The reference has no sampler at all; this accelerator is pure framework
capability.  Contracts pinned here:
  * s = t-1 reproduces the single-step kernels (same key, same draw);
  * the schedule identities behind the respaced Gaussian posterior hold
    for every (s, t) pair (variance consistency of q(x_s | x_t, x0));
  * n_steps >= t_start is exactly the full-length chain;
  * short chains produce finite, context-clamped output with the right
    trajectory length.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffab_pytorch_tpu.config import tiny_config
from diffab_pytorch_tpu.data.batch import synthetic_batch
from diffab_pytorch_tpu.diffusion import coordinate, orientation, sequence
from diffab_pytorch_tpu.train import DiffAb

L = 24


@pytest.fixture(scope="module")
def harness():
    return DiffAb(tiny_config())


@pytest.fixture(scope="module")
def batch():
    return synthetic_batch(jax.random.key(0), 2, L, 15, n_generate=6)


@pytest.fixture(scope="module")
def state(harness, batch):
    return harness.init(jax.random.key(1), batch)


class TestKernelGeneralization:
    def test_coordinate_s_default_matches_explicit(self, harness, batch):
        sched = harness.sched
        key = jax.random.key(3)
        gen = batch.generation_mask & batch.residue_mask
        x_t = batch.translations + 0.3
        eps_hat = jnp.ones_like(x_t) * 0.1
        t = jnp.full((2,), 40, jnp.int32)
        a = coordinate.reverse_step(key, sched, x_t, eps_hat, t, gen)
        b = coordinate.reverse_step(key, sched, x_t, eps_hat, t, gen, s=t - 1)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_sequence_s_default_matches_explicit(self, harness, batch):
        sched = harness.sched
        gen = batch.generation_mask & batch.residue_mask
        probs = jax.nn.softmax(
            jax.random.normal(jax.random.key(5), (2, L, 21)), -1
        )
        t = jnp.full((2,), 40, jnp.int32)
        a = sequence.posterior_from_predicted_t0(
            sched, batch.seq_idx, probs, t, gen
        )
        b = sequence.posterior_from_predicted_t0(
            sched, batch.seq_idx, probs, t, gen, s=t - 1
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_orientation_s_default_matches_explicit(self, harness, batch):
        key = jax.random.key(7)
        gen = batch.generation_mask & batch.residue_mask
        t = jnp.full((2,), 40, jnp.int32)
        a = orientation.reverse_step(
            key, harness.orientation_tables, batch.orientations, batch.orientations,
            t, gen,
        )
        b = orientation.reverse_step(
            key, harness.orientation_tables, batch.orientations, batch.orientations,
            t, gen, s=t - 1,
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_respaced_variance_identity(self, harness):
        """q(x_s | x_t, x0) must be marginally consistent with q(x_s | x0):
        mean-coefficient^2 on eps plus the posterior variance equals
        1 - abar_s, for EVERY s < t.  This is the algebraic core of the
        respaced posterior; if it holds, composing any stride of reverse
        steps with oracle predictions reproduces the forward marginals."""
        sched = harness.sched
        abar = np.asarray(sched.alpha_bar, np.float64)
        one_minus = np.asarray(sched.one_minus_alpha_bar_sqrt, np.float64) ** 2
        for t in (5, 17, 40, 99):
            for s in (0, 1, t // 2, t - 1):
                if s >= t:
                    continue
                alpha_ts = abar[t] / abar[s]
                beta_ts = 1.0 - alpha_ts
                # x_t = sqrt(abar_t) x0 + sqrt(1-abar_t) eps; the posterior
                # mean's eps coefficient:
                c_eps = np.sqrt(alpha_ts) * (1 - abar[s]) / one_minus[t] \
                    * np.sqrt(one_minus[t])
                beta_tilde = (1 - abar[s]) / one_minus[t] * beta_ts
                np.testing.assert_allclose(
                    c_eps**2 + beta_tilde, 1 - abar[s], rtol=1e-5
                )

    def test_oracle_eps_respaced_jump_lands_on_posterior_mean(self, harness):
        """One respaced jump t -> s with the TRUE eps and zero noise lands
        on the posterior mean sqrt(abar_s) x0 + c_eps * eps with
        c_eps = sqrt(alpha_ts)(1-abar_s)/sqrt(1-abar_t).  c_eps is SMALLER
        than the s-level forward coefficient sqrt(1-abar_s) — the
        deliberate error-contraction of the posterior-mean
        parameterization (diffusion/coordinate.py reverse_step for why the
        'exact' eta-DDIM alternative measured 200x worse)."""
        sched = harness.sched
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.normal(size=(2, L, 3)).astype(np.float32))
        gen = jnp.ones((2, L), bool)
        t = jnp.full((2,), 80, jnp.int32)
        s = jnp.full((2,), 20, jnp.int32)
        x_t, eps = coordinate.diffuse_from_t0(
            jax.random.key(1), sched, x0, t, gen
        )
        x_s = coordinate.reverse_step(
            jax.random.key(2), sched, x_t, eps, t, gen,
            noise_scale=0.0, s=s, x0_clip=None,
        )
        abar = np.asarray(sched.alpha_bar, np.float64)
        one_minus = np.asarray(sched.one_minus_alpha_bar_sqrt, np.float64) ** 2
        alpha_ts = abar[80] / abar[20]
        c_eps = np.sqrt(alpha_ts) * (1 - abar[20]) / np.sqrt(one_minus[80])
        assert c_eps < np.sqrt(1 - abar[20])  # the contraction property
        want = np.sqrt(abar[20]) * np.asarray(x0) + c_eps * np.asarray(eps)
        np.testing.assert_allclose(np.asarray(x_s), want, atol=1e-4)


class TestFewStepSampler:
    def test_full_length_n_steps_is_identity(self, harness, batch, state):
        a = harness.sample(state.params, batch, jax.random.key(2))
        b = harness.sample(state.params, batch, jax.random.key(2),
                           n_steps=harness.sched.T)
        np.testing.assert_array_equal(np.asarray(a.seq_idx),
                                      np.asarray(b.seq_idx))
        np.testing.assert_allclose(np.asarray(a.translations),
                                   np.asarray(b.translations),
                                   rtol=1e-5, atol=1e-6)

    def test_short_chain_valid_output(self, harness, batch, state):
        res = harness.sample(state.params, batch, jax.random.key(4),
                             n_steps=10, return_trajectory=True)
        assert res.seq_trajectory.shape[0] == 10
        assert np.isfinite(np.asarray(res.translations)).all()
        # context clamped
        ctx = ~np.asarray(batch.generation_mask)
        np.testing.assert_array_equal(
            np.asarray(res.seq_idx)[ctx], np.asarray(batch.seq_idx)[ctx]
        )
        # orthonormal frames survive the strided orientation jumps
        o = np.asarray(res.orientations)
        eye = np.einsum("blij,blkj->blik", o, o)
        np.testing.assert_allclose(
            eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-3
        )

    def test_fewstep_composes_with_fanout_and_t_restart(self, harness, batch,
                                                        state):
        res = harness.sample(state.params, batch, jax.random.key(6),
                             n_designs=2, n_steps=5, t_start=20)
        assert res.seq_idx.shape == (4, L)
        assert np.isfinite(np.asarray(res.translations)).all()

    def test_overfit_model_quality_survives_respacing(self, harness, batch):
        """Overfit one complex, then check the 10-step chain still recovers
        it nearly as well as the 100-step chain (the accelerator must not
        wreck what the model knows)."""
        import optax

        state = harness.init(jax.random.key(1), batch)
        step = harness.make_train_step(donate=False)
        for _ in range(150):
            state, m = step(state, batch, jax.random.key(8))
        full = harness.sample(state.params, batch, jax.random.key(9),
                              noise_scale=0.0)
        few = harness.sample(state.params, batch, jax.random.key(9),
                             noise_scale=0.0, n_steps=10)
        gen = np.asarray(batch.generation_mask & batch.residue_mask)
        aar_full = (np.asarray(full.seq_idx) == np.asarray(batch.seq_idx))[gen].mean()
        aar_few = (np.asarray(few.seq_idx) == np.asarray(batch.seq_idx))[gen].mean()
        assert aar_few >= aar_full - 0.25
        d_full = np.abs(np.asarray(full.translations) - np.asarray(batch.translations))[gen].mean()
        d_few = np.abs(np.asarray(few.translations) - np.asarray(batch.translations))[gen].mean()
        assert d_few < max(3.0 * d_full, 0.5)


class TestCoordReverseModes:
    """Round-3 scatter mitigation: mode="ddim" and the hybrid/high-t knobs
    (probe_scatter.py localized the scattered-design mechanism to frozen
    high-t translation transport; coordinate.py reverse_step docs)."""

    def _inputs(self, harness, batch, t_val=40):
        gen = batch.generation_mask & batch.residue_mask
        x_t = batch.translations + 0.3
        eps_hat = jnp.ones_like(x_t) * 0.1
        t = jnp.full((2,), t_val, jnp.int32)
        return gen, x_t, eps_hat, t

    def test_ddim_equals_posterior_at_noise_scale_one(self, harness, batch):
        """The variance identity makes the two parameterizations identical
        at noise_scale = 1 (the exact DDPM posterior)."""
        gen, x_t, eps_hat, t = self._inputs(harness, batch)
        key = jax.random.key(11)
        a = coordinate.reverse_step(
            key, harness.sched, x_t, eps_hat, t, gen, noise_scale=1.0,
            mode="posterior",
        )
        b = coordinate.reverse_step(
            key, harness.sched, x_t, eps_hat, t, gen, noise_scale=1.0,
            mode="ddim",
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_ddim_ns0_preserves_marginal_radius(self, harness, batch):
        """With eps_hat = the true carried residual, the deterministic DDIM
        step keeps the residual at the marginal radius sqrt(1-abar_s),
        while the posterior mean contracts it (the freeze mechanism)."""
        sched = harness.sched
        gen = jnp.ones_like(batch.generation_mask)
        x0 = jnp.zeros_like(batch.translations)
        eps = jax.random.normal(jax.random.key(3), x0.shape)
        t_val, s_val = 90, 70
        t = jnp.full((2,), t_val, jnp.int32)
        s = jnp.full((2,), s_val, jnp.int32)
        abar = np.asarray(sched.alpha_bar, np.float64)
        x_t = (
            np.sqrt(abar[t_val]) * x0 + np.sqrt(1 - abar[t_val]) * eps
        ).astype(jnp.float32)
        key = jax.random.key(4)
        for mode, expected_coef in (
            ("ddim", np.sqrt(1 - abar[s_val])),
            ("posterior",
             np.sqrt(abar[t_val] / abar[s_val]) * (1 - abar[s_val])
             / (1 - abar[t_val]) * np.sqrt(1 - abar[t_val])),
        ):
            x_s = coordinate.reverse_step(
                key, sched, x_t, eps, t, gen, noise_scale=0.0, s=s,
                mode=mode,
            )
            resid = np.asarray(x_s) - np.sqrt(abar[s_val]) * np.asarray(x0)
            np.testing.assert_allclose(
                resid, expected_coef * np.asarray(eps), rtol=1e-4, atol=1e-5
            )
        assert np.sqrt(1 - abar[s_val]) > (
            np.sqrt(abar[t_val] / abar[s_val]) * (1 - abar[s_val])
            / np.sqrt(1 - abar[t_val])
        )

    def test_sampler_hybrid_and_hight_schedule_run(self, harness, batch, state):
        """Smoke: the sampler knobs compose with few-step + fan-out and keep
        context clamped."""
        res = harness.sample(
            state.params, batch, jax.random.key(9), n_steps=8,
            noise_scale=0.0, coord_ddim_t_min=50, step_schedule="hight",
        )
        assert bool(jnp.all(jnp.isfinite(res.translations)))
        ctx = ~(batch.generation_mask & batch.residue_mask)
        np.testing.assert_array_equal(
            np.asarray(res.translations)[np.asarray(ctx)],
            np.asarray(batch.translations)[np.asarray(ctx)],
        )

    def test_hight_schedule_denser_at_high_t(self):
        """The 'hight' t-subsequence must start at t_start, end at 1, be
        strictly descending, and have smaller early jumps than late ones."""
        t_start, n_steps = 100, 25
        u = np.linspace(0.0, 1.0, n_steps)
        t_seq = np.unique(
            np.round(1.0 + (t_start - 1.0) * np.sqrt(1.0 - u)).astype(np.int64)
        )[::-1]
        assert t_seq[0] == t_start and t_seq[-1] == 1
        jumps = -np.diff(t_seq)
        assert np.all(jumps > 0)
        assert jumps[:3].mean() < jumps[-3:].mean()


class TestFineTail:
    """Fine-tail schedule (sample(n_fine_tail=k)) — the round-4 fast
    STOCHASTIC mechanism: the final k timesteps run at stride 1 so
    noise_t_max <= k injects noise only between single-step posterior
    contractions (the full-length deferred-noise regime), never before a
    respaced jump (the measured scatter amplifier, DESIGN.md round-3)."""

    def test_fine_tail_schedule_structure(self):
        from diffab_pytorch_tpu.sampling.sampler import timestep_schedule

        t_seq = timestep_schedule(60, 22, n_fine_tail=12)
        assert t_seq[0] == 60 and t_seq[-1] == 1
        assert np.all(-np.diff(t_seq) > 0)  # strictly descending
        assert len(t_seq) <= 22
        # the tail is EXACTLY 12, 11, ..., 1 at stride 1
        np.testing.assert_array_equal(t_seq[-12:], np.arange(12, 0, -1))
        # every coarse element sits strictly above the tail
        assert t_seq[:-12].min() > 12
        # degenerate cases
        np.testing.assert_array_equal(
            timestep_schedule(10, 20, n_fine_tail=5), np.arange(10, 0, -1)
        )  # n_steps >= t_start: full chain
        np.testing.assert_array_equal(
            timestep_schedule(8, 12, n_fine_tail=9), np.arange(8, 0, -1)
        )  # tail covers everything

    def test_fine_tail_noisy_steps_are_single_step(self):
        """With noise_t_max = k = n_fine_tail, every step that can inject
        noise is a (t, t-1) SINGLE step — the structural property the
        recipe rests on."""
        from diffab_pytorch_tpu.sampling.sampler import timestep_schedule

        k = 12
        t_seq = timestep_schedule(60, 22, n_fine_tail=k)
        s_seq = np.append(t_seq[1:], 0)
        noisy = t_seq <= k
        np.testing.assert_array_equal(s_seq[noisy], t_seq[noisy] - 1)

    def test_fine_tail_chain_runs_and_clamps_context(self, harness, batch,
                                                     state):
        res = harness.sample(
            state.params, batch, jax.random.key(13), n_steps=8,
            n_fine_tail=4, noise_t_max=4, noise_scale=1.0,
            init="chord", t_start=20,
        )
        assert bool(jnp.all(jnp.isfinite(res.translations)))
        ctx = ~(batch.generation_mask & batch.residue_mask)
        np.testing.assert_array_equal(
            np.asarray(res.translations)[np.asarray(ctx)],
            np.asarray(batch.translations)[np.asarray(ctx)],
        )

    def test_fine_tail_validation(self, harness, batch, state):
        with pytest.raises(ValueError, match="n_fine_tail"):
            harness.sample(state.params, batch, jax.random.key(0),
                           n_steps=8, n_fine_tail=8)
        with pytest.raises(ValueError, match="n_fine_tail"):
            harness.sample(state.params, batch, jax.random.key(0),
                           n_steps=8, n_fine_tail=2, step_schedule="hight")


class TestCoordSolvers:
    """Higher-order coordinate solvers (sample(coord_solver=...)) — the
    few-step scatter countermeasure: respaced-jump scatter is driven by
    the jump size amplifying eps_hat bias (DESIGN.md round-3), so both
    solvers improve the x0 estimate and keep the posterior-mean step."""

    def test_reverse_step_from_x0_matches_reverse_step(self, harness, batch):
        """With x0_hat = predicted_x0(...), the explicit-x0 step is the
        posterior step exactly (same key, same draw)."""
        sched = harness.sched
        key = jax.random.key(11)
        gen = batch.generation_mask & batch.residue_mask
        x_t = batch.translations + 0.3
        eps_hat = jnp.ones_like(x_t) * 0.1
        t = jnp.full((2,), 60, jnp.int32)
        s = jnp.full((2,), 37, jnp.int32)
        a = coordinate.reverse_step(
            key, sched, x_t, eps_hat, t, gen, x0_clip=5.0, noise_scale=0.7,
            s=s,
        )
        x0 = coordinate.predicted_x0(sched, x_t, eps_hat, t)
        b = coordinate.reverse_step_from_x0(
            key, sched, x_t, x0, t, gen, x0_clip=5.0, noise_scale=0.7, s=s
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    @pytest.mark.parametrize("solver", ["ab2", "heun"])
    def test_solver_chains_finite_and_context_clamped(
        self, harness, batch, state, solver
    ):
        res = jax.jit(
            lambda p, b, k: harness.sample(
                p, b, k, n_steps=8, noise_scale=0.0, coord_solver=solver
            )
        )(state.params, batch, jax.random.key(5))
        x = np.asarray(res.translations)
        assert np.isfinite(x).all()
        ctx = np.asarray(batch.residue_mask & ~batch.generation_mask)
        np.testing.assert_array_equal(
            x[ctx], np.asarray(batch.translations)[ctx]
        )

    def test_fully_gated_solver_is_first_order(self, harness, batch, state):
        """coord_solver_t_min >= T disables every correction: the chain
        must reproduce the plain posterior chain (same keys)."""
        run = lambda **kw: np.asarray(
            jax.jit(
                lambda p, b, k: harness.sample(
                    p, b, k, n_steps=8, noise_scale=0.0, **kw
                )
            )(state.params, batch, jax.random.key(6)).translations
        )
        base = run()
        for solver in ("ab2", "heun"):
            gated = run(coord_solver=solver, coord_solver_t_min=10**6)
            np.testing.assert_allclose(gated, base, atol=1e-5)

    def test_solver_composes_with_fanout_and_sc_knobs(self, harness, batch,
                                                      state):
        res = jax.jit(
            lambda p, b, k: harness.sample(
                p, b, k, n_steps=6, coord_solver="ab2", n_designs=2,
                step_schedule="hight",
            )
        )(state.params, batch, jax.random.key(7))
        assert res.translations.shape[0] == 2 * batch.batch_size
        assert np.isfinite(np.asarray(res.translations)).all()

    def test_validation(self, harness, batch, state):
        with pytest.raises(ValueError, match="coord_solver"):
            harness.sample(state.params, batch, jax.random.key(0),
                           coord_solver="rk4")
        with pytest.raises(ValueError, match="composes only"):
            harness.sample(state.params, batch, jax.random.key(0),
                           coord_solver="ab2", coord_ddim_t_min=50)
