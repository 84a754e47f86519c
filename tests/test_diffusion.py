"""Diffusion-process parity tests.

Behavioral port of the reference tests/test_diffusion.py properties (the
parity contract per BASELINE.md) plus golden schedule checks against the
torch formula and reverse-step tests for the kernels the reference lacks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffab_pytorch_tpu.diffusion import (
    CoordinateDiffuser,
    OrientationDiffuser,
    SequenceDiffuser,
    coordinate,
    cosine_variance_schedule,
    sequence,
)
from diffab_pytorch_tpu.geometry import so3

BSZ, L, T = 32, 100, 100


def full(v):
    return jnp.full((BSZ,), v, dtype=jnp.int32)


def test_cosine_variance_schedule_golden_vs_torch():
    """Schedule tables match the reference torch computation exactly
    (diffusion.py:11-35) to fp32 resolution."""
    torch = pytest.importorskip("torch")
    import math

    for T_, s, bmax in [(100, 0.01, 0.999), (100, 8e-3, 0.999), (50, 0.02, 0.5)]:
        t = torch.arange(T_ + 1)
        f_t = torch.cos((t / T_ + s) / (1 + s) * math.pi / 2.0).square()
        alpha_bar = f_t / f_t[0]
        beta = torch.cat(
            [torch.tensor([0.0]),
             torch.clip(1 - alpha_bar[1:] / alpha_bar[:-1], min=1e-5, max=bmax)]
        )
        sched = cosine_variance_schedule(T_, s=s, beta_max=bmax)
        # our tables are computed in float64 then cast; torch's f32
        # 1 - abar_t/abar_{t-1} carries ~1e-5 relative cancellation error,
        # so the bound is the reference's own rounding, not ours.
        np.testing.assert_allclose(sched.beta, beta.numpy(), rtol=2e-5, atol=1e-7)
        np.testing.assert_allclose(
            sched.alpha_bar, alpha_bar.numpy(), rtol=1e-6, atol=1e-7
        )
        np.testing.assert_allclose(sched.alpha, (1 - beta).numpy(), rtol=2e-5, atol=1e-7)
        np.testing.assert_allclose(
            sched.alpha_bar_sqrt, alpha_bar.sqrt().numpy(), rtol=1e-6, atol=1e-4
        )
        assert sched.T == T_


def test_schedule_properties():
    sched = cosine_variance_schedule(T, s=0.01)
    assert float(sched.beta[0]) == 0.0
    assert float(sched.alpha_bar[0]) == 1.0
    # alpha_bar decreases monotonically, beta in [1e-5, beta_max] for t>=1
    assert bool(jnp.all(jnp.diff(sched.alpha_bar) < 0))
    assert bool(jnp.all(sched.beta[1:] >= 1e-5))
    assert bool(jnp.all(sched.beta[1:] <= 0.999))


class TestSequenceDiffuser:
    diffuser = SequenceDiffuser(T=T, s=0.01, beta_max=0.999)

    def test_forward_prob_monotonicity(self):
        """p(original aa) strictly decreases with t — reference
        tests/test_diffusion.py:25-54, vectorized."""
        key = jax.random.key(0)
        seq = jax.random.randint(key, (BSZ, L), 0, 20)
        generate_all = jnp.ones((BSZ, L), dtype=bool)

        for fn in (self.diffuser.forward_prob_single_step,
                   self.diffuser.forward_prob_from_t0):
            p_1 = fn(seq, full(1), generate_all)
            p_90 = fn(seq, full(90), generate_all)
            assert p_1.shape == p_90.shape == (BSZ, L, 21)
            orig_1 = jnp.take_along_axis(p_1, seq[..., None], axis=-1)
            orig_90 = jnp.take_along_axis(p_90, seq[..., None], axis=-1)
            assert bool(jnp.all(orig_1 > orig_90))
            # rows are distributions
            np.testing.assert_allclose(p_1.sum(-1), 1.0, rtol=1e-5)

    def test_context_positions_are_point_masses(self):
        key = jax.random.key(1)
        seq = jax.random.randint(key, (BSZ, L), 0, 20)
        gen_mask = jax.random.bernoulli(jax.random.key(2), 0.5, (BSZ, L))
        p = self.diffuser.forward_prob_from_t0(seq, full(90), gen_mask)
        onehot = jax.nn.one_hot(seq, 21)
        np.testing.assert_allclose(
            jnp.where(gen_mask[..., None], onehot, p), onehot, atol=1e-7
        )

    def test_posterior_concentrates_on_original(self):
        """Posterior mass on the original aa > 1/20 — reference
        tests/test_diffusion.py:56-74."""
        key = jax.random.key(3)
        seq = jax.random.randint(key, (BSZ, L), 0, 20)
        gen_mask = jax.random.bernoulli(jax.random.key(4), 0.5, (BSZ, L))
        p_10 = self.diffuser.forward_prob_from_t0(seq, full(10), gen_mask)
        seq_sampled = sequence.categorical_from_probs(jax.random.key(5), p_10)
        posterior = self.diffuser.posterior_single_step(
            seq_sampled, seq, full(10), gen_mask
        )
        assert posterior.shape == (BSZ, L, 21)
        orig = jnp.take_along_axis(posterior, seq[..., None], axis=-1)
        assert bool(jnp.all(orig > 1 / 20.0))

    def test_diffuse_deviation_grows_with_t(self):
        """Samples at t=99 deviate more than at t=2 — reference
        tests/test_diffusion.py:77-103."""
        seq = jax.random.randint(jax.random.key(6), (BSZ, L), 0, 20)
        generate_all = jnp.ones((BSZ, L), dtype=bool)
        seq_t2, post_t2 = self.diffuser.diffuse_from_t0(
            jax.random.key(7), seq, full(2), generate_all
        )
        seq_t99, post_t99 = self.diffuser.diffuse_from_t0(
            jax.random.key(8), seq, full(99), generate_all
        )
        assert seq_t2.shape == seq_t99.shape == (BSZ, L)
        assert post_t2.shape == post_t99.shape == (BSZ, L, 21)
        assert int((seq_t2 != seq).sum()) < int((seq_t99 != seq).sum())

    def test_reverse_step_recovers_sequence(self):
        """With an oracle p(s_0), iterating reverse_step from s_T recovers
        the original sequence on generated positions."""
        sched = self.diffuser.sched
        seq0 = jax.random.randint(jax.random.key(9), (4, L), 0, 20)
        gen_mask = jnp.ones((4, L), dtype=bool)
        s0_probs = jax.nn.one_hot(seq0, 21)

        seq_t = sequence.sample_prior(jax.random.key(10), seq0, gen_mask)

        def body(seq_t, t):
            key = jax.random.fold_in(jax.random.key(11), t)
            return sequence.reverse_step(
                key, sched, seq_t, s0_probs, jnp.full((4,), t), gen_mask
            ), None

        seq_rec, _ = jax.lax.scan(body, seq_t, jnp.arange(T, 0, -1))
        # the oracle pulls everything back to seq0
        assert float((seq_rec == seq0).mean()) > 0.99

    def test_train_sample_semantics_agree(self):
        """The training KL target and the sampling distribution are the SAME
        transform of the head output (DESIGN.md §2 #15): with an oracle head
        p_hat(s_0) = onehot(s_0), the predicted posterior equals the true
        posterior exactly, so the per-position KL is ~0 at every t."""
        sched = self.diffuser.sched
        seq0 = jax.random.randint(jax.random.key(12), (BSZ, L), 0, 20)
        gen_mask = jnp.ones((BSZ, L), dtype=bool)
        s0_probs = jax.nn.one_hot(seq0, 21)

        for tval in (1, 2, 50, T):
            t = full(tval)
            seq_t, post_true = sequence.diffuse_from_t0(
                jax.random.fold_in(jax.random.key(13), tval),
                sched, seq0, t, gen_mask,
            )
            log_post_pred = sequence.log_posterior_from_predicted_t0(
                sched, seq_t, s0_probs, t, gen_mask
            )
            kl = jnp.sum(
                post_true * (jnp.log(jnp.maximum(post_true, 1e-12)) - log_post_pred),
                axis=-1,
            )
            np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-5)

    def test_vocab_size_respected(self):
        """aa_vocab_size argument is honored (reference ignores it,
        SURVEY.md §2.9#5)."""
        d = SequenceDiffuser(T=T, aa_vocab_size=5)
        seq = jnp.zeros((2, 3), dtype=jnp.int32)
        p = d.forward_prob_from_t0(seq, jnp.array([50, 50]), jnp.ones((2, 3), bool))
        assert p.shape == (2, 3, 5)


class TestCoordinateDiffuser:
    diffuser = CoordinateDiffuser(T=T, s=0.01, beta_max=0.999)

    def test_shapes(self):
        xyz = jax.random.normal(jax.random.key(0), (BSZ, L, 3))
        t = jax.random.randint(jax.random.key(1), (BSZ,), 1, T + 1)
        gen_mask = jax.random.bernoulli(jax.random.key(2), 0.5, (BSZ, L))
        xyz_t, eps = self.diffuser.diffuse_from_t0(jax.random.key(3), xyz, t, gen_mask)
        assert xyz_t.shape == (BSZ, L, 3)
        assert eps.shape == (BSZ, L, 3)
        # context rows unchanged
        np.testing.assert_allclose(
            jnp.where(gen_mask[..., None], xyz, xyz_t), xyz, atol=1e-7
        )

    def test_reverse_step_with_oracle_eps(self):
        """Reverse diffusion with the true eps at each step reproduces x0 in
        distribution; the final t=1 step is exactly deterministic."""
        sched = self.diffuser.sched
        x0 = jax.random.normal(jax.random.key(4), (8, L, 3))
        gen_mask = jnp.ones((8, L), dtype=bool)
        t1 = jnp.ones((8,), dtype=jnp.int32)
        x1, eps = coordinate.diffuse_from_t0(jax.random.key(5), sched, x0, t1, gen_mask)
        x0_rec = coordinate.reverse_step(
            jax.random.key(6), sched, x1, eps, t1, gen_mask
        )
        np.testing.assert_allclose(x0_rec, x0, atol=1e-4)

    def test_predicted_x0_inverts_forward(self):
        sched = self.diffuser.sched
        x0 = jax.random.normal(jax.random.key(7), (4, L, 3))
        t = jnp.array([10, 40, 70, 99])
        gen = jnp.ones((4, L), bool)
        x_t, eps = coordinate.diffuse_from_t0(jax.random.key(8), sched, x0, t, gen)
        np.testing.assert_allclose(
            coordinate.predicted_x0(sched, x_t, eps, t), x0, atol=1e-4
        )


class TestOrientationDiffuser:
    diffuser = OrientationDiffuser(T=T, s=0.01, beta_max=0.999)

    def test_shapes_and_validity(self):
        r0 = so3.uniform(jax.random.key(0), (BSZ, L))
        gen_mask = jax.random.bernoulli(jax.random.key(1), 0.5, (BSZ, L))
        r_t = self.diffuser.diffuse_from_t0(jax.random.key(2), r0, gen_mask, full(50))
        assert r_t.shape == (BSZ, L, 3, 3)
        prod = jnp.einsum("...ij,...ik->...jk", r_t, r_t)
        np.testing.assert_allclose(
            prod, jnp.broadcast_to(jnp.eye(3), prod.shape), atol=1e-4
        )
        # context rows unchanged
        np.testing.assert_allclose(
            jnp.where(gen_mask[..., None, None], r0, r_t), r0, atol=1e-7
        )

    def test_noise_grows_with_t(self):
        r0 = so3.uniform(jax.random.key(3), (BSZ, L))
        gen = jnp.ones((BSZ, L), bool)

        def mean_geo_dist(r_t):
            rel = jnp.einsum("...ji,...jk->...ik", r0, r_t)
            return float(jnp.linalg.norm(so3.rotation_matrix_to_vector(rel), axis=-1).mean())

        d10 = mean_geo_dist(self.diffuser.diffuse_from_t0(jax.random.key(4), r0, gen, full(10)))
        d90 = mean_geo_dist(self.diffuser.diffuse_from_t0(jax.random.key(5), r0, gen, full(90)))
        assert d10 < d90

    def test_reverse_final_step_is_deterministic(self):
        """t=1 reverse step lands exactly on the predicted R0 (sigma_0 = 0)."""
        r0_hat = so3.uniform(jax.random.key(6), (4, L))
        r1 = so3.uniform(jax.random.key(7), (4, L))
        gen = jnp.ones((4, L), bool)
        r_prev = self.diffuser.reverse_step(
            jax.random.key(8), r1, r0_hat, jnp.ones((4,), jnp.int32), gen
        )
        rel = jnp.einsum("...ji,...jk->...ik", r_prev, r0_hat)
        dist = jnp.linalg.norm(so3.rotation_matrix_to_vector(rel), axis=-1)
        assert float(dist.max()) < 2e-3  # within one histogram bin of exact

    def test_reverse_with_oracle_r0_contracts(self):
        """Iterating reverse_step with oracle R0 from uniform R_T converges
        to R0."""
        tables = self.diffuser.tables
        r0 = so3.uniform(jax.random.key(9), (4, 32))
        gen = jnp.ones((4, 32), bool)
        from diffab_pytorch_tpu.diffusion import orientation

        r_t = orientation.sample_prior(jax.random.key(10), r0, gen)

        def body(r_t, t):
            key = jax.random.fold_in(jax.random.key(11), t)
            return orientation.reverse_step(
                key, tables, r_t, r0, jnp.full((4,), t), gen
            ), None

        r_rec, _ = jax.lax.scan(body, r_t, jnp.arange(T, 0, -1))
        rel = jnp.einsum("...ji,...jk->...ik", r_rec, r0)
        dist = jnp.linalg.norm(so3.rotation_matrix_to_vector(rel), axis=-1)
        assert float(dist.max()) < 2e-3

    # ---- mode="posterior": the rotational beta-tilde analogue (round 3) --

    def test_posterior_reverse_final_step_lands_on_prediction(self):
        """s=0: w_t = 0 and sigma_tilde = 0, so the posterior step lands on
        R0_hat exactly like the renoise mode's sigma_0 = 0 terminal."""
        from diffab_pytorch_tpu.diffusion import orientation

        r0_hat = so3.uniform(jax.random.key(20), (4, L))
        r1 = so3.uniform(jax.random.key(21), (4, L))
        gen = jnp.ones((4, L), bool)
        r_prev = orientation.reverse_step(
            jax.random.key(22), self.diffuser.tables, r1, r0_hat,
            jnp.ones((4,), jnp.int32), gen, mode="posterior",
        )
        rel = jnp.einsum("...ji,...jk->...ik", r_prev, r0_hat)
        dist = jnp.linalg.norm(so3.rotation_matrix_to_vector(rel), axis=-1)
        assert float(dist.max()) < 2e-3

    def test_posterior_reverse_with_oracle_r0_contracts(self):
        """The full posterior-mode chain with oracle R0 converges to R0 from
        uniform R_T, like the renoise chain."""
        from diffab_pytorch_tpu.diffusion import orientation

        tables = self.diffuser.tables
        r0 = so3.uniform(jax.random.key(23), (4, 32))
        gen = jnp.ones((4, 32), bool)
        r_t = orientation.sample_prior(jax.random.key(24), r0, gen)

        def body(r_t, t):
            key = jax.random.fold_in(jax.random.key(25), t)
            return orientation.reverse_step(
                key, tables, r_t, r0, jnp.full((4,), t), gen,
                mode="posterior",
            ), None

        r_rec, _ = jax.lax.scan(body, r_t, jnp.arange(T, 0, -1))
        rel = jnp.einsum("...ji,...jk->...ik", r_rec, r0)
        dist = jnp.linalg.norm(so3.rotation_matrix_to_vector(rel), axis=-1)
        assert float(dist.max()) < 2e-3

    def test_posterior_reverse_memory_and_variance(self):
        """At mid-t the posterior step (a) keeps memory of R_t — its output
        correlates with R_t where the renoise mode's is independent of it —
        and (b) injects a much smaller noise angle (sigma_tilde << sigma_s),
        the measured over-noising the mode exists to fix."""
        from diffab_pytorch_tpu.diffusion import orientation

        tables = self.diffuser.tables
        n = 256
        r0 = so3.uniform(jax.random.key(26), (1, n))
        gen = jnp.ones((1, n), bool)
        t = jnp.full((1,), 60, jnp.int32)
        r_t = orientation.diffuse_from_t0(jax.random.key(27), tables, r0, t, gen)

        def geo(a, b):
            rel = jnp.einsum("...ji,...jk->...ik", a, b)
            return jnp.linalg.norm(so3.rotation_matrix_to_vector(rel), axis=-1)

        out = {}
        for mode in ("renoise", "posterior"):
            # noise_scale=0 isolates the conditional mean; the full step's
            # deviation from it is the injected noise angle
            mean = orientation.reverse_step(
                jax.random.key(28), tables, r_t, r0, t, gen,
                noise_scale=0.0, mode=mode,
            )
            step = orientation.reverse_step(
                jax.random.key(28), tables, r_t, r0, t, gen, mode=mode
            )
            out[mode] = {
                "noise_angle": float(geo(step, mean).mean()),
                "dist_to_rt": float(geo(mean, r_t).mean()),
            }
        # (b) the injected angle is several-fold smaller
        assert out["posterior"]["noise_angle"] < 0.5 * out["renoise"]["noise_angle"]
        # (a) the posterior mean is pulled toward R_t; the renoise mean
        # ignores R_t entirely (it is scale_rot(R0, sqrt(abar_s)))
        assert out["posterior"]["dist_to_rt"] < out["renoise"]["dist_to_rt"]

    def test_posterior_reverse_unknown_mode_raises(self):
        from diffab_pytorch_tpu.diffusion import orientation

        with np.testing.assert_raises(ValueError):
            orientation.reverse_step(
                jax.random.key(0), self.diffuser.tables,
                so3.uniform(jax.random.key(1), (1, 4)),
                so3.uniform(jax.random.key(2), (1, 4)),
                jnp.ones((1,), jnp.int32), jnp.ones((1, 4), bool),
                mode="nope",
            )


def test_all_diffusers_jittable_together():
    """The three forward processes compose inside one jit (the _add_noise
    pattern, reference diffab_pytorch.py:778-806)."""
    sched = cosine_variance_schedule(T, s=0.01)
    seq_d = SequenceDiffuser(T, sched=sched)
    coord_d = CoordinateDiffuser(T, sched=sched)
    orient_d = OrientationDiffuser(T)

    @jax.jit
    def add_noise(key, seq0, x0, r0, gen_mask, t):
        k1, k2, k3 = jax.random.split(key, 3)
        s_t, post = seq_d.diffuse_from_t0(k1, seq0, t, gen_mask)
        x_t, eps = coord_d.diffuse_from_t0(k2, x0, t, gen_mask)
        r_t = orient_d.diffuse_from_t0(k3, r0, gen_mask, t)
        return s_t, post, x_t, eps, r_t

    b, n = 4, 16
    out = add_noise(
        jax.random.key(0),
        jnp.zeros((b, n), jnp.int32),
        jnp.zeros((b, n, 3)),
        so3.uniform(jax.random.key(1), (b, n)),
        jnp.ones((b, n), bool),
        jnp.array([1, 10, 50, 100]),
    )
    assert out[0].shape == (b, n)
    assert out[1].shape == (b, n, 21)
    assert out[2].shape == (b, n, 3)
    assert out[4].shape == (b, n, 3, 3)


class TestX0Clipping:
    """Static thresholding in the coordinate reverse step
    (diffusion/coordinate.py reverse_step x0_clip)."""

    def test_inactive_clip_is_algebraically_identical(self):
        from diffab_pytorch_tpu.diffusion import coordinate

        sched = cosine_variance_schedule(T, s=0.01)
        key = jax.random.key(0)
        x0 = jax.random.normal(jax.random.key(1), (2, 8, 3))
        gen = jnp.ones((2, 8), bool)
        t = jnp.array([40, 90])
        x_t, eps = coordinate.diffuse_from_t0(key, sched, x0, t, gen)
        # oracle eps: implied x0_hat == x0, well inside any sane clip
        a = coordinate.reverse_step(key, sched, x_t, eps, t, gen, x0_clip=None)
        b = coordinate.reverse_step(key, sched, x_t, eps, t, gen, x0_clip=50.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_clip_bounds_a_divergent_chain(self):
        """With a pathological eps-hat (amplifying feedback), the unclipped
        chain explodes; the clipped chain stays in the data region."""
        from diffab_pytorch_tpu.diffusion import coordinate

        sched = cosine_variance_schedule(T, s=0.01)
        gen = jnp.ones((1, 8), bool)

        def run(x0_clip):
            x = 1.0 * jax.random.normal(jax.random.key(2), (1, 8, 3))

            def body(x, t):
                tvec = jnp.full((1,), t, jnp.int32)
                eps_hat = -2.0 * x  # adversarial: pushes x away each step
                x = coordinate.reverse_step(
                    jax.random.fold_in(jax.random.key(3), t), sched, x,
                    eps_hat, tvec, gen, x0_clip=x0_clip,
                )
                return x, None

            x, _ = jax.lax.scan(body, x, jnp.arange(T, 0, -1))
            return float(jnp.abs(x).max())

        unclipped = run(None)
        clipped = run(5.0)
        assert unclipped > 100.0  # the failure mode is real
        assert clipped < 20.0  # bounded by clip + posterior noise

    def test_noise_scale_zero_is_deterministic(self):
        from diffab_pytorch_tpu.diffusion import coordinate

        sched = cosine_variance_schedule(T, s=0.01)
        gen = jnp.ones((1, 8), bool)
        x = jax.random.normal(jax.random.key(4), (1, 8, 3))
        eps = jax.random.normal(jax.random.key(5), (1, 8, 3))
        t = jnp.array([30])
        a = coordinate.reverse_step(jax.random.key(6), sched, x, eps, t, gen,
                                    noise_scale=0.0)
        b = coordinate.reverse_step(jax.random.key(7), sched, x, eps, t, gen,
                                    noise_scale=0.0)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # and differs from the stochastic step
        c = coordinate.reverse_step(jax.random.key(6), sched, x, eps, t, gen)
        assert float(jnp.abs(a - c).max()) > 1e-4


def test_orientation_noise_scale_zero_is_deterministic():
    """Orientation low-temperature analogue: noise_scale=0 lands exactly on
    the geodesically scaled prediction, independent of the key."""
    from diffab_pytorch_tpu.diffusion import orientation
    from diffab_pytorch_tpu.geometry import so3

    sched = cosine_variance_schedule(T, s=0.01)
    tables = orientation.make_orientation_tables(sched)
    gen = jnp.ones((1, 6), bool)
    r0 = so3.uniform(jax.random.key(0), (1, 6))
    r_t = so3.uniform(jax.random.key(1), (1, 6))
    t = jnp.array([40])

    a = orientation.reverse_step(jax.random.key(2), tables, r_t, r0, t, gen,
                                 noise_scale=0.0)
    b = orientation.reverse_step(jax.random.key(3), tables, r_t, r0, t, gen,
                                 noise_scale=0.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    expected = so3.scale_rot(r0, sched.alpha_bar_sqrt[t - 1])
    np.testing.assert_allclose(np.asarray(a), np.asarray(expected), atol=1e-5)
    # stochastic step differs
    c = orientation.reverse_step(jax.random.key(2), tables, r_t, r0, t, gen)
    assert float(jnp.abs(a - c).max()) > 1e-4
