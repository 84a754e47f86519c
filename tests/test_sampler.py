"""Reverse-sampler contracts: shapes, clamping, modes, t-restart.

The reference has no sampler to mirror (diffab_pytorch.py:770-776 is a
stub); these tests pin the semantics our design derives from the forward
processes (SURVEY.md §3.5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffab_pytorch_tpu.config import tiny_config
from diffab_pytorch_tpu.data.batch import synthetic_batch
from diffab_pytorch_tpu.sampling import optimize, sample
from diffab_pytorch_tpu.train import DiffAb

B, L = 2, 32


@pytest.fixture(scope="module")
def harness():
    return DiffAb(tiny_config())


@pytest.fixture(scope="module")
def batch():
    return synthetic_batch(jax.random.key(0), B, L, 15, n_generate=8)


@pytest.fixture(scope="module")
def params(harness, batch):
    return harness.init(jax.random.key(1), batch).params


def test_codesign_shapes_and_clamping(harness, batch, params):
    res = harness.sample(params, batch, jax.random.key(2))
    assert res.seq_idx.shape == (B, L)
    assert res.translations.shape == (B, L, 3)
    assert res.orientations.shape == (B, L, 3, 3)

    ctx = ~batch.generation_mask
    # context residues keep their input values exactly
    assert bool(jnp.all(res.seq_idx[ctx] == batch.seq_idx[ctx]))
    np.testing.assert_allclose(
        res.translations[ctx], batch.translations[ctx], atol=1e-6
    )
    np.testing.assert_allclose(
        res.orientations[ctx], batch.orientations[ctx], atol=1e-6
    )
    # generated residues actually changed
    gen = batch.generation_mask
    assert int((res.seq_idx[gen] != batch.seq_idx[gen]).sum()) > 0
    assert float(jnp.abs(res.translations[gen] - batch.translations[gen]).max()) > 0.01
    # orientations remain valid rotations
    prod = jnp.einsum("...ij,...ik->...jk", res.orientations, res.orientations)
    np.testing.assert_allclose(prod, jnp.broadcast_to(jnp.eye(3), prod.shape), atol=1e-3)


def test_fix_sequence_mode(harness, batch, params):
    """generate_sequence=False: sequence untouched everywhere, structure
    resampled on CDRs."""
    res = harness.sample(
        params, batch, jax.random.key(3), generate_sequence=False
    )
    assert bool(jnp.all(res.seq_idx == batch.seq_idx))
    gen = batch.generation_mask
    assert float(jnp.abs(res.translations[gen] - batch.translations[gen]).max()) > 0.01


def test_orientation_posterior_mode(harness, batch, params):
    """orientation_reverse='posterior' (the rotational beta-tilde analogue)
    runs the full chain, clamps context, and emits valid rotations."""
    res = harness.sample(
        params, batch, jax.random.key(17), orientation_reverse="posterior"
    )
    ctx = ~batch.generation_mask
    np.testing.assert_allclose(
        res.orientations[ctx], batch.orientations[ctx], atol=1e-6
    )
    prod = jnp.einsum("...ij,...ik->...jk", res.orientations, res.orientations)
    np.testing.assert_allclose(
        prod, jnp.broadcast_to(jnp.eye(3), prod.shape), atol=1e-3
    )
    gen = batch.generation_mask
    assert float(jnp.abs(res.translations[gen] - batch.translations[gen]).max()) > 0.01


def test_fix_structure_mode(harness, batch, params):
    res = harness.sample(
        params, batch, jax.random.key(4), generate_structure=False
    )
    np.testing.assert_allclose(res.translations, batch.translations, atol=1e-6)
    np.testing.assert_allclose(res.orientations, batch.orientations, atol=1e-6)
    gen = batch.generation_mask
    assert int((res.seq_idx[gen] != batch.seq_idx[gen]).sum()) > 0


def test_optimize_t_restart(harness, batch, params):
    """Renoising to small t stays close to the input; large t diverges more
    (BASELINE config #4 semantics)."""
    m = harness.model
    res_small = optimize(
        m, params, harness.sched, harness.orientation_tables, batch,
        jax.random.key(5), t_restart=5,
    )
    res_large = optimize(
        m, params, harness.sched, harness.orientation_tables, batch,
        jax.random.key(5), t_restart=95,
    )
    gen = batch.generation_mask
    d_small = float(jnp.abs(res_small.translations[gen] - batch.translations[gen]).mean())
    d_large = float(jnp.abs(res_large.translations[gen] - batch.translations[gen]).mean())
    assert d_small < d_large


def test_sampler_jits_and_is_deterministic(harness, batch, params):
    f = jax.jit(lambda p, b, k: harness.sample(p, b, k))
    r1 = f(params, batch, jax.random.key(6))
    r2 = f(params, batch, jax.random.key(6))
    assert bool(jnp.all(r1.seq_idx == r2.seq_idx))
    np.testing.assert_allclose(r1.translations, r2.translations, atol=0)
    r3 = f(params, batch, jax.random.key(7))
    assert int((r3.seq_idx != r1.seq_idx).sum()) > 0  # different key, different design


def test_invalid_args(harness, batch, params):
    with pytest.raises(ValueError, match="t_start"):
        harness.sample(params, batch, jax.random.key(8), t_start=0)
    with pytest.raises(ValueError, match="nothing to generate"):
        harness.sample(
            params, batch, jax.random.key(9),
            generate_structure=False, generate_sequence=False,
        )


def test_return_trajectory(harness, batch, params):
    res = harness.sample(params, batch, jax.random.key(11),
                         return_trajectory=True, t_start=10)
    assert res.seq_trajectory.shape == (10, B, L)
    assert res.translations_trajectory.shape == (10, B, L, 3)
    # last trajectory frame == final result
    np.testing.assert_array_equal(res.seq_trajectory[-1], res.seq_idx)
    np.testing.assert_allclose(res.translations_trajectory[-1], res.translations)
    # default: no trajectory fields
    res2 = harness.sample(params, batch, jax.random.key(11), t_start=5)
    assert res2.seq_trajectory is None


def test_auto_x0_clip_scales_with_the_patch(harness, batch, params):
    """The 'auto' x0 bound follows the context extent: on a patch whose
    coordinates legitimately reach |x| ~ 8, a shallow t-restart keeps the
    designed coordinates near the input, while an undersized fixed box
    visibly amputates them (the failure measured on TPU: fixed clip=5.0
    gave 26.8 A RMSD where the context-derived bound gave 1.3 A)."""
    big = batch.replace(xyz=batch.xyz * 6.0)
    gen = np.asarray(big.generation_mask & big.residue_mask)
    native = np.asarray(big.translations)
    extent = float(np.abs(native[np.asarray(big.residue_mask)]).max())
    assert extent > 4.0  # the scenario is real

    auto = harness.sample(params, big, jax.random.key(5), t_start=2)
    drift_auto = np.abs(np.asarray(auto.translations) - native)[gen].max()

    tight = harness.sample(params, big, jax.random.key(5), t_start=2, x0_clip=2.0)
    out_tight = np.abs(np.asarray(tight.translations))[gen]

    # shallow renoise + auto bound: geometry survives
    assert drift_auto < 2.0
    # the undersized box caps the implied x0 at ~2 (+ posterior noise)
    assert out_tight.max() < 3.5
    assert np.abs(np.asarray(tight.translations) - native)[gen].max() > 2.0


class TestChordInit:
    """Generation from the structural prior (sample(init="chord")): the
    designed coordinates start from the forward-noised anchor-anchor
    chord at t_start instead of pure noise at T — motivated by the
    scatter diagnosis (failures happen during high-t transport)."""

    def test_anchor_chord_exact_interpolation(self):
        from diffab_pytorch_tpu.sampling.sampler import anchor_chord

        x = jnp.arange(18, dtype=jnp.float32).reshape(1, 6, 3)
        ri = jnp.arange(6)[None]
        ci = jnp.ones((1, 6), jnp.int32)
        rm = jnp.ones((1, 6), bool)
        gm = jnp.zeros((1, 6), bool).at[0, 2:4].set(True)
        out, has = anchor_chord(x, ri, ci, rm, gm)
        out, xn = np.asarray(out), np.asarray(x)
        np.testing.assert_array_equal(np.asarray(has)[0], [0, 0, 1, 1, 0, 0])
        # context rows untouched
        np.testing.assert_array_equal(out[0, [0, 1, 4, 5]], xn[0, [0, 1, 4, 5]])
        # generated rows: linear between anchors 1 and 4 by residue index
        np.testing.assert_allclose(out[0, 2], xn[0, 1] + (xn[0, 4] - xn[0, 1]) / 3)
        np.testing.assert_allclose(out[0, 3], xn[0, 1] + 2 * (xn[0, 4] - xn[0, 1]) / 3)

    def test_anchor_chord_needs_both_anchors(self):
        """A designed run at a chain end (no following context anchor in
        the same chain) falls back to its input coordinates."""
        from diffab_pytorch_tpu.sampling.sampler import anchor_chord

        x = jnp.arange(18, dtype=jnp.float32).reshape(1, 6, 3)
        ri = jnp.arange(6)[None]
        ci = jnp.ones((1, 6), jnp.int32)
        rm = jnp.ones((1, 6), bool)
        gm = jnp.zeros((1, 6), bool).at[0, 4:].set(True)  # tail run
        out, has = anchor_chord(x, ri, ci, rm, gm)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
        assert not np.asarray(has).any()

    def test_chord_init_ignores_batch_cdr_values(self, harness, batch, params):
        """init='chord' must not read the batch's designed coordinates:
        poisoning them changes nothing (no ground-truth leakage)."""
        from diffab_pytorch_tpu.constants import ATOM

        gen = batch.generation_mask & batch.residue_mask
        poisoned = batch.replace(
            xyz=batch.xyz.at[:, :, ATOM.CA, :].add(
                jnp.where(gen[..., None], 100.0, 0.0)
            )
        )
        kw = dict(init="chord", t_start=11, n_steps=5)
        run = jax.jit(
            lambda p, b, k: harness.sample(p, b, k, **kw).translations
        )
        a = run(params, batch, jax.random.key(3))
        b_ = run(params, poisoned, jax.random.key(3))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)

    def test_chord_init_output_valid(self, harness, batch, params):
        res = jax.jit(
            lambda p, b, k: harness.sample(
                p, b, k, init="chord", t_start=11, n_steps=5, n_designs=2
            )
        )(params, batch, jax.random.key(4))
        x = np.asarray(res.translations)
        assert np.isfinite(x).all()
        ctx = np.asarray(
            jnp.repeat(batch.residue_mask & ~batch.generation_mask, 2, axis=0)
        )
        ref = np.asarray(jnp.repeat(batch.translations, 2, axis=0))
        np.testing.assert_array_equal(x[ctx], ref[ctx])

    def test_invalid_init(self, harness, batch, params):
        with pytest.raises(ValueError, match="init"):
            harness.sample(params, batch, jax.random.key(0), init="blah")

    def test_anchor_chord_frames_geodesic(self):
        """Orientation slerp: exact at the anchors' fractions, orthonormal
        everywhere, and equal to the shared frame when both anchors agree."""
        from diffab_pytorch_tpu.geometry import so3
        from diffab_pytorch_tpu.sampling.sampler import anchor_chord_frames

        ri = jnp.arange(6)[None]
        ci = jnp.ones((1, 6), jnp.int32)
        rm = jnp.ones((1, 6), bool)
        gm = jnp.zeros((1, 6), bool).at[0, 2:4].set(True)
        r = so3.uniform(jax.random.key(0), (1, 6))
        out, has = anchor_chord_frames(r, ri, ci, rm, gm)
        out = np.asarray(out)
        np.testing.assert_array_equal(np.asarray(has)[0], [0, 0, 1, 1, 0, 0])
        # context rows untouched
        np.testing.assert_array_equal(
            out[0, [0, 1, 4, 5]], np.asarray(r)[0, [0, 1, 4, 5]]
        )
        # generated rows: valid rotations on the geodesic between anchors
        # 1 and 4 — R(f) = R1 exp(f log(R1^T R4)) at f = 1/3, 2/3
        r1, r4 = np.asarray(r)[0, 1], np.asarray(r)[0, 4]
        rel = r1.T @ r4
        for row, f in ((2, 1 / 3), (3, 2 / 3)):
            expect = r1 @ np.asarray(so3.scale_rot(jnp.asarray(rel), jnp.asarray(f)))
            np.testing.assert_allclose(out[0, row], expect, atol=1e-5)
            np.testing.assert_allclose(
                out[0, row] @ out[0, row].T, np.eye(3), atol=1e-5
            )
        # both anchors equal -> the designed rows inherit that frame
        r_same = r.at[0, 4].set(r[0, 1])
        out2, _ = anchor_chord_frames(r_same, ri, ci, rm, gm)
        np.testing.assert_allclose(
            np.asarray(out2)[0, 2:4],
            np.broadcast_to(np.asarray(r)[0, 1], (2, 3, 3)), atol=1e-5,
        )

    def test_chord_orientations_ignore_batch_cdr_values(
        self, harness, batch, params
    ):
        """chord_orientations=True must not read the batch's designed
        FRAMES either: poisoning them changes nothing."""
        gen = batch.generation_mask & batch.residue_mask
        from diffab_pytorch_tpu.geometry import so3

        flip = so3.uniform(jax.random.key(9), batch.orientations.shape[:2])
        poisoned = batch.replace(
            orientations=jnp.where(
                gen[..., None, None], flip, batch.orientations
            )
        )
        kw = dict(init="chord", chord_orientations=True, t_start=11,
                  n_steps=5)
        run = jax.jit(
            lambda p, b, k: harness.sample(p, b, k, **kw).orientations
        )
        a = run(params, batch, jax.random.key(3))
        b_ = run(params, poisoned, jax.random.key(3))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)
