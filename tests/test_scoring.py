"""Design-scoring contracts: shapes, determinism, fan-out equivalence,
mode gating, context invariance, ranking helper.

The reference has nothing to mirror (no sampler, no evaluation); these pin
the semantics of sampling/scoring.py — the Monte-Carlo ELBO ranking.  The
DISCRIMINATION property (a scattered design scores worse than a faithful
one) needs a trained model and is asserted by the quality harness
(scripts/quality_run.py rank metrics, QUALITY.md).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffab_pytorch_tpu.config import tiny_config
from diffab_pytorch_tpu.data.batch import synthetic_batch
from diffab_pytorch_tpu.sampling import rank_per_target, score_designs
from diffab_pytorch_tpu.train import DiffAb

B, L, N = 2, 32, 4
T_GRID = (1, 5, 10)


@pytest.fixture(scope="module")
def harness():
    return DiffAb(tiny_config())


@pytest.fixture(scope="module")
def batch():
    return synthetic_batch(jax.random.key(0), B, L, 15, n_generate=8)


@pytest.fixture(scope="module")
def params(harness, batch):
    return harness.init(jax.random.key(1), batch).params


@pytest.fixture(scope="module")
def designs(harness, batch, params):
    return harness.sample(
        params, batch, jax.random.key(2), n_designs=N, n_steps=4
    )


def _score(harness, params, batch, designs, key, **kw):
    kw.setdefault("t_grid", T_GRID)
    kw.setdefault("n_draws", 1)
    return harness.score_designs(params, batch, designs, key, **kw)


def test_shapes_and_determinism(harness, batch, params, designs):
    s1 = _score(harness, params, batch, designs, jax.random.key(3))
    s2 = _score(harness, params, batch, designs, jax.random.key(3))
    for f in ("score", "seq_score", "translations_score",
              "orientations_score"):
        v1, v2 = getattr(s1, f), getattr(s2, f)
        assert v1.shape == (B * N,)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        assert np.isfinite(np.asarray(v1)).all()
    # combined = weighted sum of components (defaults all 1.0)
    np.testing.assert_allclose(
        np.asarray(s1.score),
        np.asarray(s1.seq_score + s1.translations_score
                   + s1.orientations_score),
        rtol=1e-6,
    )
    # a different key gives different Monte-Carlo draws
    s3 = _score(harness, params, batch, designs, jax.random.key(4))
    assert float(jnp.abs(s3.score - s1.score).max()) > 0


def test_fanout_matches_replicated_batch(harness, batch, params, designs):
    """Scoring n designs against 1 target (shared-context fan-out) must
    match scoring them as n independent rows of a replicated batch — the
    same noise draws land on the same rows, only the attention sharing
    differs (accumulation-order tolerance)."""
    fan = _score(harness, params, batch, designs, jax.random.key(5))

    rep_batch = jax.tree.map(lambda x: jnp.repeat(x, N, axis=0), batch)
    rep = _score(harness, params, rep_batch, designs, jax.random.key(5))
    np.testing.assert_allclose(
        np.asarray(fan.score), np.asarray(rep.score), rtol=2e-4, atol=2e-5
    )


def test_mode_gating(harness, batch, params):
    """A fixed modality contributes exactly zero to the score."""
    fix_seq = harness.sample(
        params, batch, jax.random.key(6), n_designs=2, n_steps=4,
        generate_sequence=False,
    )
    s = _score(harness, params, batch, fix_seq, jax.random.key(7),
               generate_sequence=False)
    np.testing.assert_array_equal(np.asarray(s.seq_score), 0.0)
    assert float(jnp.abs(s.translations_score).max()) > 0

    fix_struct = harness.sample(
        params, batch, jax.random.key(6), n_designs=2, n_steps=4,
        generate_structure=False,
    )
    s = _score(harness, params, batch, fix_struct, jax.random.key(7),
               generate_structure=False)
    np.testing.assert_array_equal(np.asarray(s.translations_score), 0.0)
    np.testing.assert_array_equal(np.asarray(s.orientations_score), 0.0)
    assert float(jnp.abs(s.seq_score).max()) > 0


def test_context_encoding_ignores_designed_region(harness, batch, params,
                                                  designs):
    """The native batch's GENERATED-region features are masked out of the
    context encoding, so corrupting them must not move any score (the
    design itself provides that region)."""
    gen3 = batch.generation_mask[..., None]
    corrupted = dataclasses.replace(
        batch,
        seq_idx=jnp.where(batch.generation_mask, 7, batch.seq_idx),
        xyz=jnp.where(gen3[..., None], batch.xyz + 100.0, batch.xyz),
    )
    s1 = _score(harness, params, batch, designs, jax.random.key(8))
    s2 = _score(harness, params, corrupted, designs, jax.random.key(8))
    np.testing.assert_allclose(
        np.asarray(s1.score), np.asarray(s2.score), rtol=1e-5, atol=1e-6
    )


def test_scoring_jits(harness, batch, params, designs):
    fn = jax.jit(
        lambda p, b, d, k: score_designs(
            harness.model, p, harness.sched, harness.orientation_tables,
            b, d, k, t_grid=T_GRID, n_draws=1,
        )
    )
    s = fn(params, batch, designs, jax.random.key(9))
    eager = _score(harness, params, batch, designs, jax.random.key(9))
    np.testing.assert_allclose(
        np.asarray(s.score), np.asarray(eager.score), rtol=1e-5, atol=1e-6
    )


def test_rank_per_target():
    scores = jnp.asarray([3.0, 1.0, 2.0, 0.5, 0.1, 0.9])
    order = rank_per_target(scores, 3)
    np.testing.assert_array_equal(np.asarray(order),
                                  [[1, 2, 0], [1, 0, 2]])


def test_bad_inputs(harness, batch, params, designs):
    with pytest.raises(ValueError, match="not a multiple"):
        bad = jax.tree.map(lambda x: x[: B * N - 1], designs)
        _score(harness, params, batch, bad, jax.random.key(0))
    with pytest.raises(ValueError, match="nothing was generated"):
        _score(harness, params, batch, designs, jax.random.key(0),
               generate_structure=False, generate_sequence=False)
    with pytest.raises(ValueError, match="t_grid"):
        _score(harness, params, batch, designs, jax.random.key(0),
               t_grid=(0, 5))
