"""Evaluation metrics + the scientific end-to-end check: a model overfit on
one complex must beat the untrained model on AAR and CDR RMSD when
re-designing that complex (sampling self-consistency — a check the
reference cannot run at all, its sampler being a stub)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffab_pytorch_tpu.config import tiny_config
from diffab_pytorch_tpu.data.batch import synthetic_batch
from diffab_pytorch_tpu.evaluation import amino_acid_recovery, ca_rmsd, evaluate_designs
from diffab_pytorch_tpu.train import DiffAb


def test_aar_basics():
    seq = jnp.array([[1, 2, 3, 4]])
    mask = jnp.array([[True, True, True, False]])
    pred = jnp.array([[1, 2, 9, 9]])
    np.testing.assert_allclose(amino_acid_recovery(pred, seq, mask), [2 / 3])
    # empty mask -> 0, no NaN
    np.testing.assert_allclose(
        amino_acid_recovery(pred, seq, jnp.zeros_like(mask)), [0.0]
    )


def test_rmsd_basics():
    x = jnp.zeros((1, 4, 3))
    y = x.at[:, :2].add(jnp.array([3.0, 4.0, 0.0]))
    mask = jnp.ones((1, 4), bool)
    np.testing.assert_allclose(ca_rmsd(y, x, mask), [np.sqrt(25 * 2 / 4)], rtol=1e-6)
    np.testing.assert_allclose(ca_rmsd(y, x, mask, scale=10.0), [10 * np.sqrt(12.5)], rtol=1e-6)


def test_kabsch_recovers_rigid_motion():
    """A rigidly moved cloud superposes back exactly; aligned RMSD -> 0."""
    from diffab_pytorch_tpu.evaluation import aligned_ca_rmsd, kabsch

    rng = np.random.default_rng(0)
    native = jnp.asarray(rng.normal(size=(2, 12, 3)).astype(np.float32))
    theta = 0.7
    rot = jnp.asarray(
        np.array(
            [[np.cos(theta), -np.sin(theta), 0],
             [np.sin(theta), np.cos(theta), 0],
             [0, 0, 1.0]], np.float32)
    )
    moved = jnp.einsum("bli,ij->blj", native, rot) + jnp.array([1.0, -2.0, 3.0])
    mask = jnp.ones((2, 12), bool)

    r, t = kabsch(moved, native, mask)
    back = jnp.einsum("bli,bij->blj", moved, r) + t[:, None]
    np.testing.assert_allclose(np.asarray(back), np.asarray(native), atol=1e-4)
    # proper rotations
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.det(r)), np.ones(2), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(aligned_ca_rmsd(moved, native, mask, mask)),
        np.zeros(2), atol=1e-4,
    )


def test_aligned_rmsd_scores_only_the_cdr():
    """Context fits the superposition; displacement of the scored region
    survives it (a translation of a disjoint subset cannot be fully
    absorbed by a context-only rigid fit)."""
    from diffab_pytorch_tpu.evaluation import aligned_ca_rmsd

    rng = np.random.default_rng(1)
    native = jnp.asarray(rng.normal(size=(1, 20, 3)).astype(np.float32) * 5)
    gen = jnp.zeros((1, 20), bool).at[:, 8:12].set(True)
    ctx = ~gen
    pred = jnp.where(gen[..., None], native + jnp.array([0.0, 0.0, 2.0]), native)
    r = aligned_ca_rmsd(pred, native, gen, ctx)
    assert 1.5 < float(r[0]) <= 2.01


def test_sequence_diversity_extremes():
    from diffab_pytorch_tpu.evaluation import sequence_diversity

    mask = jnp.array([True, True, True, False])
    same = jnp.tile(jnp.array([[1, 2, 3, 9]]), (4, 1))
    assert float(sequence_diversity(same, mask)) == 0.0
    # all-different at every masked position
    diff = jnp.array([[1, 1, 1, 0], [2, 2, 2, 0], [3, 3, 3, 0]])
    np.testing.assert_allclose(float(sequence_diversity(diff, mask)), 1.0)


def test_evaluate_designs_per_cdr_breakdown():
    """cdr_idx adds aar_H3 / ca_rmsd_H3 keys scoped to that CDR's mask."""
    from diffab_pytorch_tpu.sampling.sampler import SampleResult

    batch = synthetic_batch(jax.random.key(0), 2, 24, 15, n_generate=6)
    cdr_idx = jnp.where(batch.generation_mask, 3, 0)  # all generated = H3
    result = SampleResult(
        seq_idx=batch.seq_idx,
        translations=batch.translations,
        orientations=batch.orientations,
    )
    out = evaluate_designs(batch=batch, result=result, cdr_idx=cdr_idx)
    assert "aar_H3" in out and "ca_rmsd_H3" in out
    assert "aar_L1" not in out  # no L1 in the generation mask
    np.testing.assert_allclose(np.asarray(out["aar_H3"]), np.ones(2))
    np.testing.assert_allclose(np.asarray(out["ca_rmsd_H3"]), np.zeros(2), atol=1e-6)


@pytest.mark.slow
def test_overfit_then_optimize_beats_untrained():
    """Train the tiny model on ONE synthetic complex, then check
    optimization-by-renoising (t-restart) recovers sequence + geometry
    better than the untrained model.

    t-restart (not full generation) keeps this a fair learning signal: full
    T=100 reverse amplifies epsilon-prediction error by 1/sqrt(abar_T) ~
    1e4, so an only-partly-trained model diverges regardless — whereas the
    bounded t_restart loop directly measures denoising quality."""
    import dataclasses

    from diffab_pytorch_tpu.config import TrainConfig, tiny_config

    cfg = dataclasses.replace(tiny_config(), train=TrainConfig(lr=1e-3))
    harness = DiffAb(cfg)
    batch = synthetic_batch(jax.random.key(0), 1, 48, 15, n_generate=8)
    fan = jax.tree.map(lambda x: jnp.repeat(x, 8, axis=0), batch)

    t_restart = 40
    state = harness.init(jax.random.key(1), batch)
    untrained = evaluate_designs(
        harness.sample(state.params, fan, jax.random.key(2), t_start=t_restart),
        fan,
    )

    step = harness.make_train_step()
    for _ in range(400):
        state, m = step(state, batch, jax.random.key(3))

    trained = evaluate_designs(
        harness.sample(state.params, fan, jax.random.key(2), t_start=t_restart),
        fan,
    )

    aar_t = float(trained["aar"].mean())
    aar_u = float(untrained["aar"].mean())
    rmsd_t = float(trained["ca_rmsd"].mean())
    rmsd_u = float(untrained["ca_rmsd"].mean())
    print(f"AAR untrained={aar_u:.3f} trained={aar_t:.3f}; "
          f"RMSD untrained={rmsd_u:.3f} trained={rmsd_t:.3f}")
    assert aar_t > aar_u
    assert aar_t > 2 / 21  # clearly above chance
    assert rmsd_t < rmsd_u


def test_spearman_corr():
    from diffab_pytorch_tpu.evaluation import spearman_corr

    a = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    # perfectly monotone (any increasing transform) -> rho = 1
    np.testing.assert_allclose(
        float(spearman_corr(a, jnp.exp(a))), 1.0, atol=1e-6
    )
    np.testing.assert_allclose(
        float(spearman_corr(a, -a)), -1.0, atol=1e-6
    )
    # matches scipy's definition on a fixed permutation
    b = jnp.asarray([2.0, 0.5, 3.1, 1.7])
    # ranks a: 0 1 2 3; ranks b: 2 0 3 1 -> pearson of ranks
    ra, rb = np.array([0, 1, 2, 3.0]), np.array([2, 0, 3, 1.0])
    expect = np.corrcoef(ra, rb)[0, 1]
    np.testing.assert_allclose(float(spearman_corr(a, b)), expect, atol=1e-6)
