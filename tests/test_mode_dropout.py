"""Context-mode dropout (TrainConfig.mode_dropout): one checkpoint trains
codesign, fix-structure, and fix-sequence conditioning jointly.

Motivation (QUALITY.md round 3): a codesign-only checkpoint scores 0.18
AAR when sampled in fix-structure mode — the reference's encode_context
conditioning flags (diffab_pytorch.py:693-700) define the modes, but its
training step only ever exercises codesign, so the fixed-modality context
configurations are out-of-distribution at sampling time.  These tests pin
the per-sample plumbing; the quality payoff is measured on TPU
(QUALITY.md).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffab_pytorch_tpu.config import tiny_config
from diffab_pytorch_tpu.data.batch import synthetic_batch
from diffab_pytorch_tpu.train import DiffAb
from diffab_pytorch_tpu.train.losses import diffab_losses

CFG = tiny_config()
B, L = 4, 16


@pytest.fixture(scope="module")
def batch():
    return synthetic_batch(jax.random.key(0), B, L, CFG.model.n_atoms,
                           n_generate=6)


@pytest.fixture(scope="module")
def harness():
    return DiffAb(CFG)


@pytest.fixture(scope="module")
def params(harness, batch):
    return harness.init(jax.random.key(1), batch).params


def test_visible_flags_match_static_flags(harness, params, batch):
    """Per-sample visibility arrays reproduce the static generate_* flags
    exactly when every sample agrees — the training-dropout context is the
    same context fixed-modality sampling sees."""
    ones = jnp.ones((B,), bool)
    zeros = jnp.zeros((B,), bool)
    for gs, gq in [(False, True), (True, False), (True, True)]:
        res_s, pair_s = harness.model.apply(
            params, batch, generate_structure=gs, generate_sequence=gq,
            method="encode_context",
        )
        res_v, pair_v = harness.model.apply(
            params, batch, method="encode_context",
            structure_visible=zeros if gs else ones,
            sequence_visible=zeros if gq else ones,
        )
        np.testing.assert_array_equal(np.asarray(res_v), np.asarray(res_s))
        np.testing.assert_array_equal(np.asarray(pair_v), np.asarray(pair_s))


def test_visible_modality_not_noised(harness, batch):
    """A visible modality stays at its t0 values through add_noise —
    matching what the fixed-modality sampler feeds the denoiser."""
    t = jnp.full((B,), CFG.diffusion.T, jnp.int32)
    none = jnp.zeros_like(batch.generation_mask)
    n = harness.add_noise(jax.random.key(2), batch, t,
                          struct_generation_mask=none)
    np.testing.assert_array_equal(
        np.asarray(n.translations_t), np.asarray(batch.translations)
    )
    np.testing.assert_array_equal(
        np.asarray(n.orientations_t), np.asarray(batch.orientations)
    )
    # the sequence WAS noised at t=T (some generated position changed)
    changed = (n.seq_idx_t != batch.seq_idx) & batch.generation_mask
    assert bool(changed.any())

    n2 = harness.add_noise(jax.random.key(2), batch, t,
                           seq_generation_mask=none)
    np.testing.assert_array_equal(
        np.asarray(n2.seq_idx_t), np.asarray(batch.seq_idx)
    )
    assert bool(
        ((n2.translations_t != batch.translations)
         & batch.generation_mask[..., None]).any()
    )


def test_fixed_modality_loss_terms_zero(harness, params, batch):
    """diffab_losses with an all-false per-modality mask contributes
    exactly zero for that modality's terms."""
    t = jnp.full((B,), 10, jnp.int32)
    noised = harness.add_noise(jax.random.key(3), batch, t)
    denoised = harness.model.apply(
        params, batch, noised.seq_idx_t, noised.translations_t,
        noised.orientations_t, noised.beta,
    )
    from diffab_pytorch_tpu.diffusion import sequence

    log_post = sequence.log_posterior_from_predicted_t0(
        harness.sched, noised.seq_idx_t, denoised["seq_posterior"], t,
        batch.generation_mask,
    )
    none = jnp.zeros_like(batch.generation_mask)
    losses = diffab_losses(
        denoised, log_post, noised.seq_posterior, noised.translations_eps,
        batch.orientations, batch.generation_mask, batch.residue_mask,
        seq_idx_t0_true=batch.seq_idx, seq_ce_weight=1.0,
        struct_gen_mask=none,
    )
    assert float(losses["translations_loss"]) == 0.0
    assert float(losses["orientations_loss"]) == 0.0
    assert float(losses["seq_loss"]) > 0.0

    losses2 = diffab_losses(
        denoised, log_post, noised.seq_posterior, noised.translations_eps,
        batch.orientations, batch.generation_mask, batch.residue_mask,
        seq_idx_t0_true=batch.seq_idx, seq_ce_weight=1.0,
        seq_gen_mask=none,
    )
    assert float(losses2["seq_loss"]) == 0.0
    assert float(losses2["seq_ce_loss"]) == 0.0
    assert float(losses2["translations_loss"]) > 0.0


def test_mode_dropout_train_step(batch):
    """A mode-dropout train step runs jitted with finite decreasing-ish
    loss and the SAME parameter tree as the plain config (the dropout is
    a data-side change only — checkpoints stay interchangeable)."""
    cfg = dataclasses.replace(
        CFG, train=dataclasses.replace(CFG.train, mode_dropout=0.3)
    )
    h = DiffAb(cfg)
    state = h.init(jax.random.key(4), batch)
    h0 = DiffAb(CFG)
    state0 = h0.init(jax.random.key(4), batch)
    assert (jax.tree.structure(state.params)
            == jax.tree.structure(state0.params))

    step = h.make_train_step(donate=False)
    s = state
    for i in range(4):
        s, m = step(s, batch, jax.random.key(5))
        assert np.isfinite(float(m["train/loss"])), f"step {i} loss not finite"


def test_mode_dropout_with_self_conditioning(batch):
    """mode_dropout composes with self-conditioning: the sc gate excludes
    fix-structure samples (their geometry estimate is meaningless) and the
    step still runs finite."""
    cfg = dataclasses.replace(
        CFG,
        model=dataclasses.replace(CFG.model, self_conditioning=True),
        train=dataclasses.replace(CFG.train, mode_dropout=0.25),
    )
    h = DiffAb(cfg)
    state = h.init(jax.random.key(6), batch)
    step = h.make_train_step(donate=False)
    s, m = step(state, batch, jax.random.key(7))
    assert np.isfinite(float(m["train/loss"]))


def test_mode_dropout_bounds():
    with pytest.raises(ValueError):
        DiffAb(dataclasses.replace(
            CFG, train=dataclasses.replace(CFG.train, mode_dropout=0.6)
        ))
