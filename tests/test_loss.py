"""Loss-function contracts (mirrors reference tests/test_loss.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffab_pytorch_tpu.geometry import so3
from diffab_pytorch_tpu.train.losses import (
    diffab_losses,
    kl_divergence_from_logits,
    orientation_discrepancy,
)

B, L = 8, 32


def test_orientation_loss_zero_for_identical():
    """Loss(R, R) == 0 — reference tests/test_loss.py:9-21."""
    r = so3.uniform(jax.random.key(0), (B, L))
    np.testing.assert_allclose(orientation_discrepancy(r, r), 0.0, atol=1e-6)


def test_orientation_loss_positive_for_different():
    r1 = so3.uniform(jax.random.key(1), (B, L))
    r2 = so3.uniform(jax.random.key(2), (B, L))
    assert float(orientation_discrepancy(r1, r2).mean()) > 0.1


def test_kl_sanity():
    """Self-KL == 0; correct prediction beats random — reference
    tests/test_loss.py:24-47."""
    key = jax.random.key(3)
    target = jax.nn.softmax(jax.random.normal(key, (B, L, 21)), axis=-1)
    logits_correct = jnp.log(target)
    logits_random = jax.random.normal(jax.random.key(4), (B, L, 21))

    kl_self = kl_divergence_from_logits(logits_correct, target)
    np.testing.assert_allclose(kl_self, 0.0, atol=1e-5)

    assert float(kl_divergence_from_logits(logits_random, target).mean()) > float(
        kl_self.mean()
    )
    # KL is non-negative
    assert float(kl_divergence_from_logits(logits_random, target).min()) >= 0.0


def test_diffab_losses_masking():
    """Only generated-and-valid residues contribute; the shared denominator
    is their count (reference diffab_pytorch.py:867-878)."""
    key = jax.random.key(5)
    denoised = {
        "translations_eps": jnp.zeros((B, L, 3)),
        "orientations_t0": so3.uniform(jax.random.key(6), (B, L)),
    }
    pred_log_post = jax.nn.log_softmax(jax.random.normal(key, (B, L, 21)), -1)
    target_post = jax.nn.softmax(jax.random.normal(jax.random.key(7), (B, L, 21)), -1)
    eps_true = jnp.ones((B, L, 3)) * 2.0  # squared err 4 per coord, 12 per residue
    r_true = denoised["orientations_t0"]  # orientation loss = 0

    gen = jnp.zeros((B, L), bool).at[:, :4].set(True)
    res = jnp.ones((B, L), bool)
    out = diffab_losses(denoised, pred_log_post, target_post, eps_true, r_true, gen, res)
    np.testing.assert_allclose(out["translations_loss"], 12.0, rtol=1e-6)
    np.testing.assert_allclose(out["orientations_loss"], 0.0, atol=1e-6)
    assert float(out["loss"]) > 0

    # garbage outside the mask must not change anything
    eps_true2 = eps_true.at[:, 10:].set(1e9)
    out2 = diffab_losses(denoised, pred_log_post, target_post, eps_true2, r_true, gen, res)
    np.testing.assert_allclose(out2["translations_loss"], out["translations_loss"])


def test_hybrid_ce_term():
    import pytest
    """D3PM hybrid loss: seq_ce_weight adds CE(p_hat(s_0), s_0) over the
    generated positions; 0 reproduces the pure-KL objective."""
    import jax

    b, L, K = 2, 6, 21
    key = jax.random.key(0)
    logits = jax.random.normal(key, (b, L, K))
    denoised = {
        "seq_logits": logits,
        "translations_eps": jnp.zeros((b, L, 3)),
        "orientations_t0": jnp.broadcast_to(jnp.eye(3), (b, L, 3, 3)),
    }
    pred_log_post = jax.nn.log_softmax(jnp.zeros((b, L, K)), -1)
    target_post = jnp.full((b, L, K), 1.0 / K)
    eps_true = jnp.zeros((b, L, 3))
    r_true = jnp.broadcast_to(jnp.eye(3), (b, L, 3, 3))
    gen = jnp.ones((b, L), bool)
    res = jnp.ones((b, L), bool)
    s0 = jnp.zeros((b, L), jnp.int32)

    base = diffab_losses(
        denoised, pred_log_post, target_post, eps_true, r_true, gen, res,
        seq_idx_t0_true=s0, seq_ce_weight=0.0,
    )
    hybrid = diffab_losses(
        denoised, pred_log_post, target_post, eps_true, r_true, gen, res,
        seq_idx_t0_true=s0, seq_ce_weight=0.5,
    )
    assert "seq_ce_loss" not in base
    expected_ce = float(
        -(jax.nn.log_softmax(logits, -1)[..., 0]).mean()
    )
    np.testing.assert_allclose(float(hybrid["seq_ce_loss"]), expected_ce, rtol=1e-5)
    np.testing.assert_allclose(
        float(hybrid["loss"]), float(base["loss"]) + 0.5 * expected_ce, rtol=1e-5
    )

    with pytest.raises(ValueError, match="seq_idx_t0_true"):
        diffab_losses(
            denoised, pred_log_post, target_post, eps_true, r_true, gen, res,
            seq_ce_weight=1.0,
        )
