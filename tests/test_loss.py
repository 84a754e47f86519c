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
