"""Training losses with the reference's masked-mean semantics.

TPU-native equivalent of reference `diffab_pytorch/diffab_pytorch.py:610-625`
(OrientationLoss), the loss wiring at :671-673, and the masked reduction of
`_shared_step` (:856-880): all three losses are reduced by the SAME scalar
denominator — the count of generated-and-valid residues — after elementwise
masking by generation_mask & residue_mask.

  seq_loss          KL( posterior_true || posterior_pred ), summed over vocab
                    (torch KLDivLoss(log pred, true) convention, :857-859)
  translations_loss MSE over the 3 coords of eps (:860-862)
  orientations_loss || R_pred^T-composed discrepancy - I ||^2 elementwise
                    mean over the 3x3 entries (:620-625, F.mse_loss)

Sequence-head semantics (deliberate divergence from the reference, see
DESIGN.md §2 #15): the head predicts p_hat(s_0); the KL's predicted
distribution is q(s_{t-1} | s_t, p_hat(s_0)) derived through
`sequence.log_posterior_from_predicted_t0` — the SAME transform the sampler
draws from (`sampling/sampler.py`), so training and sampling agree. The
reference instead regresses the raw head output onto the true posterior
(diffab_pytorch.py:842-858) while its sample() stub left the reverse
semantics undefined. The caller (train/harness.py loss_fn) computes the
predicted log-posterior and passes it in.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def orientation_discrepancy(pred_rotmat: jax.Array, target_rotmat: jax.Array) -> jax.Array:
    """(..., 3, 3) pairwise R_pred^T R_target vs identity, elementwise
    squared error MEAN over the 9 entries (matching F.mse_loss semantics of
    the reference, :620-625)."""
    disc = jnp.einsum("...ij,...ik->...jk", pred_rotmat, target_rotmat)
    eye = jnp.eye(3, dtype=disc.dtype)
    return jnp.mean((disc - eye) ** 2, axis=(-1, -2))


def kl_divergence_from_logits(pred_logits: jax.Array, target_probs: jax.Array) -> jax.Array:
    """KL(target || pred) summed over the last axis, with pred given as
    logits.  Equals sum target * (log target - log_softmax(pred))."""
    log_pred = jax.nn.log_softmax(pred_logits, axis=-1)
    t = jnp.maximum(target_probs, 1e-12)
    return jnp.sum(target_probs * (jnp.log(t) - log_pred), axis=-1)


def kl_divergence_from_log_probs(
    pred_log_probs: jax.Array, target_probs: jax.Array
) -> jax.Array:
    """KL(target || pred) summed over the last axis, with pred given as
    (already normalized) log-probabilities."""
    t = jnp.maximum(target_probs, 1e-12)
    return jnp.sum(target_probs * (jnp.log(t) - pred_log_probs), axis=-1)


def diffab_losses(
    denoised: Dict[str, jax.Array],
    seq_log_posterior_pred: jax.Array,  # (b, L, K) — log q(s_{t-1}|s_t, p_hat(s_0))
    seq_posterior_true: jax.Array,  # (b, L, K)
    translations_eps_true: jax.Array,  # (b, L, 3)
    orientations_t0_true: jax.Array,  # (b, L, 3, 3)
    generation_mask: jax.Array,  # (b, L)
    residue_mask: jax.Array,  # (b, L)
    seq_idx_t0_true: jax.Array | None = None,  # (b, L) — for the CE term
    seq_ce_weight: float = 0.0,
    seq_sample_weight: jax.Array | None = None,  # (b,) or (b, L) weight
    seq_gen_mask: jax.Array | None = None,  # (b, L) — seq-term positions
    struct_gen_mask: jax.Array | None = None,  # (b, L) — geometry-term positions
) -> Dict[str, jax.Array]:
    """The three DiffAb losses with the shared masked-mean reduction, plus
    the optional D3PM hybrid cross-entropy on the predicted p_hat(s_0).

    The KL term alone barely trains the context->s_0 map: at large t the
    true posterior q(s_{t-1}|s_t, s_0) is nearly uniform, so its KL against
    any smooth prediction is flat in p_hat(s_0) (measured: after 4,000
    converged steps argmax p_hat(s_0) at t=99 was at ~2x chance while the
    information to hit 100% was in the context).  D3PM (Austin et al. 2021,
    eq. 9) adds lambda * CE(p_hat(s_0), s_0) — direct supervision at every
    t — which is what makes full-length sequence generation recover the
    native sequence (QUALITY.md).  seq_ce_weight=0 reproduces the
    reference's pure-KL objective (diffab_pytorch.py:857-859)."""
    # Per-modality generation masks (context-mode dropout,
    # TrainConfig.mode_dropout): a sample trained as fix-structure has its
    # geometry un-noised and fully visible — supervising eps/orientation
    # there would regress the heads onto meaningless targets — and
    # symmetrically for fix-sequence and the KL/CE terms.  Defaults keep
    # the reference's single-mask reduction.
    if struct_gen_mask is None:
        struct_gen_mask = generation_mask
    if seq_gen_mask is None:
        seq_gen_mask = generation_mask
    loss_mask = (struct_gen_mask & residue_mask).astype(jnp.float32)
    denom = jnp.maximum(loss_mask.sum(), 1.0)
    seq_loss_mask = (seq_gen_mask & residue_mask).astype(jnp.float32)
    seq_loss_denom = jnp.maximum(seq_loss_mask.sum(), 1.0)

    # Optional per-sample re-weighting of the SEQUENCE terms only (KL and
    # CE; geometry losses keep the uniform reduction).  Weighted-mean
    # normalization keeps the loss scale comparable while re-balancing
    # which samples drive the sequence head — used by the self-conditioning
    # schedule (TrainConfig.sc_seq_loss_weight) to keep the barcode-rule
    # gradient dominated by the unconditioned half.
    if seq_sample_weight is not None:
        w = seq_sample_weight
        if w.ndim == 1:
            w = w[:, None]
        seq_mask = seq_loss_mask * w.astype(jnp.float32)
        seq_denom = jnp.maximum(seq_mask.sum(), 1.0)
    else:
        seq_mask, seq_denom = seq_loss_mask, seq_loss_denom

    seq_elem = kl_divergence_from_log_probs(
        seq_log_posterior_pred, seq_posterior_true
    )  # (b, L)
    seq_loss = jnp.sum(seq_elem * seq_mask) / seq_denom

    # per-residue sum over 3 coords (reference: elementwise MSE (b, L, 3)
    # masked by (b, L, 1) then summed / denom — i.e. coord-summed)
    trans_elem = jnp.sum(
        (denoised["translations_eps"] - translations_eps_true) ** 2, axis=-1
    )
    translations_loss = jnp.sum(trans_elem * loss_mask) / denom

    # per-residue mean over the 9 rotation entries (reference: (b, L, 3, 3)
    # elementwise masked then summed / denom; mse_loss 'none' keeps
    # elementwise squares, so the per-residue contribution is the SUM of 9
    # squared entries — matching 9 * our mean)
    orient_elem = 9.0 * orientation_discrepancy(
        denoised["orientations_t0"], orientations_t0_true
    )
    orientations_loss = jnp.sum(orient_elem * loss_mask) / denom

    out = {
        "seq_loss": seq_loss,
        "translations_loss": translations_loss,
        "orientations_loss": orientations_loss,
    }
    total = seq_loss + translations_loss + orientations_loss
    if seq_ce_weight > 0.0:
        if seq_idx_t0_true is None:
            raise ValueError("seq_ce_weight > 0 requires seq_idx_t0_true")
        log_p0 = jax.nn.log_softmax(denoised["seq_logits"], axis=-1)
        ce_elem = -jnp.take_along_axis(
            log_p0, seq_idx_t0_true[..., None], axis=-1
        )[..., 0]  # (b, L)
        seq_ce_loss = jnp.sum(ce_elem * seq_mask) / seq_denom
        out["seq_ce_loss"] = seq_ce_loss
        total = total + seq_ce_weight * seq_ce_loss
    out["loss"] = total
    return out
