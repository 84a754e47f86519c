"""Multinomial (D3PM uniform-noise) sequence diffusion over amino-acid types.

TPU-native re-design of reference `diffab_pytorch/diffusion.py:44-192`
(SequenceDiffuser).  All functions are pure, shape-static, jax.random-keyed
and jit/vmap/scan-safe; the class wrapper at the bottom mirrors the reference
API for drop-in familiarity.

Forward process (vocab size K):
  q(s_t | s_{t-1}) = (1 - beta_t) onehot(s_{t-1}) + beta_t / K      (:49-79)
  q(s_t | s_0)     = abar_t onehot(s_0) + (1 - abar_t) / K          (:105-135)
  posterior q(s_{t-1} | s_t, s_0) ∝ q(s_t|s_{t-1}=·) q(s_{t-1}=·|s_0)  (:168-192)

Positions outside `generation_mask` pass through unchanged (context
clamping, :78-79,134-135).

Beyond the reference, this module adds the REVERSE kernel the reference's
`DiffAb.sample()` stub (diffab_pytorch.py:770-776) never implemented:
`reverse_step` samples s_{t-1} from the posterior computed against the
denoiser's *predicted* p(s_0) distribution — the q(s_{t-1}|s_t, s_0) form is
linear in onehot(s_0), so the predicted distribution substitutes directly.

Fixes vs reference (SURVEY.md §2.9): the aa_vocab_size argument is honored
(#5, diffusion.py:45-47 ignores it); no stray debug print (#4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffab_pytorch_tpu.constants import AA_VOCAB_SIZE
from diffab_pytorch_tpu.diffusion.schedule import DiffusionSchedule


def _onehot(seq_idx: jax.Array, vocab: int, dtype) -> jax.Array:
    return jax.nn.one_hot(seq_idx, vocab, dtype=dtype)


def _clamp_context(
    probs: jax.Array, seq_idx: jax.Array, generation_mask: jax.Array
) -> jax.Array:
    """Outside the generation mask the distribution is a point mass on the
    input sequence (context residues are never noised)."""
    onehot = _onehot(seq_idx, probs.shape[-1], probs.dtype)
    return jnp.where(generation_mask[..., None], probs, onehot)


def forward_prob_single_step(
    sched: DiffusionSchedule,
    seq_idx: jax.Array,
    t: jax.Array,
    generation_mask: jax.Array,
    vocab_size: int = AA_VOCAB_SIZE,
) -> jax.Array:
    """q(s_t | s_{t-1} = seq_idx): (..., L) -> (..., L, K).

    t broadcasts against seq_idx's leading dims (typically (b,) vs (b, L)).
    """
    beta = sched.beta[t][..., None, None]  # (..., 1, 1)
    onehot = _onehot(seq_idx, vocab_size, sched.beta.dtype)
    probs = (1.0 - beta) * onehot + beta / vocab_size
    return _clamp_context(probs, seq_idx, generation_mask)


def forward_prob_from_t0(
    sched: DiffusionSchedule,
    seq_idx_t0: jax.Array,
    t: jax.Array,
    generation_mask: jax.Array,
    vocab_size: int = AA_VOCAB_SIZE,
) -> jax.Array:
    """q(s_t | s_0 = seq_idx_t0): (..., L) -> (..., L, K)."""
    abar = sched.alpha_bar[t][..., None, None]
    onehot = _onehot(seq_idx_t0, vocab_size, sched.alpha_bar.dtype)
    probs = abar * onehot + (1.0 - abar) / vocab_size
    return _clamp_context(probs, seq_idx_t0, generation_mask)


def categorical_from_probs(key: jax.Array, probs: jax.Array) -> jax.Array:
    """Sample category indices from (..., K) probabilities on device.

    Replaces the reference's host-looping torch.multinomial reshape dance
    (diffusion.py:101,156) with a single Gumbel-max draw.
    """
    return jax.random.categorical(key, jnp.log(jnp.maximum(probs, 1e-20)), axis=-1)


def diffuse_single_step(
    key: jax.Array,
    sched: DiffusionSchedule,
    seq_idx: jax.Array,
    t: jax.Array,
    generation_mask: jax.Array,
    vocab_size: int = AA_VOCAB_SIZE,
) -> jax.Array:
    """Sample s_t ~ q(s_t | s_{t-1}).  Reference diffusion.py:81-103."""
    p = forward_prob_single_step(sched, seq_idx, t, generation_mask, vocab_size)
    sampled = categorical_from_probs(key, p)
    return jnp.where(generation_mask, sampled, seq_idx)


def diffuse_from_t0(
    key: jax.Array,
    sched: DiffusionSchedule,
    seq_idx_t0: jax.Array,
    t: jax.Array,
    generation_mask: jax.Array,
    vocab_size: int = AA_VOCAB_SIZE,
    return_posterior: bool = True,
):
    """Sample s_t ~ q(s_t | s_0); optionally also return the true posterior
    q(s_{t-1} | s_t, s_0) used as the KL target in training.

    Reference diffusion.py:137-166.
    """
    p = forward_prob_from_t0(sched, seq_idx_t0, t, generation_mask, vocab_size)
    seq_idx_t = categorical_from_probs(key, p)
    seq_idx_t = jnp.where(generation_mask, seq_idx_t, seq_idx_t0)
    if not return_posterior:
        return seq_idx_t
    posterior = posterior_single_step(
        sched, seq_idx_t, seq_idx_t0, t, generation_mask, vocab_size
    )
    return seq_idx_t, posterior


def posterior_single_step(
    sched: DiffusionSchedule,
    seq_idx_t: jax.Array,
    seq_idx_t0: jax.Array,
    t: jax.Array,
    generation_mask: jax.Array,
    vocab_size: int = AA_VOCAB_SIZE,
) -> jax.Array:
    """True posterior q(s_{t-1} | s_t, s_0), normalized over the vocab.

    Reference diffusion.py:168-192: elementwise product of the single-step
    likelihood of s_t (as a function of s_{t-1}) with the t-1 jump prior
    from s_0.
    """
    # the same generalized (ratio-form) kernels the sampler-side
    # posterior_from_predicted_t0 uses, so train targets and sampling
    # share ONE definition bit for bit (beta_t vs 1 - abar_t/abar_{t-1}
    # differ by f32 cumprod ULPs)
    abar_prev = sched.alpha_bar[t - 1][..., None, None]
    beta_ts = 1.0 - sched.alpha_bar[t][..., None, None] / abar_prev
    onehot_t = _onehot(seq_idx_t, vocab_size, sched.beta.dtype)
    p_single = (1.0 - beta_ts) * onehot_t + beta_ts / vocab_size
    p_single = _clamp_context(p_single, seq_idx_t, generation_mask)
    abar_prev_full = sched.alpha_bar[t - 1][..., None, None]
    onehot_0 = _onehot(seq_idx_t0, vocab_size, sched.beta.dtype)
    p_prior = abar_prev_full * onehot_0 + (1.0 - abar_prev_full) / vocab_size
    p_prior = _clamp_context(p_prior, seq_idx_t, generation_mask)
    p = p_single * p_prior
    return p / jnp.sum(p, axis=-1, keepdims=True)


def posterior_from_predicted_t0(
    sched: DiffusionSchedule,
    seq_idx_t: jax.Array,
    s0_probs: jax.Array,
    t: jax.Array,
    generation_mask: jax.Array,
    s: jax.Array | None = None,
) -> jax.Array:
    """Posterior q(s_prev | s_t, p_hat(s_0)) with a *distribution* over s_0.

    s_prev defaults to t - 1; any s < t gives the RESPACED posterior for
    few-step sampling: the uniform-mixture forward kernels compose, so
    q(s_t | s_s) has mixture weight beta_ts = 1 - abar_t / abar_s, and the
    jump prior from s_0 uses abar_s.  q(s_s|s_0) is linear in onehot(s_0),
    so marginalizing the denoiser's predicted p(s_0) gives
    abar_s * s0_probs + (1 - abar_s) / K.  This is the sampler-side
    counterpart of posterior_single_step — the piece the reference never
    implemented (diffab_pytorch.py:770-776, SURVEY.md §3.5).
    """
    if s is None:
        s = t - 1
    vocab_size = s0_probs.shape[-1]
    abar_prev = sched.alpha_bar[s][..., None, None]
    beta_ts = 1.0 - sched.alpha_bar[t][..., None, None] / abar_prev
    onehot = _onehot(seq_idx_t, vocab_size, sched.beta.dtype)
    p_single = (1.0 - beta_ts) * onehot + beta_ts / vocab_size
    p_single = _clamp_context(p_single, seq_idx_t, generation_mask)
    p_prior = abar_prev * s0_probs + (1.0 - abar_prev) / vocab_size
    p_prior = _clamp_context(p_prior, seq_idx_t, generation_mask)
    p = p_single * p_prior
    return p / jnp.sum(p, axis=-1, keepdims=True)


def log_posterior_from_predicted_t0(
    sched: DiffusionSchedule,
    seq_idx_t: jax.Array,
    s0_probs: jax.Array,
    t: jax.Array,
    generation_mask: jax.Array,
) -> jax.Array:
    """log q(s_{t-1} | s_t, p_hat(s_0)) — the training-loss counterpart of
    posterior_from_predicted_t0, so the KL target and the sampling
    distribution share ONE definition (the DiffAb-paper semantics: the head
    predicts p(s_0); both train and sample push it through this transform).

    Clamped-context rows are point masses (zeros elsewhere), and at t=1 the
    prior term is s0_probs itself which can be ~0 — hence the floor before
    the log; such entries carry ~zero posterior mass and context rows are
    excluded from the loss anyway.
    """
    p = posterior_from_predicted_t0(sched, seq_idx_t, s0_probs, t, generation_mask)
    return jnp.log(jnp.maximum(p, 1e-12))


def reverse_step(
    key: jax.Array,
    sched: DiffusionSchedule,
    seq_idx_t: jax.Array,
    s0_probs: jax.Array,
    t: jax.Array,
    generation_mask: jax.Array,
    s: jax.Array | None = None,
) -> jax.Array:
    """One reverse-diffusion step: sample s_prev (default t-1; any s < t
    for the respaced few-step chain) given s_t and the denoiser's
    predicted p(s_0).  Context residues are clamped."""
    posterior = posterior_from_predicted_t0(
        sched, seq_idx_t, s0_probs, t, generation_mask, s=s
    )
    sampled = categorical_from_probs(key, posterior)
    return jnp.where(generation_mask, sampled, seq_idx_t)


def sample_prior(
    key: jax.Array,
    seq_idx_context: jax.Array,
    generation_mask: jax.Array,
    vocab_size: int = AA_VOCAB_SIZE,
) -> jax.Array:
    """s_T ~ uniform over the vocab on generated positions (the t -> T limit
    of q(s_t|s_0)); context positions keep their sequence."""
    sampled = jax.random.randint(key, seq_idx_context.shape, 0, vocab_size)
    return jnp.where(generation_mask, sampled, seq_idx_context)


class SequenceDiffuser:
    """Thin stateful wrapper mirroring the reference class API
    (diffusion.py:44-192), holding a schedule and vocab size."""

    def __init__(self, T: int, s: float = 0.01, beta_max: float = 0.999,
                 aa_vocab_size: int = AA_VOCAB_SIZE,
                 sched: DiffusionSchedule | None = None):
        from diffab_pytorch_tpu.diffusion.schedule import cosine_variance_schedule

        self.sched = sched if sched is not None else cosine_variance_schedule(
            T, s=s, beta_max=beta_max
        )
        self.aa_vocab_size = aa_vocab_size

    def forward_prob_single_step(self, seq_idx, t, generation_mask):
        return forward_prob_single_step(
            self.sched, seq_idx, t, generation_mask, self.aa_vocab_size
        )

    def forward_prob_from_t0(self, seq_idx_t0, t, generation_mask):
        return forward_prob_from_t0(
            self.sched, seq_idx_t0, t, generation_mask, self.aa_vocab_size
        )

    def diffuse_single_step(self, key, seq_idx, t, generation_mask):
        return diffuse_single_step(
            key, self.sched, seq_idx, t, generation_mask, self.aa_vocab_size
        )

    def diffuse_from_t0(self, key, seq_idx_t0, t, generation_mask,
                        return_posterior: bool = True):
        return diffuse_from_t0(
            key, self.sched, seq_idx_t0, t, generation_mask,
            self.aa_vocab_size, return_posterior,
        )

    def posterior_single_step(self, seq_idx_t, seq_idx_t0, t, generation_mask):
        return posterior_single_step(
            self.sched, seq_idx_t, seq_idx_t0, t, generation_mask, self.aa_vocab_size
        )

    def reverse_step(self, key, seq_idx_t, s0_probs, t, generation_mask):
        return reverse_step(key, self.sched, seq_idx_t, s0_probs, t, generation_mask)
