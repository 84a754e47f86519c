"""The per-step denoising network.

TPU-native re-design of reference `diffab_pytorch/diffab_pytorch.py:501-607`
(Denoiser): embeds the noisy sequence, fuses it with the precomputed residue
context embedding, runs the IPA stack conditioned on the noisy frames
(R_t, x_t), appends the beta-timestep encoding, and predicts through three
parallel heads:

  translations_eps  (b, L, 3)    — predicted Gaussian noise on x_t
  orientations_t0   (b, L, 3, 3) — R_t composed with a predicted correction
                                    rotation exp(v_hat)
  seq_posterior     (b, L, K)    — softmax distribution over amino acids,
                                    interpreted as the predicted p_hat(s_0)
                                    (key name kept for reference parity,
                                    diffab_pytorch.py:601-607; both the
                                    training KL and the sampler derive the
                                    s_{t-1} posterior from it through
                                    sequence.posterior_from_predicted_t0 —
                                    DESIGN.md §2 #15)

Divergence: the noisy-sequence embedding table is the unified vocab size
(21) instead of the reference's unexplained 25 (diffab_pytorch.py:514,
SURVEY.md §2.9#8).  Unlike the reference, residue_mask is actually used —
it masks the IPA softmax (§2.9#11,#13).
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffab_pytorch_tpu.config import ModelConfig
from diffab_pytorch_tpu.geometry import so3
from diffab_pytorch_tpu.models.encoding import beta_encode
from diffab_pytorch_tpu.models.ipa import InvariantPointAttentionModule


class _Head(nn.Module):
    """3-layer ReLU MLP head (reference diffab_pytorch.py:533-556)."""

    d_hidden: int
    d_out: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.d_hidden, dtype=self.dtype, name="dense_0")(x)
        x = nn.relu(x)
        x = nn.Dense(self.d_hidden, dtype=self.dtype, name="dense_1")(x)
        x = nn.relu(x)
        return nn.Dense(self.d_out, dtype=self.dtype, name="dense_2")(x)


class Denoiser(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        seq_idx_t: jax.Array,  # (b, L) noisy sequence
        translations_t: jax.Array,  # (b, L, 3) noisy CA positions
        orientations_t: jax.Array,  # (b, L, 3, 3) noisy frames
        res_context_emb: jax.Array,  # (b, L, d)
        pair_context_emb: jax.Array,  # (b, L, L, d_pair)
        beta: jax.Array,  # (b,) schedule variance at t
        generation_mask: jax.Array | None = None,  # (b, L) gates sc features
        residue_mask: jax.Array | None = None,  # (b, L) masks attention
        pair_biases: list | None = None,  # precomputed per-layer (b,h,L,L)
        sc_translations_x0: jax.Array | None = None,  # (b, L, 3) prev x0_hat
        sc_seq_probs: jax.Array | None = None,  # (b, L, K) prev p_hat(s_0)
        sc_mask: jax.Array | None = None,  # (b,) or (b, L): estimate is real
    ) -> Dict[str, jax.Array]:
        cfg = self.cfg
        dt = cfg.dtype
        d = cfg.d_residue_emb
        b, L = seq_idx_t.shape
        if not cfg.self_conditioning and sc_translations_x0 is not None:
            raise ValueError(
                "sc_* inputs given but ModelConfig.self_conditioning is off"
            )
        if cfg.sc_late_fusion and not cfg.self_conditioning:
            raise ValueError("sc_late_fusion requires self_conditioning")
        if cfg.sc_split_trunk and not cfg.self_conditioning:
            raise ValueError("sc_split_trunk requires self_conditioning")
        if cfg.sc_split_trunk and cfg.sc_late_fusion:
            raise ValueError(
                "sc_split_trunk and sc_late_fusion are mutually exclusive"
            )
        if sc_translations_x0 is not None and sc_seq_probs is None:
            raise ValueError("sc_translations_x0 requires sc_seq_probs")

        # fuse noisy-sequence embedding with the context embedding.  Under
        # design fan-out (models/ipa.py) the context tensors carry batch
        # bp = b // n while the noisy state carries b; the small residue
        # embedding broadcasts across each target's n designs here (XLA
        # fuses the broadcast into the consumer — no materialized tile),
        # and the big pair tensor stays at bp all the way into attention.
        bc = res_context_emb.shape[0]
        if bc != b:
            if b % bc:
                raise ValueError(
                    f"state batch {b} is not a multiple of context batch {bc}"
                )
            res_context_emb = jnp.broadcast_to(
                res_context_emb[:, None],
                (bc, b // bc) + res_context_emb.shape[1:],
            ).reshape((b,) + res_context_emb.shape[1:])
        s_emb = nn.Embed(cfg.aa_vocab_size, d, dtype=dt, name="sequence_embedding")(
            seq_idx_t
        )
        parts = [res_context_emb.astype(dt), s_emb]
        sc_feats = None
        if cfg.self_conditioning:
            # Rotation-INVARIANT encoding of the previous clean-state
            # estimate: x0_hat expressed in the residue's current noisy
            # frame (global rotations cancel in (x - t) @ R^T), the
            # predicted p(s_0) (already invariant), and a validity flag so
            # zeros-because-absent is distinguishable from
            # zeros-because-coincident.  Gated to GENERATED residues: the
            # implied x0_hat at context rows divides a clean x_t by
            # sqrt(abar) against a garbage eps_hat and is meaningless.
            from diffab_pytorch_tpu.models.ipa import frames_apply_inverse

            K = cfg.aa_vocab_size if cfg.self_conditioning_sequence else 0
            if sc_translations_x0 is None:
                sc_feats = jnp.zeros((b, L, 3 + K + 1), dt)
            else:
                gate = (
                    jnp.ones((b, L), jnp.float32)
                    if generation_mask is None
                    else generation_mask.astype(jnp.float32)
                )
                if sc_mask is not None:
                    m = sc_mask.astype(jnp.float32)
                    gate = gate * (m if m.ndim == 2 else m[:, None])
                gate = gate[..., None]
                sc_local = frames_apply_inverse(
                    sc_translations_x0.astype(jnp.float32),
                    orientations_t.astype(jnp.float32),
                    translations_t.astype(jnp.float32),
                )
                # Saturate the displacement: the implied x0_hat at high t
                # divides by sqrt(abar_t) ~ 1e-3, so a cold model's
                # estimate reaches O(1e3-1e4) normalized units — unbounded,
                # that blows the fuse MLP up within the first few hundred
                # steps (measured: loss NaN by step 600 of the first sc
                # quality run).  tanh keeps the near-field (within ~half
                # the bound) linear and turns "far away" into a direction;
                # 10 units covers the real patch extent (|x| <~ 11, and
                # displacements from x_t are smaller still).
                sc_local = 10.0 * jnp.tanh(sc_local / 10.0)
                pieces = [sc_local * gate]
                if cfg.self_conditioning_sequence:
                    pieces.append(sc_seq_probs.astype(jnp.float32) * gate)
                pieces.append(gate)
                sc_feats = jnp.concatenate(pieces, axis=-1).astype(dt)
            if not cfg.sc_late_fusion and not cfg.sc_split_trunk:
                # early fusion (round 2c): the estimate enters the fuse
                # MLP and flows through the whole trunk
                parts.append(sc_feats)
        res = jnp.concatenate(parts, axis=-1)
        res = nn.Dense(d, dtype=dt, name="fuse_0")(res)
        res = nn.relu(res)
        res = nn.Dense(d, dtype=dt, name="fuse_1")(res)

        # IPA refinement conditioned on the noisy frames
        res = InvariantPointAttentionModule(cfg, name="ipa")(
            res, pair_context_emb, orientations_t, translations_t, residue_mask,
            pair_biases=pair_biases,
        )

        # timestep (variance) encoding
        t_emb = beta_encode(beta.astype(dt))  # (b, 3)
        t_emb = jnp.broadcast_to(t_emb[:, None, :], (b, L, 3))
        res = jnp.concatenate([res, t_emb], axis=-1)

        # Late-fusion self-conditioning (config.py sc_late_fusion): the
        # estimate joins AFTER the trunk and ONLY for the geometry heads
        # — the trunk representation `res` (which the sequence head
        # reads) is computed from context alone, so the sequence head
        # trains effectively 100% cold (the round-4 attribution
        # experiment's named lever, QUALITY.md).
        res_geo = res
        if cfg.self_conditioning and cfg.sc_late_fusion:
            res_geo = jnp.concatenate([res, sc_feats], axis=-1)

        # Split-trunk self-conditioning (config.py sc_split_trunk): the
        # geometry heads read a SECOND trunk — own fuse MLP and own IPA
        # stack — that receives the estimate early-fused, while `res`
        # (the sequence head's input) stays context-only.  Unlike late
        # fusion, even the geometry GRADIENTS cannot touch the sequence
        # pathway's trunk: full architectural isolation at ~2x trunk
        # parameters (the round-5 measured ceiling for the late-fusion
        # seed spread, QUALITY.md).  The geo stack computes its own
        # pair-bias logits (the hoisted pair_biases belong to `ipa`).
        if cfg.self_conditioning and cfg.sc_split_trunk:
            g = jnp.concatenate(
                [res_context_emb.astype(dt), s_emb, sc_feats], axis=-1
            )
            g = nn.Dense(d, dtype=dt, name="geo_fuse_0")(g)
            g = nn.relu(g)
            g = nn.Dense(d, dtype=dt, name="geo_fuse_1")(g)
            g = InvariantPointAttentionModule(cfg, name="geo_ipa")(
                g, pair_context_emb, orientations_t, translations_t,
                residue_mask,
            )
            res_geo = jnp.concatenate([g, t_emb], axis=-1)

        # three parallel heads
        eps_local = _Head(d, 3, dt, name="coordinate_head")(res_geo)
        # Rotate the predicted noise into the GLOBAL frame by the residue's
        # current (noisy) orientation — the DiffAb paper's R_j^(t) G(...)
        # (Luo et al. 2022, coordinate reverse step).  This is load-bearing:
        # every feature reaching the heads is rotation-INVARIANT by
        # construction (distances, dihedrals, IPA's inverse-transformed
        # points), while translations_eps is a rotation-COVARIANT target, so
        # a raw head output — what the reference emits,
        # diffab_pytorch.py:592-593 — is an invariant function fit to a
        # covariant target: under global rotations of the input its best
        # value is 0, the coordinate loss floors at E|eps|^2, and reverse
        # diffusion random-walks (divergence #17, DESIGN.md §2).  Unrolled
        # multiply-adds for the same TPU reason as ipa.frames_apply.
        r = orientations_t.astype(dt)
        translations_eps = (
            eps_local[..., 0:1] * r[..., 0, :]
            + eps_local[..., 1:2] * r[..., 1, :]
            + eps_local[..., 2:3] * r[..., 2, :]
        )

        v_eps = _Head(d, 3, dt, name="orientation_head")(res_geo)
        o_eps = so3.vector_to_rotation_matrix(v_eps.astype(jnp.float32))
        # LOCAL-side composition (o_eps @ O_t, rows-as-axes convention):
        # the invariant head then parameterizes a frame-relative correction
        # and orientations_t0 transforms covariantly under global rotations
        # (O_t -> O_t Q gives o_eps @ O_t Q).  The reference composes on
        # the global side (orientations_t @ o_eps, diffab_pytorch.py:597),
        # which breaks covariance — divergence #17, DESIGN.md §2.
        orientations_t0 = so3.compose(o_eps, orientations_t.astype(jnp.float32))

        seq_logits = _Head(d, cfg.aa_vocab_size, dt, name="sequence_head")(res)
        seq_posterior = jax.nn.softmax(seq_logits.astype(jnp.float32), axis=-1)

        return {
            "translations_eps": translations_eps.astype(jnp.float32),
            "orientations_t0": orientations_t0,
            "seq_posterior": seq_posterior,
            "seq_logits": seq_logits.astype(jnp.float32),
        }
