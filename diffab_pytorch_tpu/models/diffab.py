"""The DiffAb model: context encoding + denoising as one flax module.

TPU-native re-design of the network-owning part of reference
`diffab_pytorch/diffab_pytorch.py:628-768` (DiffAb.encode_context /
DiffAb.denoise).  The training harness (losses, optimizer, metrics) lives in
`train/` and the sampler in `sampling/` — the nn.Module holds parameters
only, so it jits, shards and checkpoints as a plain pytree.

Context-conditioning modes (reference :693-700; exercised by the 4-way
parametrization of tests/test_modules.py:251-254):

  generate_structure  generate_sequence  task
  True                True               sequence-structure codesign
  True                False              fix-sequence  (structure design)
  False               True               fix-structure (sequence design)
  False               False              everything visible (packing)

When a modality is NOT generated, its features for ALL residues are visible
context (mask=None); otherwise only non-generated residues are.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffab_pytorch_tpu.config import ModelConfig
from diffab_pytorch_tpu.data.batch import ProteinBatch
from diffab_pytorch_tpu.models.denoiser import Denoiser
from diffab_pytorch_tpu.models.embedding import PairEmbedding, ResidueEmbedding


class DiffAbModel(nn.Module):
    cfg: ModelConfig

    def setup(self):
        self.residue_context_embedding = ResidueEmbedding(self.cfg)
        # remat_pair (config.py): recompute the pair stack's (b, L, L, A^2)
        # intermediates in the backward instead of storing them — the
        # training step's dominant HBM traffic (DESIGN.md §3).
        pair_cls = (
            nn.remat(PairEmbedding) if self.cfg.remat_pair else PairEmbedding
        )
        self.pair_context_embedding = pair_cls(self.cfg)
        self.denoiser = Denoiser(self.cfg)

    def encode_context(
        self,
        batch: ProteinBatch,
        generate_structure: bool = True,
        generate_sequence: bool = True,
        structure_visible: jax.Array | None = None,
        sequence_visible: jax.Array | None = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Compute (res_context_emb, pair_context_emb) from t0 ground truth.

        t-independent: computed once per sample and reused by every
        denoising step (reference :680-724; SURVEY.md §3.3).

        A NOT-generated modality is visible context for ALL valid residues:
        its context mask is `residue_mask` (not literally-everything — the
        reference's None-mask also exposes padding rows and unguarded
        chain-boundary dihedrals, a path its never-run training could not
        exercise; DESIGN.md §2 #19).  The static `generate_*` flags set this
        per batch; `structure_visible` / `sequence_visible` are the
        per-SAMPLE (b,) form used by training-time context-mode dropout
        (TrainConfig.mode_dropout), so one jitted step trains codesign,
        fix-structure, and fix-sequence conditioning jointly."""
        context_mask = batch.residue_mask & ~batch.generation_mask

        def ctx(flag: bool, visible: jax.Array | None) -> jax.Array:
            if visible is not None:
                return jnp.where(
                    visible[:, None], batch.residue_mask, context_mask
                )
            return context_mask if flag else batch.residue_mask

        structure_ctx = ctx(generate_structure, structure_visible)
        sequence_ctx = ctx(generate_sequence, sequence_visible)

        res_emb = self.residue_context_embedding(
            batch.seq_idx,
            batch.xyz,
            batch.orientations,
            batch.backbone_dihedrals,
            batch.chain_idx,
            batch.atom_mask,
            structure_context_mask=structure_ctx,
            sequence_context_mask=sequence_ctx,
            dihedrals_mask=batch.backbone_dihedrals_mask,
        )
        pair_emb = self.pair_context_embedding(
            batch.seq_idx,
            batch.xyz,
            batch.pairwise_dihedrals,
            batch.residue_idx,
            batch.chain_idx,
            batch.atom_mask,
            structure_context_mask=structure_ctx,
            sequence_context_mask=sequence_ctx,
        )
        return res_emb, pair_emb

    def denoise(
        self,
        seq_idx_t: jax.Array,
        translations_t: jax.Array,
        orientations_t: jax.Array,
        res_context_emb: jax.Array,
        pair_context_emb: jax.Array,
        beta: jax.Array,
        generation_mask: jax.Array,
        residue_mask: jax.Array,
        pair_biases: list | None = None,
        sc_translations_x0: jax.Array | None = None,
        sc_seq_probs: jax.Array | None = None,
        sc_mask: jax.Array | None = None,
    ) -> Dict[str, jax.Array]:
        """One denoising prediction at timestep t (reference :726-768).
        pair_biases: optional per-layer precomputed bias logits
        (models.ipa.precompute_pair_biases) — t-independent, hoisted out of
        sampling loops.  sc_*: previous clean-state estimate for
        self-conditioning (ModelConfig.self_conditioning)."""
        return self.denoiser(
            seq_idx_t,
            translations_t,
            orientations_t,
            res_context_emb,
            pair_context_emb,
            beta,
            generation_mask=generation_mask,
            residue_mask=residue_mask,
            pair_biases=pair_biases,
            sc_translations_x0=sc_translations_x0,
            sc_seq_probs=sc_seq_probs,
            sc_mask=sc_mask,
        )

    def __call__(
        self,
        batch: ProteinBatch,
        seq_idx_t: jax.Array,
        translations_t: jax.Array,
        orientations_t: jax.Array,
        beta: jax.Array,
        generate_structure: bool = True,
        generate_sequence: bool = True,
        structure_visible: jax.Array | None = None,
        sequence_visible: jax.Array | None = None,
        sc_translations_x0: jax.Array | None = None,
        sc_seq_probs: jax.Array | None = None,
        sc_mask: jax.Array | None = None,
    ) -> Dict[str, jax.Array]:
        """Full forward: encode context then denoise (used for init and as
        the single-step training forward)."""
        res_emb, pair_emb = self.encode_context(
            batch, generate_structure, generate_sequence,
            structure_visible=structure_visible,
            sequence_visible=sequence_visible,
        )
        return self.denoise(
            seq_idx_t,
            translations_t,
            orientations_t,
            res_emb,
            pair_emb,
            beta,
            batch.generation_mask,
            batch.residue_mask,
            sc_translations_x0=sc_translations_x0,
            sc_seq_probs=sc_seq_probs,
            sc_mask=sc_mask,
        )
