"""Design evaluation metrics: amino-acid recovery and CDR backbone RMSD.

The reference has no evaluation code at all (its README "Reproduction
status: WIP", SURVEY.md §6); these are the standard DiffAb-paper metrics a
user needs to assess designs:

  AAR   amino-acid recovery — fraction of generated positions whose sampled
        residue type matches the native sequence.
  RMSD  root-mean-square deviation of generated C-alpha positions against
        the native CDR backbone (in the model's normalized frame unless a
        scale is given; no alignment — the context frames the design).

Both are masked, batched, jit-compatible.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from diffab_pytorch_tpu.data.batch import ProteinBatch
from diffab_pytorch_tpu.sampling.sampler import SampleResult


def amino_acid_recovery(
    pred_seq: jax.Array,  # (b, L)
    native_seq: jax.Array,  # (b, L)
    mask: jax.Array,  # (b, L) — positions that were generated
) -> jax.Array:
    """Per-sample AAR, (b,)."""
    m = mask.astype(jnp.float32)
    correct = (pred_seq == native_seq).astype(jnp.float32) * m
    return correct.sum(-1) / jnp.maximum(m.sum(-1), 1.0)


def ca_rmsd(
    pred_xyz: jax.Array,  # (b, L, 3)
    native_xyz: jax.Array,  # (b, L, 3)
    mask: jax.Array,  # (b, L)
    scale: float = 1.0,
) -> jax.Array:
    """Per-sample C-alpha RMSD over masked positions, (b,).  Multiply by
    the data normalization scale (data.dataset.COORD_SCALE) for angstroms."""
    m = mask.astype(jnp.float32)
    sq = jnp.sum((pred_xyz - native_xyz) ** 2, axis=-1) * m
    return jnp.sqrt(sq.sum(-1) / jnp.maximum(m.sum(-1), 1.0)) * scale


def evaluate_designs(
    result: SampleResult,
    batch: ProteinBatch,
    coord_scale: float = 1.0,
) -> Dict[str, jax.Array]:
    """Standard design metrics for a sampler output against its input batch."""
    gen = batch.generation_mask & batch.residue_mask
    return {
        "aar": amino_acid_recovery(result.seq_idx, batch.seq_idx, gen),
        "ca_rmsd": ca_rmsd(
            result.translations, batch.translations, gen, scale=coord_scale
        ),
    }
