"""Design evaluation metrics: recovery, RMSD (aligned and unaligned),
per-CDR breakdowns, and design diversity.

The reference has no evaluation code at all (its README "Reproduction
status: WIP", SURVEY.md §6); these are the standard DiffAb-paper metrics a
user needs to assess designs:

  AAR       amino-acid recovery — fraction of generated positions whose
            sampled residue type matches the native sequence.
  RMSD      root-mean-square deviation of generated C-alpha positions
            against the native CDR backbone.  Unaligned by default (the
            fixed context frames the design); `aligned_ca_rmsd` instead
            superposes the design onto the native structure with a Kabsch
            fit over the CONTEXT residues first, which is the right metric
            when comparing structures that were generated in different
            global frames.
  Diversity mean pairwise fraction of differing residues among a group of
            designs for the same target (1 - pairwise sequence identity).

All metrics are masked, batched, and jit-compatible.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from diffab_pytorch_tpu.constants import CDR
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


def kabsch(
    mobile: jax.Array,  # (b, L, 3)
    target: jax.Array,  # (b, L, 3)
    mask: jax.Array,  # (b, L) — positions used for the fit
) -> tuple[jax.Array, jax.Array]:
    """Weighted least-squares rigid superposition (Kabsch, batched).

    Returns (rot, trans) with rot (b, 3, 3), trans (b, 3) such that
    `mobile @ rot + trans` minimizes the masked RMSD to `target`.  Row-vector
    convention, matching the frame convention used throughout
    (models/ipa.py frames_apply: x @ O + t)."""
    w = mask.astype(jnp.float32)[..., None]  # (b, L, 1)
    denom = jnp.maximum(w.sum(axis=1), 1.0)  # (b, 1)
    mu_m = (mobile * w).sum(axis=1) / denom  # (b, 3)
    mu_t = (target * w).sum(axis=1) / denom
    pm = (mobile - mu_m[:, None]) * w
    pt = target - mu_t[:, None]
    # covariance H[b] = sum_i pm_i^T pt_i  -> (b, 3, 3)
    h = jnp.einsum("bli,blj->bij", pm, pt)
    u, _, vt = jnp.linalg.svd(h.astype(jnp.float32))
    # proper rotation: flip the smallest singular direction if det < 0
    det = jnp.linalg.det(jnp.einsum("bij,bjk->bik", u, vt))
    flip = jnp.stack(
        [jnp.ones_like(det), jnp.ones_like(det), det], axis=-1
    )  # (b, 3)
    rot = jnp.einsum("bij,bj,bjk->bik", u, flip, vt)  # (b, 3, 3), x @ rot
    trans = mu_t - jnp.einsum("bi,bij->bj", mu_m, rot)
    return rot, trans


def aligned_ca_rmsd(
    pred_xyz: jax.Array,  # (b, L, 3)
    native_xyz: jax.Array,  # (b, L, 3)
    rmsd_mask: jax.Array,  # (b, L) — positions scored (the generated CDR)
    align_mask: jax.Array,  # (b, L) — positions fit (the fixed context)
    scale: float = 1.0,
) -> jax.Array:
    """Superpose pred onto native by a Kabsch fit over `align_mask`
    positions, then CA-RMSD over `rmsd_mask` positions, (b,)."""
    rot, trans = kabsch(pred_xyz, native_xyz, align_mask)
    moved = jnp.einsum("bli,bij->blj", pred_xyz, rot) + trans[:, None]
    return ca_rmsd(moved, native_xyz, rmsd_mask, scale=scale)


def sequence_diversity(
    seqs: jax.Array,  # (n, L) — n designs for ONE target
    mask: jax.Array,  # (L,) or (n, L) — generated positions
) -> jax.Array:
    """Mean pairwise fraction of differing residues among n designs
    (0 = all identical, ~0.95 = uniform random at vocab 20).  Scalar."""
    n = seqs.shape[0]
    m = mask.astype(jnp.float32)
    if m.ndim == 1:
        m = jnp.broadcast_to(m[None], seqs.shape)
    diff = (seqs[:, None, :] != seqs[None, :, :]).astype(jnp.float32)
    pair_m = m[:, None, :] * m[None, :, :]
    per_pair = (diff * pair_m).sum(-1) / jnp.maximum(pair_m.sum(-1), 1.0)
    off_diag = 1.0 - jnp.eye(n)
    return (per_pair * off_diag).sum() / jnp.maximum(off_diag.sum(), 1.0)


def evaluate_designs(
    result: SampleResult,
    batch: ProteinBatch,
    coord_scale: float = 1.0,
    cdr_idx: Optional[jax.Array] = None,  # (b, L) int — per-residue CDR label
    align: bool = False,
    cdrs: Optional[tuple] = None,  # static CDR-name subset for jit
) -> Dict[str, jax.Array]:
    """Standard design metrics for a sampler output against its input batch.

    cdr_idx (the patch's stored per-CDR labels, structure/patch.py) adds a
    per-CDR breakdown: aar_H3, ca_rmsd_H3, ...  With cdrs=None the CDRs
    present in the generation mask are discovered from the data — which
    requires concrete arrays (NOT jit-traceable).  Under jit, pass the CDR
    names statically, e.g. cdrs=("H3",).  align=True scores RMSD after
    Kabsch superposition on the context residues (useful when frames were
    re-sampled)."""
    gen = batch.generation_mask & batch.residue_mask
    ctx = batch.residue_mask & ~batch.generation_mask

    def rmsd_fn(mask):
        if align:
            return aligned_ca_rmsd(
                result.translations, batch.translations, mask, ctx,
                scale=coord_scale,
            )
        return ca_rmsd(
            result.translations, batch.translations, mask, scale=coord_scale
        )

    out = {
        "aar": amino_acid_recovery(result.seq_idx, batch.seq_idx, gen),
        "ca_rmsd": rmsd_fn(gen),
    }
    if cdr_idx is not None:
        for name, code in CDR.__members__.items():
            if code == CDR.NONE:
                continue
            if cdrs is not None:
                if name not in cdrs:
                    continue
            else:
                cdr_mask_probe = gen & (cdr_idx == int(code))
                if not bool(cdr_mask_probe.any()):
                    continue
            cdr_mask = gen & (cdr_idx == int(code))
            out[f"aar_{name}"] = amino_acid_recovery(
                result.seq_idx, batch.seq_idx, cdr_mask
            )
            out[f"ca_rmsd_{name}"] = rmsd_fn(cdr_mask)
    return out
