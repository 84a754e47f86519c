"""The featurized-batch schema — the framework's wire format.

Mirrors the dict produced by the reference's collate_fn (data.py:82-96) and
preprocessor (preprocess_pdb.py:67-80), see SURVEY.md §2.8, with two
deliberate changes:

  * `distmat` (b, L, L, A, A) is NOT part of the schema — it is derived
    on-the-fly from xyz inside the pair embedding.  The reference excluded
    it from disk (171 MB/patch, preprocess_pdb.py:78-79) but still read
    batch["distmat"] in training (diffab_pytorch.py:833), a guaranteed
    KeyError (SURVEY.md §2.9#3).  Deriving it in-model fixes the bug and
    shrinks the sample format.
  * `residue_idx` is (b, L) (the reference emits (1, L) and relies on torch
    broadcasting, data.py:91) — explicit batch dim, SPMD-shardable.

A flax.struct dataclass is a pytree: it jits, shards, donates, and stacks
like any array bundle.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class ProteinBatch:
    """One featurized batch of K-residue patches (static shapes, XLA-friendly).

    Shapes use b = batch, L = patch size (128), A = max atoms/residue (15).
    """

    xyz: jax.Array  # (b, L, A, 3) float — all-atom coordinates
    orientations: jax.Array  # (b, L, 3, 3) float — backbone frames
    backbone_dihedrals: jax.Array  # (b, L, 3) float — phi, psi, omega
    backbone_dihedrals_mask: jax.Array  # (b, L, 3) bool
    pairwise_dihedrals: jax.Array | None  # (b, L, L, 2) or None (derived in-model)
    atom_mask: jax.Array  # (b, L, A) bool
    seq_idx: jax.Array  # (b, L) int32 — amino-acid types
    chain_idx: jax.Array  # (b, L) int32 — 0 = padding
    residue_idx: jax.Array  # (b, L) int32 — position along the chain
    residue_mask: jax.Array  # (b, L) bool — valid residues
    generation_mask: jax.Array  # (b, L) bool — residues to generate (CDRs)

    @property
    def batch_size(self) -> int:
        return self.seq_idx.shape[0]

    @property
    def n_residues(self) -> int:
        return self.seq_idx.shape[1]

    @property
    def translations(self) -> jax.Array:
        """C-alpha coordinates (b, L, 3) — the diffused translation variable
        (reference diffab_pytorch.py:820 via ATOM.CA)."""
        from diffab_pytorch_tpu.constants import ATOM

        return self.xyz[:, :, ATOM.CA, :]


def synthetic_batch(
    key: jax.Array,
    batch_size: int = 2,
    n_residues: int = 128,
    n_atoms: int = 15,
    vocab_size: int = 21,
    n_generate: int = 16,
    dtype=jnp.float32,
) -> ProteinBatch:
    """Random but internally consistent batch for tests and benchmarks
    (orthonormal frames, CA at slot 1, contiguous generation window).

    Coordinates are UNIT-SCALE, matching what the data pipeline feeds the
    model (real patches are centered and divided by COORD_SCALE so the
    x_T ~ N(0, I) prior matches the data, data/dataset.py) — the reverse
    process diverges on un-normalized coordinates."""
    from diffab_pytorch_tpu.geometry import so3

    ks = jax.random.split(key, 6)
    orientations = so3.uniform(ks[0], (batch_size, n_residues), dtype=dtype)
    ca = jax.random.normal(ks[1], (batch_size, n_residues, 1, 3), dtype) * 1.2
    offsets = (
        jax.random.normal(ks[2], (batch_size, n_residues, n_atoms, 3), dtype) * 0.15
    )
    xyz = ca + offsets

    seq_idx = jax.random.randint(ks[3], (batch_size, n_residues), 0, vocab_size - 1)
    dihedrals = jax.random.uniform(
        ks[4], (batch_size, n_residues, 3), dtype, -jnp.pi, jnp.pi
    )
    pair_dihedrals = jax.random.uniform(
        ks[5], (batch_size, n_residues, n_residues, 2), dtype, -jnp.pi, jnp.pi
    )

    start = n_residues // 2 - n_generate // 2
    gen = jnp.zeros((batch_size, n_residues), bool)
    gen = gen.at[:, start : start + n_generate].set(True)

    chain = jnp.ones((batch_size, n_residues), jnp.int32)
    chain = chain.at[:, n_residues // 2 :].set(2)

    return ProteinBatch(
        xyz=xyz,
        orientations=orientations,
        backbone_dihedrals=dihedrals,
        backbone_dihedrals_mask=jnp.ones((batch_size, n_residues, 3), bool),
        pairwise_dihedrals=pair_dihedrals,
        atom_mask=jnp.ones((batch_size, n_residues, n_atoms), bool),
        seq_idx=seq_idx,
        chain_idx=chain,
        residue_idx=jnp.broadcast_to(
            jnp.arange(n_residues, dtype=jnp.int32), (batch_size, n_residues)
        ),
        residue_mask=jnp.ones((batch_size, n_residues), bool),
        generation_mask=gen,
    )
