"""Context encoders: per-residue and per-pair embeddings.

TPU-native re-design of reference `diffab_pytorch/diffab_pytorch.py:57-312`
(ResidueEmbedding, PairEmbedding) as flax.linen modules.  Deliberate
divergences from the reference, each fixing a documented quirk
(SURVEY.md §2.9) — the reference's own tests only pin shapes here:

  * distmat is computed ON-THE-FLY from xyz inside PairEmbedding (the
    reference expects it in the batch but its collate never provides it —
    KeyError, §2.9#3 — and its preprocessor calls it 171 MB/patch too big
    to store, preprocess_pdb.py:78-79).
  * same-chain gating of the relative-position feature is chain equality
    (chain_idx_i == chain_idx_j, both non-padding), not the product
    chain_idx_i * chain_idx_j (§2.9#9).
  * the dihedral context window is the symmetric {i-1, i, i+1} neighborhood
    without wraparound (phi_i involves residue i-1; psi_i/omega_i involve
    i+1), not the reference's wrapped {i, i+1} roll (§2.9#12).
  * the distance and pairwise-dihedral features are gated by the pair
    structure-context mask (the reference computes the mask but multiplies
    an already-consumed temporary instead — dead code, §2.9#9).
  * vocabulary is uniformly 21 (§2.9#8).

Pair-rank embedding tables (21^2 pair types, relative position) are
one-hot MXU contractions by default (ModelConfig.onehot_pair_tables): the
r4 trace showed their gathers and especially their backward SCATTERS
dominating the train step (61% of device time) while the one-hot matmuls
are bandwidth-trivial and numerically exact.  Per-residue tables (chain
id, aa type) stay gathers/one-hots as before — they are (b, L)-rank and
invisible in the profile.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffab_pytorch_tpu.config import ModelConfig
from diffab_pytorch_tpu.constants import AA, ATOM
from diffab_pytorch_tpu.models.encoding import angular_encode


def _mask_sequence_to_unk(
    seq_idx: jax.Array, sequence_context_mask: jax.Array | None
) -> jax.Array:
    """Outside the sequence context, residue identity is hidden as UNK
    (reference diffab_pytorch.py:113-116,271-273)."""
    if sequence_context_mask is None:
        return seq_idx
    return jnp.where(sequence_context_mask, seq_idx, jnp.int32(AA.UNK))


class ResidueEmbedding(nn.Module):
    """Per-residue context features -> d_feat vector.

    Features (reference diffab_pytorch.py:81-183):
      a) amino-acid type embedding (UNK-masked outside sequence context)
      b) all-atom coordinates in the residue's local frame O^T (x - x_CA),
         scattered into a vocab-by-atom one-hot block
      c) angular encoding of backbone dihedrals, masked to the symmetric
         structure-context window
      d) chain-id embedding (index 0 = padding -> zero vector)
    concatenated through a 4-layer ReLU MLP.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        seq_idx: jax.Array,  # (b, L)
        xyz: jax.Array,  # (b, L, A, 3)
        orientations: jax.Array,  # (b, L, 3, 3)
        dihedrals: jax.Array,  # (b, L, 3)
        chain_idx: jax.Array,  # (b, L)
        atom_mask: jax.Array,  # (b, L, A)
        structure_context_mask: jax.Array | None = None,  # (b, L)
        sequence_context_mask: jax.Array | None = None,  # (b, L)
        dihedrals_mask: jax.Array | None = None,  # (b, L, 3)
    ) -> jax.Array:
        cfg = self.cfg
        dt = cfg.dtype
        vocab = cfg.aa_vocab_size
        d = cfg.d_residue_emb

        seq_idx = _mask_sequence_to_unk(seq_idx, sequence_context_mask)

        # (a) amino-acid type embedding
        aa_feat = nn.Embed(vocab, d, dtype=dt, name="aa_type_embedding")(seq_idx)

        # (b) local-frame coordinates, scattered by amino-acid type.
        # Convention (used consistently with IPA's frames_apply/-inverse):
        # orientation ROWS are the frame axis vectors in global coordinates,
        # so local coords are the projections rel @ O^T.  Zeroed for invalid
        # atoms; the one-hot scatter (b, L, vocab, A, 3) lets the MLP learn
        # per-type atom geometry (reference :119-155).  The scatter is a
        # broadcast product that XLA fuses into the consuming matmul.
        rel = (xyz - xyz[:, :, ATOM.CA : ATOM.CA + 1, :]).astype(dt)
        # local[a, j] = sum_i rel[a, i] O[j, i] — unrolled over the 3-wide
        # contraction (einsum form lowers to a degenerate conv on TPU)
        o = orientations.astype(dt)[:, :, None, :, :]  # (b, L, 1, 3, 3)
        local = (
            rel[..., 0:1] * o[..., :, 0]
            + rel[..., 1:2] * o[..., :, 1]
            + rel[..., 2:3] * o[..., :, 2]
        )
        # where, not multiply: garbage (even NaN/inf) in masked atom slots
        # must not poison valid features via NaN * 0 = NaN
        local = jnp.where(atom_mask[..., None], local, 0.0)
        onehot = jax.nn.one_hot(seq_idx, vocab, dtype=dt)  # (b, L, vocab)
        coord_feat = onehot[..., None, None] * local[:, :, None, :, :]
        coord_feat = coord_feat.reshape(*seq_idx.shape, vocab * cfg.n_atoms * 3)
        if structure_context_mask is not None:
            coord_feat *= structure_context_mask[..., None].astype(dt)

        # (c) dihedral angular encoding.  A residue's (phi, psi, omega) spans
        # neighbors i-1 and i+1, so context requires the full {i-1, i, i+1}
        # window (symmetric, no wraparound — divergence from the reference's
        # wrapped {i, i+1} roll, SURVEY.md §2.9#12).
        dihedral_feat = angular_encode(
            dihedrals.astype(dt), cfg.n_residue_dihedral_funcs
        )
        if dihedrals_mask is not None:
            # invalid angles (chain termini, missing atoms) must contribute
            # zero features, not the encoding of a fake 0.0 angle — the
            # reference ignores its own dihedral validity mask (data.py:86)
            enc_mask = jnp.repeat(
                dihedrals_mask.astype(dt),
                dihedral_feat.shape[-1] // dihedrals.shape[-1],
                axis=-1,
            )
            dihedral_feat *= enc_mask
        if structure_context_mask is not None:
            m = structure_context_mask
            pad = jnp.zeros_like(m[:, :1])
            left = jnp.concatenate([pad, m[:, :-1]], axis=1)
            right = jnp.concatenate([m[:, 1:], pad], axis=1)
            window = m & left & right
            dihedral_feat *= window[..., None].astype(dt)

        # (d) chain embedding with padding_idx=0 semantics (reference :65):
        # row 0 is forced to the zero vector via the validity mask.
        chain_feat = nn.Embed(cfg.max_n_chains, d, dtype=dt, name="chain_embedding")(
            chain_idx
        )
        chain_feat *= (chain_idx > 0)[..., None].astype(dt)

        x = jnp.concatenate([aa_feat, coord_feat, dihedral_feat, chain_feat], axis=-1)
        x = nn.Dense(d * 2, dtype=dt, name="mlp_0")(x)
        x = nn.relu(x)
        x = nn.Dense(d, dtype=dt, name="mlp_1")(x)
        x = nn.relu(x)
        x = nn.Dense(d, dtype=dt, name="mlp_2")(x)
        x = nn.relu(x)
        x = nn.Dense(d, dtype=dt, name="mlp_3")(x)
        return x


def pairwise_dihedrals_from_xyz(xyz: jax.Array, dtype=None) -> jax.Array:
    """Inter-residue (phi-like, psi-like) dihedrals (b, L, L, 2) from
    all-atom coordinates, on device.

    phi-like[i, j] = dihedral(C_i, N_j, CA_j, C_j)
    psi-like[i, j] = dihedral(N_i, CA_i, C_i, N_j)

    Same math as structure.geometry.pairwise_dihedrals (praxeolitic, host
    numpy) — derived in-model so the host pipeline only stacks arrays (the
    reference computes this on the CPU dataloader path per batch,
    data.py:78-80, its hot spot; on a TPU the O(L^2) trig is noise).
    """
    if dtype is not None:
        xyz = xyz.astype(dtype)
    n, ca, c = xyz[:, :, 0], xyz[:, :, 1], xyz[:, :, 2]  # (b, L, 3)

    def dihedral(p0, p1, p2, p3):
        b0 = p0 - p1
        b1 = p2 - p1
        b1 = b1 / jnp.maximum(jnp.linalg.norm(b1, axis=-1, keepdims=True), 1e-8)
        b2 = p3 - p2
        v = b0 - jnp.sum(b0 * b1, axis=-1, keepdims=True) * b1
        w = b2 - jnp.sum(b2 * b1, axis=-1, keepdims=True) * b1
        x = jnp.sum(v * w, axis=-1)
        y = jnp.sum(jnp.cross(b1, v) * w, axis=-1)
        return jnp.arctan2(y, x)

    bi = lambda t: t[:, :, None, :]  # residue i along rows
    bj = lambda t: t[:, None, :, :]  # residue j along cols
    phi = dihedral(bi(c), bj(n), bj(ca), bj(c))
    psi = dihedral(bi(n), bi(ca), bi(c), bj(n))
    return jnp.stack([phi, psi], axis=-1)


def pairwise_sq_distances(xyz: jax.Array, dtype=None) -> jax.Array:
    """All-atom inter-residue squared distances (b, L, L, A, A) from xyz.

    Derived in-model (fixing SURVEY.md §2.9#3).  Uses the
    |x|^2 + |y|^2 - 2 x.y expansion so the cross term is one (L A, 3) x
    (3, L A) matmul on the MXU instead of an (L, L, A, A, 3) difference
    tensor in HBM.

    Numerical precondition: coordinates must be CENTERED (as the data layer
    guarantees, data/dataset.py) — the expansion cancels catastrophically
    in f32 when |x| >> pair distances (raw PDB coordinates ~1e2 A give
    ~1% relative error on short distances; centered unit-scale coords are
    exact to f32 rounding).
    """
    b, L, A, _ = xyz.shape
    x = xyz.reshape(b, L * A, 3)
    if dtype is not None:
        x = x.astype(dtype)
    sq = jnp.sum(x * x, axis=-1)  # (b, LA)
    cross = jnp.einsum("bic,bjc->bij", x, x)  # (b, LA, LA)
    d2 = sq[:, :, None] + sq[:, None, :] - 2.0 * cross
    d2 = jnp.maximum(d2, 0.0)
    return d2.reshape(b, L, A, L, A).transpose(0, 1, 3, 2, 4)


class PairEmbedding(nn.Module):
    """Per-residue-pair context features -> (b, L, L, d_feat).

    Features (reference diffab_pytorch.py:220-312):
      a) amino-acid pair-type embedding over vocab^2 categories
      b) clamped relative sequence position, same-chain gated
      c) distance kernel exp(-softplus(coef_pair) * d^2) over all atom pairs
         -> 2-layer MLP
      d) angular encoding of inter-residue (phi, psi)
    concatenated through a 3-layer MLP, gated by the CA-validity pair mask.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        seq_idx: jax.Array,  # (b, L)
        xyz: jax.Array,  # (b, L, A, 3) — distances derived internally
        pairwise_dihedrals: jax.Array | None,  # (b, L, L, 2); None -> derived
        residue_idx: jax.Array,  # (b, L)
        chain_idx: jax.Array,  # (b, L)
        atom_mask: jax.Array,  # (b, L, A)
        structure_context_mask: jax.Array | None = None,
        sequence_context_mask: jax.Array | None = None,
    ) -> jax.Array:
        cfg = self.cfg
        dt = cfg.dtype
        vocab = cfg.aa_vocab_size
        d = cfg.d_pair_emb
        A = cfg.n_atoms

        seq_idx = _mask_sequence_to_unk(seq_idx, sequence_context_mask)
        seq_pair = seq_idx[:, :, None] * vocab + seq_idx[:, None, :]  # (b, L, L)

        # Pair-table lookups.  With cfg.onehot_pair_tables (the TPU
        # default) every (b, L, L)-indexed table read is an MXU matmul
        # against a one-hot operand instead of a gather — the r4 trace
        # showed the train step spending 61% of device time in these
        # gathers and (worse) their backward scatter-adds into the tiny
        # tables (runs/profile_r4/train_top_ops.json; config.py knob
        # comment).  For the vocab^2 tables the pair one-hot FACTORS:
        #   feat[b,i,j,:] = E[s_i, s_j, :]
        #                 = sum_{u,v} oh[b,i,u] oh[b,j,v] E[u,v,:]
        # computed as two (..., vocab)-contractions, so nothing
        # 441-wide is ever materialized.  Exact: one-hot rows select
        # single table rows (products by 1.0, sums over zeros).
        oh_seq = (
            jax.nn.one_hot(seq_idx, vocab, dtype=dt)
            if cfg.onehot_pair_tables else None
        )

        def pair_table_lookup(embed_mod, width):
            if oh_seq is None:
                return embed_mod(seq_pair)
            table = embed_mod(jnp.arange(vocab * vocab)).reshape(
                vocab, vocab, width
            )  # iota gather = the table itself (XLA folds it)
            # tmp[b, u, j, w] = sum_v oh[b, j, v] E[u, v, w]
            tmp = jnp.einsum("bjv,uvw->bujw", oh_seq, table)
            # feat[b, i, j, w] = sum_u oh[b, i, u] tmp[b, u, j, w]
            return jnp.einsum("biu,bujw->bijw", oh_seq, tmp)

        # (a) pair-type embedding
        pair_feat = pair_table_lookup(
            nn.Embed(vocab * vocab, d, dtype=dt, name="aa_pair_embedding"), d
        )

        # (b) relative position, clamped to +/- max_dist, gated to same-chain
        # non-padding pairs (equality fix, SURVEY.md §2.9#9)
        mdist = cfg.max_dist_to_consider
        relpos = jnp.clip(
            residue_idx[:, :, None] - residue_idx[:, None, :], -mdist, mdist
        )
        relpos_embed = nn.Embed(
            2 * mdist + 1, d, dtype=dt, name="relpos_embedding"
        )
        if cfg.onehot_pair_tables:
            # no factorization across (i, j) here — materialize the
            # (b, L, L, 2 mdist + 1) one-hot; two matmul-reads of it beat
            # the 4 ms backward scatter by ~10x (config.py knob comment)
            oh_rel = jax.nn.one_hot(relpos + mdist, 2 * mdist + 1, dtype=dt)
            relpos_feat = oh_rel @ relpos_embed(jnp.arange(2 * mdist + 1))
        else:
            relpos_feat = relpos_embed(relpos + mdist)
        same_chain = (chain_idx[:, :, None] == chain_idx[:, None, :]) & (
            chain_idx > 0
        )[:, :, None]
        relpos_feat *= same_chain[..., None].astype(dt)

        # (c) distance features: per-pair-type learned RBF widths
        # (zero-initialized like the reference, :198-201), applied to the
        # on-the-fly squared distances.  cfg.dist_atoms narrows the atom
        # set (backbone-only k=4 -> 16 channels instead of A^2 = 225) —
        # the train-side HBM lever, measured in DESIGN.md §3.
        k_at = cfg.dist_atoms or A
        d_xyz, d_amask = xyz[:, :, :k_at], atom_mask[:, :, :k_at]
        coef = pair_table_lookup(
            nn.Embed(
                vocab * vocab,
                k_at * k_at,
                embedding_init=nn.initializers.zeros,
                dtype=dt,
                name="pair2distcoef",
            ),
            k_at * k_at,
        )
        coef = jax.nn.softplus(coef)  # (b, L, L, k*k)
        d2 = pairwise_sq_distances(d_xyz, dtype=dt).reshape(
            *seq_pair.shape, k_at * k_at
        )
        atom_pair_mask = (
            d_amask[:, :, None, :, None] & d_amask[:, None, :, None, :]
        ).reshape(*seq_pair.shape, k_at * k_at)
        # where before exp: garbage coordinates in masked atom slots would
        # otherwise poison valid pairs through NaN * 0 = NaN
        d2 = jnp.where(atom_pair_mask, d2, 0.0)
        dist_kernel = jnp.exp(-coef * d2) * atom_pair_mask.astype(dt)
        dist_feat = nn.Dense(d, dtype=dt, name="distance_mlp_0")(dist_kernel)
        dist_feat = nn.relu(dist_feat)
        dist_feat = nn.Dense(d, dtype=dt, name="distance_mlp_1")(dist_feat)
        dist_feat = nn.relu(dist_feat)

        # (d) inter-residue dihedral encoding (derived on device when the
        # batch does not carry precomputed angles)
        if pairwise_dihedrals is None:
            bb_ok = atom_mask[:, :, 0] & atom_mask[:, :, 1] & atom_mask[:, :, 2]
            pair_ok = bb_ok[:, :, None] & bb_ok[:, None, :]
            pairwise_dihedrals = jnp.where(
                pair_ok[..., None], pairwise_dihedrals_from_xyz(xyz, dtype=dt), 0.0
            )
        dihedral_feat = angular_encode(
            pairwise_dihedrals.astype(dt), cfg.n_pair_dihedral_funcs
        )

        # structure-context gating of geometry-derived features (intended
        # behavior of the reference's dead stanza, SURVEY.md §2.9#9)
        if structure_context_mask is not None:
            pair_ctx = (
                structure_context_mask[:, :, None]
                & structure_context_mask[:, None, :]
            )[..., None].astype(dt)
            dist_feat *= pair_ctx
            dihedral_feat *= pair_ctx

        blocks = [pair_feat, relpos_feat, dist_feat, dihedral_feat]
        mlp0 = nn.Dense(d, dtype=dt, name="mlp_0")
        if cfg.split_pair_mlp0:
            # per-block partial matmuls instead of concat + one matmul
            # (config.py split_pair_mlp0): each block is consumed in its
            # native layout; the (b, L, L, 162) concat and its layout
            # copy never materialize.  Kernel materialized through the
            # same Dense (identity matmul — param tree unchanged, the
            # ipa.py to_out trick); bias added once.
            total = sum(blk.shape[-1] for blk in blocks)
            b_row = mlp0(jnp.zeros((1, total), dt))  # (1, d)
            W = mlp0(jnp.eye(total, dtype=dt)) - b_row  # (total, d)
            x = b_row.reshape(-1)
            off = 0
            for blk in blocks:
                w = blk.shape[-1]
                x = x + blk @ W[off:off + w]
                off += w
        else:
            x = mlp0(jnp.concatenate(blocks, axis=-1))
        x = nn.relu(x)
        x = nn.Dense(d, dtype=dt, name="mlp_1")(x)
        x = nn.relu(x)
        x = nn.Dense(d, dtype=dt, name="mlp_2")(x)

        # final gating by CA validity of both residues (reference :265-268,312)
        ca_valid = atom_mask[:, :, ATOM.CA]
        pair_valid = ca_valid[:, :, None] & ca_valid[:, None, :]
        return x * pair_valid[..., None].astype(dt)
