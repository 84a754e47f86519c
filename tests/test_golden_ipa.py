"""Golden numeric parity: our IPA vs the reference torch IPA, same weights.

The reference IPA (diffab_pytorch.py:339-465) is imported from
/root/reference and run on torch CPU; its weights are transplanted into our
flax layer (kernels transposed, gamma converted through softplus^-1 since we
apply softplus in the forward — SURVEY.md §2.9#10) and outputs are compared
element-wise.  This pins that the MXU-shaped reformulation (|q-k|^2
expansion, fused einsums) is EXACTLY the reference computation, not merely
similar.  AngularEncoding is cross-checked the same way.
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _install_reference():
    if "diffab_pytorch" in sys.modules:
        return
    pl = types.ModuleType("pytorch_lightning")
    pl.LightningModule = torch.nn.Module
    sys.modules.setdefault("pytorch_lightning", pl)
    import enum

    protstruc = types.ModuleType("protstruc")
    general = types.ModuleType("protstruc.general")

    class ATOM(enum.IntEnum):
        N, CA, C, O, CB = 0, 1, 2, 3, 4

    class AA(enum.IntEnum):
        UNK = 20

    general.ATOM, general.AA = ATOM, AA
    protstruc.general = general
    sys.modules.setdefault("protstruc", protstruc)
    sys.modules.setdefault("protstruc.general", general)
    sys.path.insert(0, "/root/reference")


def test_angular_encoding_golden():
    _install_reference()
    from diffab_pytorch.diffab_pytorch import AngularEncoding

    from diffab_pytorch_tpu.models import angular_encode

    x = np.random.default_rng(0).uniform(-np.pi, np.pi, (2, 7, 3)).astype(np.float32)
    ref = AngularEncoding(num_funcs=3)(torch.tensor(x)).numpy()
    ours = np.asarray(angular_encode(jnp.asarray(x), num_funcs=3))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_ipa_layer_golden():
    _install_reference()
    from diffab_pytorch.diffab_pytorch import InvariantPointAttentionLayer as RefIPA

    from diffab_pytorch_tpu.config import ModelConfig
    from diffab_pytorch_tpu.geometry import so3
    from diffab_pytorch_tpu.models import InvariantPointAttentionLayer

    d_res, d_pair, ds, pq, pv, h = 32, 16, 8, 4, 4, 4
    B, L = 2, 24

    torch.manual_seed(0)
    ref = RefIPA(d_res, d_pair, ds, pq, pv, h, use_pair_bias=True).eval()

    cfg = ModelConfig(
        d_residue_emb=d_res, d_pair_emb=d_pair, d_scalar_per_head=ds,
        n_query_point_per_head=pq, n_value_point_per_head=pv, n_head=h,
    )
    ours = InvariantPointAttentionLayer(cfg)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, L, d_res)).astype(np.float32)
    pair = rng.normal(size=(B, L, L, d_pair)).astype(np.float32)
    rot = np.asarray(so3.uniform(jax.random.key(0), (B, L)))
    trans = rng.normal(size=(B, L, 3)).astype(np.float32) * 4

    # --- transplant reference weights into flax ---
    def k(linear):  # torch weight (out, in) -> flax kernel (in, out)
        return jnp.asarray(linear.weight.detach().numpy().T)

    # our forward applies softplus(gamma_param); the reference applies its
    # gamma raw.  softplus^-1(gamma_ref) equalizes the two.
    gamma_ref = ref.gamma.detach().numpy()
    assert (gamma_ref > 0).all()
    gamma_param = np.log(np.expm1(gamma_ref))

    params = {
        "params": {
            "to_q_scalar": {"kernel": k(ref.to_q_scalar)},
            "to_k_scalar": {"kernel": k(ref.to_k_scalar)},
            "to_v_scalar": {"kernel": k(ref.to_v_scalar)},
            "to_pair_bias": {"kernel": k(ref.to_pair_bias)},
            "to_q_point": {"kernel": k(ref.to_q_point)},
            "to_k_point": {"kernel": k(ref.to_k_point)},
            "to_v_point": {"kernel": k(ref.to_v_point)},
            "gamma": jnp.asarray(gamma_param),
            "to_out": {
                "kernel": k(ref.to_out),
                "bias": jnp.asarray(ref.to_out.bias.detach().numpy()),
            },
        }
    }

    with torch.no_grad():
        ref_out = ref(
            torch.tensor(x), torch.tensor(pair), torch.tensor(rot),
            torch.tensor(trans),
        ).numpy()

    our_out = np.asarray(
        ours.apply(params, jnp.asarray(x), jnp.asarray(pair), jnp.asarray(rot),
                   jnp.asarray(trans))
    )
    # identical math reformulated for the MXU: agreement to fp32 accumulation
    np.testing.assert_allclose(our_out, ref_out, atol=2e-4, rtol=1e-4)


def test_ipa_param_structure_matches_transplant():
    """Guard: our layer's parameter tree is exactly the transplant layout
    (if this drifts, the golden test silently skips weights)."""
    from diffab_pytorch_tpu.config import ModelConfig
    from diffab_pytorch_tpu.geometry import so3
    from diffab_pytorch_tpu.models import InvariantPointAttentionLayer

    cfg = ModelConfig(
        d_residue_emb=32, d_pair_emb=16, d_scalar_per_head=8,
        n_query_point_per_head=4, n_value_point_per_head=4, n_head=4,
    )
    layer = InvariantPointAttentionLayer(cfg)
    params = layer.init(
        jax.random.key(0),
        jnp.zeros((1, 4, 32)), jnp.zeros((1, 4, 4, 16)),
        so3.uniform(jax.random.key(1), (1, 4)), jnp.zeros((1, 4, 3)),
    )
    expected = {
        "to_q_scalar", "to_k_scalar", "to_v_scalar", "to_pair_bias",
        "to_q_point", "to_k_point", "to_v_point", "gamma", "to_out",
    }
    assert set(params["params"].keys()) == expected


def _transplant_mlp(params_dst: dict, ref_seq, names, torch_indices):
    """Copy torch nn.Sequential Linear weights into named flax Dense params."""
    for name, idx in zip(names, torch_indices):
        lin = ref_seq[idx]
        params_dst[name] = {
            "kernel": jnp.asarray(lin.weight.detach().numpy().T),
            "bias": jnp.asarray(lin.bias.detach().numpy()),
        }


@pytest.mark.parametrize("with_seq_context", [False, True])
def test_residue_embedding_golden(with_seq_context):
    """ResidueEmbedding matches the reference elementwise with transplanted
    weights (diffab_pytorch.py:57-183), under configs that neutralize the
    documented divergences (VERDICT r2 missing #3):

      * structure_context_mask=None — sidesteps the dihedral-window
        divergence (wrapped {i,i+1} roll vs symmetric window, §2.9#12);
      * orientations transposed between conventions (our rows are frame
        axes, local = rel @ O^T; the reference's columns are, local =
        rel @ O_ref — so O_ours = O_ref^T makes the locals identical);
      * finite coordinates — our `where` NaN-guard equals the reference's
        multiply masking on finite inputs.
    The UNK fill of non-context residues (sequence_context_mask) is
    semantically identical and exercised by the parametrization."""
    _install_reference()
    from diffab_pytorch.diffab_pytorch import ResidueEmbedding as RefRes

    from diffab_pytorch_tpu.config import ModelConfig
    from diffab_pytorch_tpu.geometry import so3
    from diffab_pytorch_tpu.models.embedding import ResidueEmbedding

    A, d, B, L = 4, 16, 2, 12
    torch.manual_seed(0)
    ref = RefRes(max_n_atoms_per_residue=A, d_feat=d).eval()

    cfg = ModelConfig(d_residue_emb=d, n_atoms=A)
    ours = ResidueEmbedding(cfg)

    rng = np.random.default_rng(2)
    seq_idx = rng.integers(0, 21, (B, L)).astype(np.int32)
    xyz = rng.normal(size=(B, L, A, 3)).astype(np.float32)
    rot = np.asarray(so3.uniform(jax.random.key(2), (B, L)))
    dihedrals = rng.uniform(-np.pi, np.pi, (B, L, 3)).astype(np.float32)
    chain_idx = rng.integers(0, 2, (B, L)).astype(np.int32)  # {0 pad, 1}
    atom_mask = rng.random((B, L, A)) < 0.8
    atom_mask[:, :, :3] = True  # backbone always present
    seq_ctx = (rng.random((B, L)) < 0.6) if with_seq_context else None

    params = {
        "params": {
            "aa_type_embedding": {
                "embedding": jnp.asarray(
                    ref.amino_acid_type_embedding.weight.detach().numpy()
                )
            },
            "chain_embedding": {
                "embedding": jnp.asarray(
                    ref.chain_embedding.weight.detach().numpy()
                )
            },
        }
    }
    _transplant_mlp(
        params["params"], ref.mlp,
        ["mlp_0", "mlp_1", "mlp_2", "mlp_3"], [0, 2, 4, 6],
    )

    with torch.no_grad():
        ref_out = ref(
            torch.tensor(seq_idx.astype(np.int64)),
            torch.tensor(xyz),
            torch.tensor(rot),
            torch.tensor(dihedrals),
            torch.tensor(chain_idx.astype(np.int64)),
            torch.tensor(atom_mask.astype(np.float32)),
            structure_context_mask=None,
            sequence_context_mask=(
                torch.tensor(seq_ctx) if seq_ctx is not None else None
            ),
        ).numpy()

    our_out = np.asarray(
        ours.apply(
            params,
            jnp.asarray(seq_idx),
            jnp.asarray(xyz),
            jnp.asarray(rot).transpose(0, 1, 3, 2),  # convention, see above
            jnp.asarray(dihedrals),
            jnp.asarray(chain_idx),
            jnp.asarray(atom_mask),
            structure_context_mask=None,
            sequence_context_mask=(
                jnp.asarray(seq_ctx) if seq_ctx is not None else None
            ),
        )
    )
    np.testing.assert_allclose(our_out, ref_out, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("with_seq_context", [False, True])
def test_pair_embedding_golden(with_seq_context):
    """PairEmbedding matches the reference elementwise with transplanted
    weights (diffab_pytorch.py:186-312), under configs that neutralize the
    documented divergences (VERDICT r2 missing #3):

      * chain_idx in {0, 1} — the reference's product chain mask equals
        our equality-and-nonpad mask there (§2.9#9);
      * structure_context_mask=None — the reference's context stanza is
        dead code (multiplies a consumed temporary, §2.9#9), ours gates
        features, so only the None case is comparable;
      * the reference consumes a DISTANCE matrix and squares it; ours
        derives squared distances from xyz in-model (§2.9#3) — the ref
        input is the exact distances of the same xyz."""
    _install_reference()
    from diffab_pytorch.diffab_pytorch import PairEmbedding as RefPair

    from diffab_pytorch_tpu.config import ModelConfig
    from diffab_pytorch_tpu.models.embedding import PairEmbedding

    A, d, B, L, mdist = 3, 16, 2, 10, 8
    torch.manual_seed(1)
    ref = RefPair(
        max_n_atoms_per_residue=A, d_feat=d, max_dist_to_consider=mdist
    ).eval()

    cfg = ModelConfig(d_pair_emb=d, n_atoms=A, max_dist_to_consider=mdist)
    ours = PairEmbedding(cfg)

    rng = np.random.default_rng(3)
    seq_idx = rng.integers(0, 21, (B, L)).astype(np.int32)
    xyz = rng.normal(size=(B, L, A, 3)).astype(np.float32)
    pair_dihedrals = rng.uniform(-np.pi, np.pi, (B, L, L, 2)).astype(np.float32)
    residue_idx = np.cumsum(rng.integers(1, 4, (B, L)), axis=1).astype(np.int32)
    chain_idx = rng.integers(0, 2, (B, L)).astype(np.int32)
    atom_mask = rng.random((B, L, A)) < 0.8  # includes some invalid CAs
    seq_ctx = (rng.random((B, L)) < 0.6) if with_seq_context else None

    # exact distances for the reference (it squares them internally)
    diff = xyz[:, :, None, :, None, :] - xyz[:, None, :, None, :, :]
    distmat = np.sqrt((diff**2).sum(-1)).astype(np.float32)  # (B,L,L,A,A)

    params = {"params": {
        "aa_pair_embedding": {
            "embedding": jnp.asarray(
                ref.aa_pair_type_embedding.weight.detach().numpy()
            )
        },
        "relpos_embedding": {
            "embedding": jnp.asarray(ref.relpos_embedding.weight.detach().numpy())
        },
        "pair2distcoef": {
            "embedding": jnp.asarray(ref.pair2distcoef.weight.detach().numpy())
        },
    }}
    # zero-init'd coefs match the zero-divergence case only; randomize to
    # exercise the exp kernel for real
    with torch.no_grad():
        ref.pair2distcoef.weight.normal_(0.0, 0.5)
    params["params"]["pair2distcoef"]["embedding"] = jnp.asarray(
        ref.pair2distcoef.weight.detach().numpy()
    )
    _transplant_mlp(
        params["params"], ref.distance_embedding,
        ["distance_mlp_0", "distance_mlp_1"], [0, 2],
    )
    _transplant_mlp(
        params["params"], ref.mlp, ["mlp_0", "mlp_1", "mlp_2"], [0, 2, 4]
    )

    with torch.no_grad():
        ref_out = ref(
            torch.tensor(seq_idx.astype(np.int64)),
            torch.tensor(distmat),
            torch.tensor(pair_dihedrals),
            torch.tensor(residue_idx.astype(np.int64)),
            torch.tensor(chain_idx.astype(np.int64)),
            torch.tensor(atom_mask.astype(np.float32)),
            structure_context_mask=None,
            sequence_context_mask=(
                torch.tensor(seq_ctx) if seq_ctx is not None else None
            ),
        ).numpy()

    our_out = np.asarray(
        ours.apply(
            params,
            jnp.asarray(seq_idx),
            jnp.asarray(xyz),
            jnp.asarray(pair_dihedrals),
            jnp.asarray(residue_idx),
            jnp.asarray(chain_idx),
            jnp.asarray(atom_mask),
            structure_context_mask=None,
            sequence_context_mask=(
                jnp.asarray(seq_ctx) if seq_ctx is not None else None
            ),
        )
    )
    np.testing.assert_allclose(our_out, ref_out, atol=3e-4, rtol=1e-3)


def test_orientation_loss_golden():
    """Our orientation discrepancy (x9 per-residue sum) matches the
    reference OrientationLoss elementwise semantics (diffab_pytorch.py:610-625)."""
    _install_reference()
    from diffab_pytorch.diffab_pytorch import OrientationLoss

    from diffab_pytorch_tpu.geometry import so3
    from diffab_pytorch_tpu.train.losses import orientation_discrepancy

    pred = np.asarray(so3.uniform(jax.random.key(30), (2, 6)))
    target = np.asarray(so3.uniform(jax.random.key(31), (2, 6)))
    ref = OrientationLoss(reduction="none")(
        torch.tensor(pred), torch.tensor(target)
    ).numpy()  # (b, L, 3, 3) elementwise squares
    ours = np.asarray(
        9.0 * orientation_discrepancy(jnp.asarray(pred), jnp.asarray(target))
    )
    np.testing.assert_allclose(ours, ref.sum((-1, -2)), atol=1e-5)
