"""Model-module shape and invariance contracts.

Mirrors the reference tests/test_modules.py shape contracts (SURVEY.md §4),
including the 4-way (generate_structure, generate_sequence) context-mode
parametrization, on synthetic structures — plus SE(3)-invariance checks the
reference lacks (the whole point of IPA) and an equivalence test of the
|q-k|^2 matmul expansion against the naive difference-tensor formula.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffab_pytorch_tpu.config import ModelConfig, tiny_config
from diffab_pytorch_tpu.data.batch import synthetic_batch
from diffab_pytorch_tpu.geometry import so3
from diffab_pytorch_tpu.models import (
    DiffAbModel,
    Denoiser,
    InvariantPointAttentionLayer,
    InvariantPointAttentionModule,
    PairEmbedding,
    ResidueEmbedding,
    angular_encode,
    angular_encoding_dim,
    frames_apply,
    frames_apply_inverse,
    pairwise_sq_distances,
)

CFG = tiny_config().model
B, L, A = 2, 32, 15


@pytest.fixture(scope="module")
def batch():
    return synthetic_batch(jax.random.key(0), B, L, A, n_generate=8)


def test_angular_encoding_dims():
    """Output dim d_in * (num_funcs * 4 + 1) — reference tests :16-25."""
    for num_funcs, d_in in [(3, 3), (2, 2), (5, 7)]:
        x = jax.random.uniform(jax.random.key(0), (B, L, d_in))
        enc = angular_encode(x, num_funcs)
        assert enc.shape == (B, L, angular_encoding_dim(d_in, num_funcs))
    # identity band is the raw angle
    x = jnp.array([[0.5, -1.0]])
    enc = angular_encode(x, 1).reshape(1, 2, 5)
    np.testing.assert_allclose(enc[0, :, 0], x[0])
    np.testing.assert_allclose(enc[0, :, 1], jnp.sin(x[0]), atol=1e-7)


def test_frames_apply_roundtrip():
    key = jax.random.key(1)
    rot = so3.uniform(key, (B, L))
    trans = jax.random.normal(jax.random.key(2), (B, L, 3))
    pts = jax.random.normal(jax.random.key(3), (B, L, 4, 5, 3))
    glob = frames_apply(pts, rot, trans)
    back = frames_apply_inverse(glob, rot, trans)
    np.testing.assert_allclose(back, pts, atol=1e-5)


def test_pairwise_sq_distances_matches_naive():
    xyz = jax.random.normal(jax.random.key(4), (B, 8, 5, 3)) * 10
    d2 = pairwise_sq_distances(xyz)
    naive = jnp.sum(
        (xyz[:, :, None, :, None, :] - xyz[:, None, :, None, :, :]) ** 2, axis=-1
    )
    assert d2.shape == (B, 8, 8, 5, 5)
    np.testing.assert_allclose(d2, naive, atol=1e-3)


class TestResidueEmbedding:
    def test_shapes_and_modes(self, batch):
        model = ResidueEmbedding(CFG)
        ctx = batch.residue_mask & ~batch.generation_mask
        for s_ctx in [None, ctx]:
            for q_ctx in [None, ctx]:
                out, _ = model.init_with_output(
                    jax.random.key(0),
                    batch.seq_idx,
                    batch.xyz,
                    batch.orientations,
                    batch.backbone_dihedrals,
                    batch.chain_idx,
                    batch.atom_mask,
                    structure_context_mask=s_ctx,
                    sequence_context_mask=q_ctx,
                )
                assert out.shape == (B, L, CFG.d_residue_emb)
                assert bool(jnp.all(jnp.isfinite(out)))

    def test_rigid_invariance(self, batch):
        """Features are invariant to a global rigid transform of the
        structure (local-frame coordinates)."""
        model = ResidueEmbedding(CFG)
        params = model.init(
            jax.random.key(0),
            batch.seq_idx, batch.xyz, batch.orientations,
            batch.backbone_dihedrals, batch.chain_idx, batch.atom_mask,
        )
        out1 = model.apply(
            params, batch.seq_idx, batch.xyz, batch.orientations,
            batch.backbone_dihedrals, batch.chain_idx, batch.atom_mask,
        )
        R = so3.uniform(jax.random.key(5), ())
        t = jnp.array([3.0, -2.0, 7.0])
        xyz2 = jnp.einsum("blac,cd->blad", batch.xyz, R) + t
        ori2 = jnp.einsum("blic,cd->blid", batch.orientations, R)
        out2 = model.apply(
            params, batch.seq_idx, xyz2, ori2,
            batch.backbone_dihedrals, batch.chain_idx, batch.atom_mask,
        )
        np.testing.assert_allclose(out1, out2, atol=2e-3)


class TestPairEmbedding:
    def test_shapes_and_modes(self, batch):
        model = PairEmbedding(CFG)
        ctx = batch.residue_mask & ~batch.generation_mask
        for s_ctx in [None, ctx]:
            out, _ = model.init_with_output(
                jax.random.key(0),
                batch.seq_idx,
                batch.xyz,
                batch.pairwise_dihedrals,
                batch.residue_idx,
                batch.chain_idx,
                batch.atom_mask,
                structure_context_mask=s_ctx,
                sequence_context_mask=ctx,
            )
            assert out.shape == (B, L, L, CFG.d_pair_emb)
            assert bool(jnp.all(jnp.isfinite(out)))

    def test_invalid_pairs_zeroed(self, batch):
        model = PairEmbedding(CFG)
        atom_mask = batch.atom_mask.at[:, -4:, :].set(False)  # kill CA validity
        out, _ = model.init_with_output(
            jax.random.key(0),
            batch.seq_idx, batch.xyz, batch.pairwise_dihedrals,
            batch.residue_idx, batch.chain_idx, atom_mask,
        )
        np.testing.assert_allclose(out[:, -4:, :, :], 0.0, atol=1e-7)
        np.testing.assert_allclose(out[:, :, -4:, :], 0.0, atol=1e-7)


class TestDistAtoms:
    """ModelConfig.dist_atoms narrows the pair distance feature's atom set
    (the train-HBM lever, DESIGN.md §3) without touching anything else."""

    def test_none_equals_all_atoms(self, batch):
        import dataclasses as dc

        args = (batch.seq_idx, batch.xyz, batch.pairwise_dihedrals,
                batch.residue_idx, batch.chain_idx, batch.atom_mask)
        m_none = PairEmbedding(CFG)
        m_all = PairEmbedding(dc.replace(CFG, dist_atoms=CFG.n_atoms))
        params = m_none.init(jax.random.key(0), *args)
        out_none = m_none.apply(params, *args)
        out_all = m_all.apply(params, *args)  # same tree: widths match
        np.testing.assert_array_equal(out_none, out_all)

    def test_backbone_only_ignores_sidechain_atoms(self, batch):
        import dataclasses as dc

        cfg4 = dc.replace(CFG, dist_atoms=4)
        model = PairEmbedding(cfg4)
        args = (batch.seq_idx, batch.xyz, batch.pairwise_dihedrals,
                batch.residue_idx, batch.chain_idx, batch.atom_mask)
        params = model.init(jax.random.key(0), *args)
        coef = params["params"]["pair2distcoef"]["embedding"]
        assert coef.shape[-1] == 16  # 4 x 4 atom pairs
        out1 = model.apply(params, *args)
        # perturbing a side-chain atom's coordinates must not move the
        # narrowed feature (atom indices >= 4 never enter it) ...
        xyz2 = batch.xyz.at[:, :, 10, :].add(3.0)
        out2 = model.apply(params, batch.seq_idx, xyz2,
                           batch.pairwise_dihedrals, batch.residue_idx,
                           batch.chain_idx, batch.atom_mask)
        np.testing.assert_array_equal(out1, out2)
        # ... while a backbone atom does (softplus(0) = ln 2, so the
        # zero-initialized kernel still depends on d2 at init)
        xyz3 = batch.xyz.at[:, :, 1, :].add(0.5)
        out3 = model.apply(params, batch.seq_idx, xyz3,
                           batch.pairwise_dihedrals, batch.residue_idx,
                           batch.chain_idx, batch.atom_mask)
        assert float(jnp.max(jnp.abs(out3 - out1))) > 1e-6

    def test_full_model_trains_and_records(self, batch, tmp_path):
        import dataclasses as dc

        from diffab_pytorch_tpu.config import tiny_config
        from diffab_pytorch_tpu.train import DiffAb
        from diffab_pytorch_tpu.train import checkpoint as ckpt_lib

        cfg = tiny_config()
        cfg = dc.replace(cfg, model=dc.replace(cfg.model, dist_atoms=4))
        harness = DiffAb(cfg)
        state = harness.init(jax.random.key(0), batch)
        step = harness.make_train_step(donate=False)
        state, metrics = step(state, batch, jax.random.key(1))
        assert np.isfinite(float(metrics["train/loss"]))
        # the architecture record round-trips the knob
        ckpt_lib.save_model_config(str(tmp_path), cfg.model)
        loaded = ckpt_lib.load_model_config(str(tmp_path))
        assert loaded.dist_atoms == 4


class TestIPA:
    def _inputs(self, key):
        ks = jax.random.split(key, 4)
        x = jax.random.normal(ks[0], (B, L, CFG.d_residue_emb))
        pair = jax.random.normal(ks[1], (B, L, L, CFG.d_pair_emb))
        rot = so3.uniform(ks[2], (B, L))
        trans = jax.random.normal(ks[3], (B, L, 3)) * 5
        return x, pair, rot, trans

    def test_layer_shape(self):
        x, pair, rot, trans = self._inputs(jax.random.key(0))
        layer = InvariantPointAttentionLayer(CFG)
        out, _ = layer.init_with_output(jax.random.key(1), x, pair, rot, trans)
        assert out.shape == (B, L, CFG.d_residue_emb)

    def test_module_stacks(self):
        x, pair, rot, trans = self._inputs(jax.random.key(2))
        mod = InvariantPointAttentionModule(CFG)
        out, params = mod.init_with_output(jax.random.key(3), x, pair, rot, trans)
        assert out.shape == (B, L, CFG.d_residue_emb)
        layer_names = [k for k in params["params"].keys()]
        assert len(layer_names) == CFG.n_ipa_layers

    def test_se3_invariance(self):
        """IPA output is invariant under a global rigid motion of the frames
        — the defining property (AF2 IPA); the reference never tests it."""
        x, pair, rot, trans = self._inputs(jax.random.key(4))
        layer = InvariantPointAttentionLayer(CFG)
        params = layer.init(jax.random.key(5), x, pair, rot, trans)
        out1 = layer.apply(params, x, pair, rot, trans)

        Rg = so3.uniform(jax.random.key(6), ())
        tg = jnp.array([11.0, -4.0, 2.0])
        rot2 = jnp.einsum("blic,cd->blid", rot, Rg)
        trans2 = jnp.einsum("blc,cd->bld", trans, Rg) + tg
        out2 = layer.apply(params, x, pair, rot2, trans2)
        np.testing.assert_allclose(out1, out2, atol=2e-3)

    def test_point_logit_expansion_equals_naive(self):
        """|q_i - k_j|^2 via the matmul expansion == naive difference tensor."""
        q = jax.random.normal(jax.random.key(7), (B, L, 4, 4, 3))
        k = jax.random.normal(jax.random.key(8), (B, L, 4, 4, 3))
        qf = q.reshape(B, L, 4, 12)
        kf = k.reshape(B, L, 4, 12)
        expansion = (
            jnp.sum(qf * qf, -1).transpose(0, 2, 1)[:, :, :, None]
            + jnp.sum(kf * kf, -1).transpose(0, 2, 1)[:, :, None, :]
            - 2 * jnp.einsum("bihc,bjhc->bhij", qf, kf)
        )
        naive = jnp.sum(
            (q[:, :, None, :, :, :] - k[:, None, :, :, :, :]) ** 2, axis=(-1, -2)
        ).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(expansion, naive, atol=1e-3)

    def test_padding_mask_blocks_attention(self):
        """Padded residues do not influence valid residues' outputs."""
        x, pair, rot, trans = self._inputs(jax.random.key(9))
        mask = jnp.ones((B, L), bool).at[:, -8:].set(False)
        layer = InvariantPointAttentionLayer(CFG)
        params = layer.init(jax.random.key(10), x, pair, rot, trans, mask)
        out1 = layer.apply(params, x, pair, rot, trans, mask)
        # scramble the padded rows entirely
        x2 = x.at[:, -8:].set(jax.random.normal(jax.random.key(11), (B, 8, CFG.d_residue_emb)) * 50)
        trans2 = trans.at[:, -8:].set(999.0)
        out2 = layer.apply(params, x2, pair, rot, trans2, mask)
        np.testing.assert_allclose(out1[:, :-8], out2[:, :-8], atol=1e-4)


class TestDenoiser:
    def test_output_contract(self, batch):
        den = Denoiser(CFG)
        beta = jnp.array([0.01, 0.4])
        out, _ = den.init_with_output(
            jax.random.key(0),
            batch.seq_idx,
            batch.translations,
            batch.orientations,
            jnp.zeros((B, L, CFG.d_residue_emb)),
            jnp.zeros((B, L, L, CFG.d_pair_emb)),
            beta,
            generation_mask=batch.generation_mask,
            residue_mask=batch.residue_mask,
        )
        assert out["translations_eps"].shape == (B, L, 3)
        assert out["orientations_t0"].shape == (B, L, 3, 3)
        assert out["seq_posterior"].shape == (B, L, CFG.aa_vocab_size)
        # predicted orientations are valid rotations
        prod = jnp.einsum("...ij,...ik->...jk", out["orientations_t0"], out["orientations_t0"])
        np.testing.assert_allclose(prod, jnp.broadcast_to(jnp.eye(3), prod.shape), atol=1e-4)
        # sequence posterior is a distribution
        np.testing.assert_allclose(out["seq_posterior"].sum(-1), 1.0, rtol=1e-5)


class TestDiffAbModel:
    @pytest.mark.parametrize("gen_structure", [True, False])
    @pytest.mark.parametrize("gen_sequence", [True, False])
    def test_encode_and_denoise_modes(self, batch, gen_structure, gen_sequence):
        """4-mode context conditioning — reference tests :251-312."""
        model = DiffAbModel(CFG)
        beta = jnp.array([0.01, 0.4])
        out, params = model.init_with_output(
            jax.random.key(0),
            batch,
            batch.seq_idx,
            batch.translations,
            batch.orientations,
            beta,
            generate_structure=gen_structure,
            generate_sequence=gen_sequence,
        )
        assert out["translations_eps"].shape == (B, L, 3)
        assert out["orientations_t0"].shape == (B, L, 3, 3)
        assert out["seq_posterior"].shape == (B, L, CFG.aa_vocab_size)

    def test_encode_context_shapes(self, batch):
        model = DiffAbModel(CFG)
        beta = jnp.array([0.01, 0.4])
        params = model.init(
            jax.random.key(0), batch, batch.seq_idx, batch.translations,
            batch.orientations, beta,
        )
        res, pair = model.apply(params, batch, method="encode_context")
        assert res.shape == (B, L, CFG.d_residue_emb)
        assert pair.shape == (B, L, L, CFG.d_pair_emb)

    def test_jit_forward(self, batch):
        model = DiffAbModel(CFG)
        beta = jnp.array([0.01, 0.4])
        params = model.init(
            jax.random.key(0), batch, batch.seq_idx, batch.translations,
            batch.orientations, beta,
        )
        fwd = jax.jit(
            lambda p, b: model.apply(
                p, b, b.seq_idx, b.translations, b.orientations, beta
            )
        )
        out = fwd(params, batch)
        assert bool(jnp.all(jnp.isfinite(out["translations_eps"])))


def test_remat_ipa_equivalence(batch):
    """remat_ipa=True: identical outputs and gradients, lower peak memory."""
    import dataclasses

    from diffab_pytorch_tpu.models.ipa import InvariantPointAttentionModule

    x = jax.random.normal(jax.random.key(20), (B, L, CFG.d_residue_emb))
    pair = jax.random.normal(jax.random.key(21), (B, L, L, CFG.d_pair_emb))
    rot = so3.uniform(jax.random.key(22), (B, L))
    trans = jax.random.normal(jax.random.key(23), (B, L, 3))

    mod = InvariantPointAttentionModule(CFG)
    params = mod.init(jax.random.key(24), x, pair, rot, trans)
    mod_r = InvariantPointAttentionModule(dataclasses.replace(CFG, remat_ipa=True))

    out = mod.apply(params, x, pair, rot, trans)
    out_r = mod_r.apply(params, x, pair, rot, trans)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out), atol=1e-5)

    g = jax.jit(jax.grad(
        lambda p: jnp.sum(mod.apply(p, x, pair, rot, trans) ** 2)
    ))(params)
    g_r = jax.jit(jax.grad(
        lambda p: jnp.sum(mod_r.apply(p, x, pair, rot, trans) ** 2)
    ))(params)
    for a, b_ in zip(jax.tree.leaves(g), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), atol=1e-4)


def test_remat_pair_equivalence(batch):
    """remat_pair=True (config.py): the full-model forward and parameter
    gradients are identical to the plain path — rematerializing the
    pair-embedding stack is a memory/traffic schedule change only."""
    import dataclasses

    model = DiffAbModel(CFG)
    model_r = DiffAbModel(dataclasses.replace(CFG, remat_pair=True))
    beta = jnp.array([0.01, 0.4])
    params = model.init(
        jax.random.key(30), batch, batch.seq_idx, batch.translations,
        batch.orientations, beta,
    )
    # the lifted nn.remat does not change the parameter tree
    params_r = model_r.init(
        jax.random.key(30), batch, batch.seq_idx, batch.translations,
        batch.orientations, beta,
    )
    assert jax.tree.structure(params) == jax.tree.structure(params_r)

    def loss(m, p):
        out = m.apply(
            p, batch, batch.seq_idx, batch.translations,
            batch.orientations, beta,
        )
        return (
            jnp.sum(out["translations_eps"] ** 2)
            + jnp.sum(out["seq_posterior"] ** 2)
        )

    np.testing.assert_allclose(
        float(loss(model_r, params)), float(loss(model, params)), rtol=1e-6
    )
    g = jax.jit(jax.grad(lambda p: loss(model, p)))(params)
    g_r = jax.jit(jax.grad(lambda p: loss(model_r, p)))(params)
    for a, b_ in zip(jax.tree.leaves(g), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=2e-5, atol=1e-5
        )


def test_fuse_pair_bias_equivalence(batch):
    """fuse_pair_bias (config.py): projecting all layers' pair-bias logits
    in ONE matmul over the pair tensor gives the same forward and the same
    parameter gradients (and tree) as the per-layer projections — it only
    changes how many times the pair tensor crosses HBM."""
    import dataclasses

    model = DiffAbModel(dataclasses.replace(CFG, fuse_pair_bias=True))
    model_u = DiffAbModel(dataclasses.replace(CFG, fuse_pair_bias=False))
    beta = jnp.array([0.01, 0.4])
    params = model.init(
        jax.random.key(31), batch, batch.seq_idx, batch.translations,
        batch.orientations, beta,
    )
    params_u = model_u.init(
        jax.random.key(31), batch, batch.seq_idx, batch.translations,
        batch.orientations, beta,
    )
    assert jax.tree.structure(params) == jax.tree.structure(params_u)

    def loss(m, p):
        out = m.apply(
            p, batch, batch.seq_idx, batch.translations,
            batch.orientations, beta,
        )
        return (
            jnp.sum(out["translations_eps"] ** 2)
            + jnp.sum(out["seq_posterior"] ** 2)
        )

    np.testing.assert_allclose(
        float(loss(model, params)), float(loss(model_u, params)), rtol=1e-6
    )
    g = jax.jit(jax.grad(lambda p: loss(model, p)))(params)
    g_u = jax.jit(jax.grad(lambda p: loss(model_u, p)))(params)
    for a, b_ in zip(jax.tree.leaves(g), jax.tree.leaves(g_u)):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=2e-5, atol=1e-5
        )


def test_split_pair_mlp0_equivalence(batch):
    """split_pair_mlp0 (config.py, round 4): the per-block partial
    matmuls equal the concat + single matmul to f32 regrouping, forward
    and parameter gradients, with the param tree unchanged."""
    import dataclasses

    args = (batch.seq_idx, batch.xyz, batch.pairwise_dihedrals,
            batch.residue_idx, batch.chain_idx, batch.atom_mask)
    m_on = PairEmbedding(dataclasses.replace(CFG, split_pair_mlp0=True))
    m_off = PairEmbedding(dataclasses.replace(CFG, split_pair_mlp0=False))
    params = m_on.init(jax.random.key(40), *args)
    assert jax.tree.structure(params) == jax.tree.structure(
        m_off.init(jax.random.key(40), *args)
    )
    a = m_on.apply(params, *args)
    b_ = m_off.apply(params, *args)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                               rtol=1e-5, atol=1e-5)
    g_on = jax.jit(jax.grad(
        lambda p: jnp.sum(m_on.apply(p, *args) ** 2)))(params)
    g_off = jax.jit(jax.grad(
        lambda p: jnp.sum(m_off.apply(p, *args) ** 2)))(params)
    for x, y in zip(jax.tree.leaves(g_on), jax.tree.leaves(g_off)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-4)


def test_onehot_pair_tables_equivalence(batch):
    """onehot_pair_tables (config.py, round 4): pair-table lookups as
    one-hot MXU contractions are BIT-equal to the gather path in forward,
    and the parameter gradients agree — the flag only changes how the
    table reads/gradient-accumulations are scheduled (matmuls vs
    gather/scatter, the 61%-of-device-time finding in
    runs/profile_r4/train_top_ops.json)."""
    import dataclasses

    model = DiffAbModel(dataclasses.replace(CFG, onehot_pair_tables=True))
    model_g = DiffAbModel(dataclasses.replace(CFG, onehot_pair_tables=False))
    beta = jnp.array([0.01, 0.4])
    params = model.init(
        jax.random.key(33), batch, batch.seq_idx, batch.translations,
        batch.orientations, beta,
    )
    assert jax.tree.structure(params) == jax.tree.structure(
        model_g.init(
            jax.random.key(33), batch, batch.seq_idx, batch.translations,
            batch.orientations, beta,
        )
    )
    # randomize the zero-init dist-coef table so its lookup is exercised
    pe = params["params"]["pair_context_embedding"]
    pe["pair2distcoef"]["embedding"] = 0.3 * jax.random.normal(
        jax.random.key(34), pe["pair2distcoef"]["embedding"].shape
    )

    def loss(m, p):
        out = m.apply(
            p, batch, batch.seq_idx, batch.translations,
            batch.orientations, beta,
        )
        return (
            jnp.sum(out["translations_eps"] ** 2)
            + jnp.sum(out["seq_posterior"] ** 2)
        )

    np.testing.assert_array_equal(
        np.asarray(loss(model, params)), np.asarray(loss(model_g, params))
    )
    g = jax.jit(jax.grad(lambda p: loss(model, p)))(params)
    g_g = jax.jit(jax.grad(lambda p: loss(model_g, p)))(params)
    for a, b_ in zip(jax.tree.leaves(g), jax.tree.leaves(g_g)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-5, atol=1e-5
        )


def test_denoiser_se3_equivariance(batch):
    """Under a global rotation Q of the whole system (row convention:
    x' = x @ Q, O' = O @ Q), the full model's heads must transform as
      translations_eps' = translations_eps @ Q   (covariant — the
        coordinate head is rotated by the noisy frame; a raw head, which
        is what the reference emits at diffab_pytorch.py:592-593, is
        invariant and cannot learn eps under rotations, divergence #17)
      orientations_t0'  = orientations_t0 @ Q    (covariant)
      seq_posterior'    = seq_posterior          (invariant)
    """
    import dataclasses as dc

    model = DiffAbModel(dc.replace(CFG, compute_dtype="float32"))
    beta = jnp.array([0.01, 0.4])
    k = jax.random.key(3)
    x_t = batch.translations + 0.1 * jax.random.normal(k, (B, L, 3))
    r_t = batch.orientations
    params = model.init(jax.random.key(0), batch, batch.seq_idx, x_t, r_t, beta)

    theta = 1.1
    q = jnp.array(
        [[jnp.cos(theta), -jnp.sin(theta), 0.0],
         [jnp.sin(theta), jnp.cos(theta), 0.0],
         [0.0, 0.0, 1.0]]
    )
    rot_batch = batch.replace(
        xyz=batch.xyz @ q,
        orientations=batch.orientations @ q,
    )

    out = model.apply(params, batch, batch.seq_idx, x_t, r_t, beta)
    out_r = model.apply(
        params, rot_batch, batch.seq_idx, x_t @ q, r_t @ q, beta
    )

    np.testing.assert_allclose(
        np.asarray(out_r["translations_eps"]),
        np.asarray(out["translations_eps"] @ q),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_r["orientations_t0"]),
        np.asarray(out["orientations_t0"] @ q),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_r["seq_posterior"]),
        np.asarray(out["seq_posterior"]),
        atol=2e-4,
    )
    # the covariance is non-trivial: eps actually changes under Q
    assert float(jnp.abs(out_r["translations_eps"] - out["translations_eps"]).max()) > 1e-3
