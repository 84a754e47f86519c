"""Golden numeric parity: our Denoiser vs the reference torch Denoiser,
same weights (VERDICT r3 missing #3 — the last module without a torch
transplant pin).

The reference Denoiser (diffab_pytorch.py:501-607) is run on torch CPU with
its weights transplanted into our flax Denoiser, and every output is
compared.  The two documented covariant-head divergences (DESIGN.md §2 #17)
are NOT bypassed with a model flag — they are inverted analytically in the
assertions, so the transplant pins the shared sub-structure exactly
(sequence-embedding fuse MLP diffab_pytorch.py:514-519, the IPA stack
wiring :521-529, the [beta, sin beta, cos beta] encoding :584-588, and the
three head MLPs :533-556) while the divergence stays isolated to the two
composition lines:

  * translations: ours emits eps_local @ O_t (rows-as-axes rotation into
    the global frame, models/denoiser.py); the reference emits eps_local
    raw (:591-593).  The assertion un-rotates ours: eps_local must equal
    the reference head output elementwise.
  * orientations: ours composes local-side o_eps @ O_t; the reference
    composes global-side O_t @ o_eps (:594-597).  Both sides' o_eps =
    exp(hat(v)) from the SAME head MLP, so recovering it from each
    composition (ours @ O^T vs O^T @ ref's) must agree elementwise.

Residue/attention masking divergences (§2.9#11,#13) are neutralized by
passing residue_mask=None to ours (all-ones to the reference, which
ignores it); the vocab divergence (25 vs unified 21, §2.9#8) by
transplanting the first 21 rows of the reference's sequence embedding —
indices never exceed 20 on either side.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_golden_ipa import _install_reference, _transplant_mlp  # noqa: E402


def _denoiser_pair(d_res=32, d_pair=16, n_layers=2, ds=8, pq=4, pv=4, h=4):
    """Build (reference torch Denoiser, our flax Denoiser, transplant params)."""
    _install_reference()
    from diffab_pytorch.diffab_pytorch import Denoiser as RefDenoiser

    from diffab_pytorch_tpu.config import ModelConfig
    from diffab_pytorch_tpu.models.denoiser import Denoiser

    torch.manual_seed(7)
    ref = RefDenoiser(
        d_residue_emb=d_res, d_pair_emb=d_pair, n_ipa_layers=n_layers,
        d_scalar_per_head=ds, n_query_point_per_head=pq,
        n_value_point_per_head=pv, n_head=h, aa_vocab_size=21,
    ).eval()

    cfg = ModelConfig(
        d_residue_emb=d_res, d_pair_emb=d_pair, n_ipa_layers=n_layers,
        d_scalar_per_head=ds, n_query_point_per_head=pq,
        n_value_point_per_head=pv, n_head=h,
    )
    ours = Denoiser(cfg)

    def k(linear):  # torch weight (out, in) -> flax kernel (in, out)
        return jnp.asarray(linear.weight.detach().numpy().T)

    params = {"params": {
        # reference table is 25 rows (unexplained, §2.9#8); ours is the
        # unified 21 — indices stay in [0, 21) so the first 21 rows are
        # the only reachable ones on both sides
        "sequence_embedding": {"embedding": jnp.asarray(
            ref.sequence_embedding.weight.detach().numpy()[:21]
        )},
        "ipa": {},
    }}
    _transplant_mlp(params["params"], ref.to_res_emb,
                    ["fuse_0", "fuse_1"], [0, 2])
    for head_name, ref_seq in [
        ("coordinate_head", ref.coordinate_denoising),
        ("orientation_head", ref.orientation_denoising),
        ("sequence_head", ref.sequence_denoising),
    ]:
        params["params"][head_name] = {}
        _transplant_mlp(params["params"][head_name], ref_seq,
                        ["dense_0", "dense_1", "dense_2"], [0, 2, 4])
    for i, layer in enumerate(ref.ipa.layers):
        gamma_ref = layer.gamma.detach().numpy()
        assert (gamma_ref > 0).all()
        params["params"]["ipa"][f"layer_{i}"] = {
            "to_q_scalar": {"kernel": k(layer.to_q_scalar)},
            "to_k_scalar": {"kernel": k(layer.to_k_scalar)},
            "to_v_scalar": {"kernel": k(layer.to_v_scalar)},
            "to_pair_bias": {"kernel": k(layer.to_pair_bias)},
            "to_q_point": {"kernel": k(layer.to_q_point)},
            "to_k_point": {"kernel": k(layer.to_k_point)},
            "to_v_point": {"kernel": k(layer.to_v_point)},
            # ours applies softplus(gamma_param); the reference applies
            # its gamma raw (§2.9#10) — softplus^-1 equalizes
            "gamma": jnp.asarray(np.log(np.expm1(gamma_ref))),
            "to_out": {
                "kernel": k(layer.to_out),
                "bias": jnp.asarray(layer.to_out.bias.detach().numpy()),
            },
        }
    return ref, ours, params


def test_denoiser_golden():
    from diffab_pytorch_tpu.geometry import so3

    ref, ours, params = _denoiser_pair()
    B, L, d_res, d_pair = 2, 12, 32, 16

    rng = np.random.default_rng(11)
    seq_idx = rng.integers(0, 21, (B, L)).astype(np.int32)
    trans = rng.normal(size=(B, L, 3)).astype(np.float32) * 4
    rot = np.asarray(so3.uniform(jax.random.key(5), (B, L)))
    res_ctx = rng.normal(size=(B, L, d_res)).astype(np.float32)
    pair_ctx = rng.normal(size=(B, L, L, d_pair)).astype(np.float32)
    beta = rng.uniform(1e-5, 0.999, (B,)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(
            torch.tensor(seq_idx.astype(np.int64)),
            torch.tensor(trans),
            torch.tensor(rot),
            torch.tensor(res_ctx),
            torch.tensor(pair_ctx),
            torch.tensor(beta),
            torch.ones(B, L),  # accepted but unused (§2.9#13)
            torch.ones(B, L),
        )

    our_out = ours.apply(
        params,
        jnp.asarray(seq_idx),
        jnp.asarray(trans),
        jnp.asarray(rot),
        jnp.asarray(res_ctx),
        jnp.asarray(pair_ctx),
        jnp.asarray(beta),
        generation_mask=None,
        residue_mask=None,  # reference IPA never masks (§2.9#11)
    )

    # sequence head: directly comparable end to end (fuse MLP + IPA +
    # beta encoding + head MLP + softmax share semantics exactly)
    np.testing.assert_allclose(
        np.asarray(our_out["seq_posterior"]),
        ref_out["seq_posterior"].numpy(), atol=2e-4, rtol=1e-3,
    )

    # coordinate head: invert OUR covariant rotation (divergence #17a).
    # ours = eps_local @ O (rows as axes) => eps_local = ours @ O^T
    eps_local = np.einsum(
        "blk,bljk->blj", np.asarray(our_out["translations_eps"]), rot
    )
    np.testing.assert_allclose(
        eps_local, ref_out["translations_eps"].numpy(), atol=2e-4, rtol=1e-3,
    )

    # orientation head: both sides build o_eps = exp(hat(v)) from the same
    # MLP; recover it from each composition (divergence #17b) and compare
    o_eps_ours = np.einsum(
        "blij,blkj->blik", np.asarray(our_out["orientations_t0"]), rot
    )  # ours @ O^T
    o_eps_ref = np.einsum(
        "blji,bljk->blik", rot, ref_out["orientations_t0"].numpy()
    )  # O^T @ ref
    np.testing.assert_allclose(o_eps_ours, o_eps_ref, atol=3e-4, rtol=1e-3)
    # and each is a rotation (sanity that the recovery did not cancel)
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), o_eps_ours.shape)
    np.testing.assert_allclose(
        np.einsum("blij,blkj->blik", o_eps_ours, o_eps_ours), eye, atol=1e-4
    )


def test_denoiser_param_structure_matches_transplant():
    """Guard: our Denoiser's parameter tree is exactly the transplant
    layout (if this drifts, test_denoiser_golden silently skips weights)."""
    from diffab_pytorch_tpu.geometry import so3

    _, ours, transplant = _denoiser_pair()
    B, L, d_res, d_pair = 1, 6, 32, 16
    init_params = ours.init(
        jax.random.key(0),
        jnp.zeros((B, L), jnp.int32),
        jnp.zeros((B, L, 3)),
        so3.uniform(jax.random.key(1), (B, L)),
        jnp.zeros((B, L, d_res)),
        jnp.zeros((B, L, L, d_pair)),
        jnp.zeros((B,)),
    )
    expected = jax.tree_util.tree_structure(init_params)
    got = jax.tree_util.tree_structure(transplant)
    assert got == expected, f"transplant tree drifted:\n{got}\nvs\n{expected}"
