"""Structure-layer tests: PDB parsing, CDR masks, geometry, patches.

The reference delegates all of this to external protstruc (SURVEY.md §2.7)
and ships no tests for it; these pin our implementation's contracts on
synthetic Chothia-numbered complexes.
"""

import numpy as np
import pytest

from diffab_pytorch_tpu.constants import CDR, CHOTHIA_CDR_RANGES
from diffab_pytorch_tpu.structure import (
    antibody,
    featurize_patch,
    extract_patch_mask,
    geometry,
    load_patch,
    parse_pdb,
    save_patch,
)
from diffab_pytorch_tpu.structure.testing import make_synthetic_antibody_pdb


@pytest.fixture(scope="module")
def pdb_text():
    return make_synthetic_antibody_pdb(seed=0)


@pytest.fixture(scope="module")
def complex_(pdb_text):
    return antibody.from_chains(
        parse_pdb(pdb_text), "H", "L", ["A"], keep_fv_only=True
    )


def test_parse_pdb_chains(pdb_text):
    chains = parse_pdb(pdb_text)
    assert set(chains) == {"H", "L", "A"}
    assert len(chains["H"]) == 118
    assert len(chains["L"]) == 107
    r = chains["H"][0]
    assert r.resseq == 1
    assert r.atom_mask[:4].all()  # N, CA, C, O present


def test_fv_trimming(pdb_text):
    c = antibody.from_chains(parse_pdb(pdb_text), "H", "L", ["A"], keep_fv_only=True)
    h = c.residue_number[c.chain_idx == 1]
    assert h.max() <= 113  # heavy Fv bound
    c2 = antibody.from_chains(parse_pdb(pdb_text), "H", "L", ["A"], keep_fv_only=False)
    assert c2.n_residues > c.n_residues


def test_cdr_masks(complex_):
    for name, (lo, hi) in CHOTHIA_CDR_RANGES.items():
        mask = complex_.get_cdr_mask([name])
        nums = complex_.residue_number[mask]
        chains = complex_.chain_idx[mask]
        expected_chain = 1 if name[0] == "H" else 2
        assert (chains == expected_chain).all()
        assert nums.min() == lo and nums.max() == hi
        assert mask.sum() == hi - lo + 1  # contiguous numbering in fixture

    # full CDR mask = union; H3 flag value sanity
    assert complex_.get_cdr_mask().sum() == sum(
        hi - lo + 1 for lo, hi in CHOTHIA_CDR_RANGES.values()
    )
    assert (complex_.cdr_idx[complex_.get_cdr_mask(["H3"])] == int(CDR.H3)).all()

    with pytest.raises(ValueError, match="unknown CDRs"):
        complex_.get_cdr_mask(["H9"])


def test_anchor_mask(complex_):
    anchors = complex_.get_cdr_anchor_mask()
    # one residue on each side of each of the 6 CDRs
    assert anchors.sum() == 12
    # anchors are adjacent to CDR boundaries, not inside CDRs
    assert not (anchors & complex_.get_cdr_mask()).any()


def test_antigen_mask(complex_):
    ag = complex_.get_antigen_mask()
    assert ag.sum() == 60
    assert (complex_.chain_idx[ag] == 3).all()


def test_backbone_orientations(complex_):
    rot = complex_.backbone_orientations()
    prod = np.einsum("lij,lkj->lik", rot, rot)
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), prod.shape), atol=1e-5)
    det = np.linalg.det(rot)
    np.testing.assert_allclose(det, 1.0, atol=1e-5)


def test_backbone_dihedrals(complex_):
    vals, mask = complex_.backbone_dihedrals()
    assert vals.shape == (complex_.n_residues, 3)
    # interior residues have valid phi/psi/omega; chain starts lack phi
    h_start = 0
    assert not mask[h_start, 0]  # no phi at chain start
    assert mask[h_start, 1] and mask[h_start, 2]
    assert mask[5].all()
    # chain boundaries do not leak: first light-chain residue has no phi
    l_start = int(np.nonzero(complex_.chain_idx == 2)[0][0])
    assert not mask[l_start, 0]
    # angles in [-pi, pi]
    assert np.abs(vals).max() <= np.pi + 1e-6


def test_pairwise_dihedrals(complex_):
    sub = complex_.residue_masked_select(np.arange(complex_.n_residues) < 16)
    pd = sub.pairwise_dihedrals()
    assert pd.shape == (16, 16, 2)
    assert np.isfinite(pd).all()


def test_dihedral_angle_golden():
    """Known geometry: a planar cis arrangement gives 0, trans gives pi."""
    p0 = np.array([1.0, 1.0, 0.0])
    p1 = np.array([0.0, 1.0, 0.0])
    p2 = np.array([0.0, 0.0, 0.0])
    p3_trans = np.array([-1.0, 0.0, 0.0])
    p3_cis = np.array([1.0, 0.0, 0.0])
    assert abs(abs(geometry.dihedral_angle(p0, p1, p2, p3_trans)) - np.pi) < 1e-6
    assert abs(geometry.dihedral_angle(p0, p1, p2, p3_cis)) < 1e-6


def test_patch_extraction(complex_):
    mask = extract_patch_mask(complex_, k=64)
    assert mask.sum() >= 64  # union of ab-or-ag and ag-only
    # antigen residues near the CDRs are included
    assert (mask & complex_.get_antigen_mask()).any()


def test_featurize_patch_fixed_size(complex_, tmp_path):
    sample = featurize_patch(complex_, patch_size=64)
    assert sample["xyz"].shape == (64, 15, 3)
    assert sample["orientations"].shape == (64, 3, 3)
    assert sample["residue_mask"].sum() == 64  # enough residues to fill
    assert sample["cdr_idx"].max() > 0  # CDRs present in the patch

    # round-trip through disk
    p = str(tmp_path / "patch.npz")
    save_patch(p, sample)
    loaded = load_patch(p)
    for k in sample:
        np.testing.assert_array_equal(loaded[k], sample[k])


def test_patch_padding_when_small():
    """A tiny complex pads up to patch_size with residue_mask False."""
    text = make_synthetic_antibody_pdb(seed=1, antigen_len=5)
    c = antibody.from_chains(parse_pdb(text), "H", "L", ["A"], keep_fv_only=True)
    sample = featurize_patch(c, patch_size=256)
    n_real = int(sample["residue_mask"].sum())
    assert n_real == c.n_residues
    assert not sample["residue_mask"][n_real:].any()
    # padded orientations are identity (finite downstream math)
    pad = sample["orientations"][n_real:]
    np.testing.assert_allclose(pad, np.broadcast_to(np.eye(3), pad.shape))


def test_residue_idx_preserved_through_patching(complex_):
    """Per-chain sequential indices survive subsetting (correct relpos in
    patches — divergence from the reference's post-subset arange)."""
    sample = featurize_patch(complex_, patch_size=64)
    m = sample["residue_mask"]
    for chain in np.unique(sample["chain_idx"][m]):
        sel = (sample["chain_idx"] == chain) & m
        idx = sample["residue_idx"][sel]
        assert (np.diff(idx) > 0).all()  # strictly increasing, gaps allowed


def test_missing_chain_raises(pdb_text):
    with pytest.raises(KeyError, match="chain 'X'"):
        antibody.from_chains(parse_pdb(pdb_text), "X", None, [])


def test_reconstruct_backbone_roundtrip(complex_):
    """Frames derived from a real backbone reconstruct N/CA/C near the
    originals (ideal-geometry deviation only); O is psi-dependent and only
    approximately placed."""
    from diffab_pytorch_tpu.structure import reconstruct_backbone

    rot = complex_.backbone_orientations()
    ca = complex_.xyz[:, 1]
    xyz, mask = reconstruct_backbone(rot, ca)
    assert xyz.shape == (complex_.n_residues, 15, 3)
    assert mask[:, :4].all() and not mask[:, 4:].any()

    valid = complex_.atom_mask[:, :3].all(-1)
    np.testing.assert_allclose(xyz[valid, 1], ca[valid], atol=1e-5)  # CA exact
    # N and C directionally exact; distance off only by bond-length deviation
    for slot in (0, 2):
        d = np.linalg.norm(xyz[valid, slot] - complex_.xyz[valid, slot], axis=-1)
        assert d.max() < 0.75, f"slot {slot}: {d.max()}"
    # reconstructed frames from reconstructed atoms match the inputs
    from diffab_pytorch_tpu.structure import geometry

    rot2, ok = geometry.backbone_orientations(xyz, mask)
    np.testing.assert_allclose(rot2[valid], rot[valid], atol=1e-4)
