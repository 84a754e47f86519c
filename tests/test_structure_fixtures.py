"""Structure layer vs a curated real-format Chothia antibody fixture.

The reference validated its structure stack on real PDBs through protstruc
(tests/test_modules.py:274,334 fetch 1REX over the network); this air-gapped
environment cannot, so tests/fixtures/ab1_chothia.pdb packs the parser-
hostile quirks of real SAbDab chothia files — insertion-coded H3 (100A-K),
altloc A/B pairs and a B-only atom, HETATM MSE, missing backbone atoms, a
second MODEL, ANISOU/TER noise — into plausible helix geometry (generator:
tests/fixtures/gen_fixture_ab1.py).  These tests pin CDR residue counts,
anchor positions, Fv trim boundaries, icode/altloc/MSE handling, and
native-vs-python parser parity on that file.
"""

import os

import numpy as np
import pytest

from diffab_pytorch_tpu.constants import AA, CDR
from diffab_pytorch_tpu.structure import antibody, native, patch
from diffab_pytorch_tpu.structure.pdb import parse_pdb

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "ab1_chothia.pdb")


@pytest.fixture(scope="module")
def text():
    with open(FIXTURE) as f:
        return f.read()


@pytest.fixture(scope="module")
def chains(text):
    return parse_pdb(text, prefer_native=False)


@pytest.fixture(scope="module")
def complex_(chains):
    return antibody.from_chains(chains, "H", "L", ["A"])


@pytest.fixture(scope="module")
def complex_fv(chains):
    return antibody.from_chains(chains, "H", "L", ["A"], keep_fv_only=True)


def _h_sel(c):
    return np.asarray(c.chain_idx) == 1


class TestParser:
    def test_residue_counts(self, chains):
        # H: 1..100 + 100A-K (11) + 101..118 = 129, minus resseq 80 (no CA)
        assert len(chains["H"]) == 128
        # L: 1..95 + 95A-C + 96..110 = 113
        assert len(chains["L"]) == 113
        assert len(chains["A"]) == 30

    def test_second_model_ignored(self, chains):
        # model 2 repeats residue (1, ' ') per chain shifted +200 A; if it
        # were parsed it would append a duplicate residue with a far-away CA
        firsts = [r for r in chains["H"] if (r.resseq, r.icode) == (1, " ")]
        assert len(firsts) == 1
        assert np.linalg.norm(firsts[0].xyz[1]) < 10.0

    def test_insertion_codes_preserved_in_order(self, chains):
        keys = [(r.resseq, r.icode) for r in chains["H"]]
        i = keys.index((100, " "))
        assert keys[i : i + 12] == [(100, " ")] + [
            (100, ic) for ic in "ABCDEFGHIJK"
        ]

    def test_altloc_A_wins_for_AB_pairs(self, chains):
        r31 = next(r for r in chains["H"] if (r.resseq, r.icode) == (31, " "))
        r30 = next(r for r in chains["H"] if (r.resseq, r.icode) == (30, " "))
        # helix geometry: consecutive CA ~3.8 A apart; the altloc-B CA is
        # shifted +(0.9, -0.3, 0.5) from A, so if B had won the distance
        # signature would differ by ~1 A
        d = np.linalg.norm(r31.xyz[1] - r30.xyz[1])
        assert 3.0 < d < 4.5

    def test_altloc_B_only_atom_retained(self, chains):
        r60 = next(r for r in chains["H"] if (r.resseq, r.icode) == (60, " "))
        assert r60.atom_mask[4]  # CB slot

    def test_mse_becomes_met_with_sd(self, chains):
        r35 = next(r for r in chains["H"] if (r.resseq, r.icode) == (35, " "))
        assert r35.resname == "MET"
        assert r35.aa_index == int(AA.MET)
        assert r35.atom_mask[6]  # SD slot (from the SE atom)

    def test_missing_backbone_O_is_mask_hole(self, chains):
        r75 = next(r for r in chains["H"] if (r.resseq, r.icode) == (75, " "))
        assert not r75.atom_mask[3]
        assert r75.atom_mask[1]

    def test_missing_CA_residue_dropped(self, chains):
        assert all((r.resseq, r.icode) != (80, " ") for r in chains["H"])

    def test_native_parser_parity_on_fixture(self, text, chains):
        if not native.available():
            pytest.skip("native parser library unavailable")
        got = native.parse_pdb_native(text)
        assert got is not None
        assert sorted(got) == sorted(chains)
        for ch in chains:
            assert len(got[ch]) == len(chains[ch])
            for a, b in zip(got[ch], chains[ch]):
                assert (a.resseq, a.icode, a.resname) == (
                    b.resseq, b.icode, b.resname
                )
                np.testing.assert_array_equal(a.atom_mask, b.atom_mask)
                np.testing.assert_allclose(a.xyz, b.xyz, atol=1e-4)


class TestChothiaCDRs:
    def test_h3_count_includes_insertion_codes(self, complex_):
        h3 = complex_.cdr_idx == int(CDR.H3)
        # 95..100 (6) + 100A-K (11) + 101,102 (2)
        assert int(h3.sum()) == 19
        nums = complex_.residue_number[h3]
        assert nums.min() == 95 and nums.max() == 102

    def test_h1_h2_counts(self, complex_):
        assert int((complex_.cdr_idx == int(CDR.H1)).sum()) == 7  # 26-32
        assert int((complex_.cdr_idx == int(CDR.H2)).sum()) == 5  # 52-56

    def test_light_cdr_counts(self, complex_):
        assert int((complex_.cdr_idx == int(CDR.L1)).sum()) == 11  # 24-34
        assert int((complex_.cdr_idx == int(CDR.L2)).sum()) == 7  # 50-56
        # L3 89-97 with 95A-C: 7 + 3 + 2
        assert int((complex_.cdr_idx == int(CDR.L3)).sum()) == 12

    def test_anchor_positions(self, complex_):
        h = _h_sel(complex_)
        anchors_h = set(complex_.residue_number[complex_.anchor_mask & h])
        assert anchors_h == {25, 33, 51, 57, 94, 103}
        lsel = np.asarray(complex_.chain_idx) == 2
        anchors_l = set(complex_.residue_number[complex_.anchor_mask & lsel])
        assert anchors_l == {23, 35, 49, 57, 88, 98}

    def test_antigen_mask(self, complex_):
        assert int(complex_.get_antigen_mask().sum()) == 30

    def test_fv_trim_boundaries(self, complex_, complex_fv):
        h_full = int(_h_sel(complex_).sum())
        h_fv = int(_h_sel(complex_fv).sum())
        assert h_full == 128 and h_fv == 123  # drops 114-118
        assert complex_fv.residue_number[_h_sel(complex_fv)].max() == 113
        lsel = np.asarray(complex_fv.chain_idx) == 2
        assert int(lsel.sum()) == 110  # drops 108-110
        assert complex_fv.residue_number[lsel].max() == 107
        # CDR content unaffected by the trim
        assert int((complex_fv.cdr_idx == int(CDR.H3)).sum()) == 19

    def test_residue_idx_sequential_across_icodes(self, complex_):
        h = _h_sel(complex_)
        ridx = complex_.residue_idx[h]
        np.testing.assert_array_equal(ridx, np.arange(len(ridx)))


class TestGeometryOnFixture:
    def test_helix_dihedrals_consistent(self, complex_fv):
        (dihedrals, mask) = complex_fv.backbone_dihedrals()
        h = _h_sel(complex_fv)
        # mid-helix residues: phi/psi defined and near-constant
        phi = dihedrals[h][5:20, 0]
        psi = dihedrals[h][5:20, 1]
        assert np.all(mask[h][5:20, :2])
        assert np.all(np.isfinite(phi)) and np.all(np.isfinite(psi))
        assert float(np.std(phi)) < 0.2 and float(np.std(psi)) < 0.2

    def test_frames_orthonormal(self, complex_fv):
        rot = complex_fv.backbone_orientations()
        eye = np.eye(3)
        rr = np.einsum("lij,lkj->lik", rot, rot)
        valid = complex_fv.atom_mask[:, :3].all(axis=1)
        np.testing.assert_allclose(rr[valid], np.tile(eye, (int(valid.sum()), 1, 1)),
                                   atol=1e-4)


class TestPatchOnFixture:
    def test_patch_keeps_all_cdrs(self, complex_fv):
        mask = patch.extract_patch_mask(complex_fv, k=128)
        assert int(mask.sum()) <= 128 + int((complex_fv.cdr_idx > 0).sum())
        # every CDR residue survives patch extraction (DESIGN.md §2 #13)
        assert bool(np.all(mask[complex_fv.cdr_idx > 0]))

    def test_featurize_patch_shapes(self, complex_fv):
        sample = patch.featurize_patch(complex_fv, patch_size=128)
        assert sample["xyz"].shape[0] == 128
        assert (sample["cdr_idx"] > 0).any()
        assert sample["residue_mask"].any()
        assert np.isfinite(sample["xyz"][sample["atom_mask"] > 0]).all()


FIXTURE2 = os.path.join(os.path.dirname(__file__), "fixtures", "ab2_hostile.pdb")


@pytest.fixture(scope="module")
def text2():
    with open(FIXTURE2) as f:
        return f.read()


@pytest.fixture(scope="module")
def chains2(text2):
    return parse_pdb(text2, prefer_native=False)


class TestHostileFixture2:
    """Second hostile fixture (round-1 VERDICT next #7): pathologies ab1
    does not cover — split/duplicated chain blocks, lowercase chain ids,
    negative residue numbers, non-MSE HETATM residues, waters/ligands
    under a protein chain id, a CA-only chain."""

    def test_split_chain_blocks_merge_in_order(self, chains2):
        # H appears as residues 1-50, then L, then H 51-118: one chain,
        # file order, 117 residues (PCA residue 20 dropped)
        nums = [r.resseq for r in chains2["H"]]
        assert nums == sorted(nums)
        assert len(nums) == 117
        assert nums[0] == 1 and nums[-1] == 118

    def test_unknown_resname_becomes_backbone_only_unk(self, chains2):
        from diffab_pytorch_tpu.constants import AA

        (r10,) = [r for r in chains2["H"] if r.resseq == 10]
        assert r10.resname == "UNK"
        assert r10.aa_index == int(AA.UNK)
        # backbone kept, the CB record has no slot for UNK
        assert list(np.nonzero(r10.atom_mask)[0]) == [0, 1, 2, 3]

    def test_non_mse_hetatm_residue_dropped(self, chains2):
        # PCA (pyroglutamate) is NOT whitelisted like MSE: residue 20 gone
        assert all(r.resseq != 20 for r in chains2["H"])

    def test_lowercase_chain_with_negative_numbers(self, chains2):
        assert "a" in chains2
        nums = [r.resseq for r in chains2["a"]]
        assert nums[:5] == [-3, -2, -1, 0, 1]
        assert len(nums) == 29

    def test_waters_and_ligands_ignored(self, chains2):
        # HOH (resseq 200-202) and NAG (301) under chain a must not appear
        assert all(r.resseq < 200 for r in chains2["a"])

    def test_ca_only_chain_survives(self, chains2):
        assert len(chains2["B"]) == 20
        for r in chains2["B"]:
            assert list(np.nonzero(r.atom_mask)[0]) == [1]  # CA only

    def test_native_parser_parity_on_fixture2(self, text2, chains2):
        if not native.available():
            pytest.skip("native parser library unavailable")
        got = native.parse_pdb_native(text2)
        assert got is not None
        assert sorted(got) == sorted(chains2)
        for ch in chains2:
            assert len(got[ch]) == len(chains2[ch])
            for a, b in zip(got[ch], chains2[ch]):
                assert (a.resseq, a.icode, a.resname) == (
                    b.resseq, b.icode, b.resname
                )
                np.testing.assert_array_equal(a.atom_mask, b.atom_mask)
                np.testing.assert_allclose(a.xyz, b.xyz, atol=1e-4)


class TestWriteParseRoundTrip:
    """write_pdb -> parse_pdb is the identity on parsed content, for every
    fixture (round-1 VERDICT next #7).  The designed-output round trip is
    covered end-to-end by the sample-CLI tests re-parsing design PDBs."""

    @pytest.mark.parametrize("fixture_file", ["ab1_chothia.pdb",
                                              "ab2_hostile.pdb"])
    def test_roundtrip(self, fixture_file, tmp_path):
        from diffab_pytorch_tpu.structure.pdb import (
            parse_pdb_file, write_pdb,
        )

        path = os.path.join(os.path.dirname(__file__), "fixtures",
                            fixture_file)
        chains = parse_pdb_file(path, prefer_native=False)

        xyz, amask, seq, chain_ids, nums, icodes = [], [], [], [], [], []
        for ch, residues in chains.items():
            for r in residues:
                xyz.append(r.xyz)
                amask.append(r.atom_mask)
                seq.append(r.aa_index)
                chain_ids.append(ch)
                nums.append(r.resseq)
                icodes.append(ord(r.icode))
        out = str(tmp_path / "rt.pdb")
        write_pdb(out, np.array(xyz), np.array(amask), np.array(seq),
                  chain_ids, np.array(nums), np.array(icodes))

        back = parse_pdb_file(out, prefer_native=False)
        assert sorted(back) == sorted(chains)
        for ch in chains:
            assert len(back[ch]) == len(chains[ch]), ch
            for a, b in zip(back[ch], chains[ch]):
                assert (a.resseq, a.icode) == (b.resseq, b.icode)
                assert a.aa_index == b.aa_index
                # UNK re-parses backbone-only; otherwise masks round-trip
                np.testing.assert_array_equal(a.atom_mask, b.atom_mask)
                sel = a.atom_mask
                np.testing.assert_allclose(a.xyz[sel], b.xyz[sel], atol=2e-3)
