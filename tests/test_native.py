"""Native C++ parser: parity with the pure-Python reference parser.

Skipped where the toolchain/library is unavailable (the Python parser is
always the fallback)."""

import numpy as np
import pytest

from diffab_pytorch_tpu.structure import native, pdb
from diffab_pytorch_tpu.structure.testing import make_synthetic_antibody_pdb

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _assert_chains_equal(a, b):
    assert set(a) == set(b)
    for ch in a:
        assert len(a[ch]) == len(b[ch]), ch
        for ra, rb in zip(a[ch], b[ch]):
            assert (ra.resseq, ra.icode, ra.resname) == (rb.resseq, rb.icode, rb.resname)
            np.testing.assert_array_equal(ra.atom_mask, rb.atom_mask)
            np.testing.assert_allclose(ra.xyz, rb.xyz, atol=1e-4)


def test_parity_on_synthetic_complexes():
    for seed in range(3):
        text = make_synthetic_antibody_pdb(seed=seed)
        _assert_chains_equal(
            native.parse_pdb_native(text), pdb.parse_pdb(text, prefer_native=False)
        )


def test_parity_on_edge_cases():
    # altloc B skipped, MSE -> MET with SE -> SD, unknown residue -> UNK
    # backbone, ENDMDL stops, junk lines ignored, missing-CA residue dropped
    text = "\n".join([
        "REMARK junk",
        "ATOM      1  N   ALA A   1      11.104   6.134  -6.504  1.00  0.00           N",
        "ATOM      2  CA  ALA A   1      12.000   6.000  -6.000  1.00  0.00           C",
        "ATOM      3  CA BALA A   1      99.000  99.000  99.000  1.00  0.00           C",
        "ATOM      4  C   ALA A   1      13.000   6.500  -5.500  1.00  0.00           C",
        "HETATM    5  N   MSE A   2      14.000   7.000  -5.000  1.00  0.00           N",
        "HETATM    6  CA  MSE A   2      15.000   7.500  -4.500  1.00  0.00           C",
        "HETATM    7 SE   MSE A   2      16.000   8.000  -4.000  1.00  0.00          SE",
        "ATOM      8  N   XYZ A   3      17.000   8.500  -3.500  1.00  0.00           N",
        "ATOM      9  CA  XYZ A   3      18.000   9.000  -3.000  1.00  0.00           C",
        "ATOM     10  N   GLY A   4      19.000   9.500  -2.500  1.00  0.00           N",
        "ENDMDL",
        "ATOM     11  CA  TRP B   9      20.000  10.000  -2.000  1.00  0.00           C",
        "END",
    ]) + "\n"
    got_native = native.parse_pdb_native(text)
    got_python = pdb.parse_pdb(text, prefer_native=False)
    _assert_chains_equal(got_native, got_python)
    # semantic spot checks
    a = got_python["A"]
    assert [r.resname for r in a] == ["ALA", "MET", "UNK"]  # GLY 4 has no CA
    assert a[0].xyz[1, 0] == pytest.approx(12.0)  # altloc A kept, B skipped
    assert a[1].atom_mask[6]  # MSE SE landed in MET's SD slot
    assert "B" not in got_python  # after ENDMDL


def test_native_speedup_or_at_least_works():
    import time

    text = make_synthetic_antibody_pdb(seed=0) * 3
    t0 = time.time()
    for _ in range(10):
        native.parse_pdb_native(text)
    t_native = time.time() - t0
    t0 = time.time()
    for _ in range(10):
        pdb.parse_pdb(text, prefer_native=False)
    t_python = time.time() - t0
    print(f"native {t_native*100:.1f} ms/parse vs python {t_python*100:.1f} ms/parse")
    assert t_native < t_python  # strictly faster on any real machine


class TestNativeBackboneGeometry:
    """native/featurize.cpp vs the numpy semantic reference
    (geometry.backbone_orientations / backbone_dihedrals)."""

    def _random_structure(self, seed, L=60):
        rng = np.random.default_rng(seed)
        A = 15
        xyz = rng.normal(size=(L, A, 3)).astype(np.float32) * 5
        mask = rng.random((L, A)) > 0.1
        chain = np.repeat(
            np.array([1, 2, 3], np.int32), [L // 3, L // 3, L - 2 * (L // 3)]
        )
        # peptide-bond some consecutive pairs (some just beyond the 2.5 A
        # cutoff to pin the threshold semantics)
        for i in range(L - 1):
            r = rng.random()
            if r > 0.5:
                xyz[i + 1, 0] = xyz[i, 2] + rng.normal(scale=0.3, size=3)
            elif r > 0.4:
                d = rng.normal(size=3)
                xyz[i + 1, 0] = xyz[i, 2] + 2.6 * d / np.linalg.norm(d)
        return xyz, mask, chain

    def test_parity_random_structures(self):
        from diffab_pytorch_tpu.structure import geometry, native

        if not native.available():
            pytest.skip("native library unavailable")
        for seed in range(3):
            xyz, mask, chain = self._random_structure(seed)
            out = native.backbone_geometry_native(xyz, mask, chain)
            assert out is not None
            rot_n, dih_n, dmask_n = out
            rot_p, _ = geometry.backbone_orientations(xyz, mask)
            dih_p, dmask_p = geometry.backbone_dihedrals(xyz, mask, chain)
            np.testing.assert_allclose(rot_n, rot_p, atol=1e-5)
            np.testing.assert_allclose(dih_n, dih_p, atol=1e-5)
            np.testing.assert_array_equal(dmask_n, dmask_p)

    def test_dispatcher_and_fallback_agree(self):
        """backbone_geometry (the production path used by featurize_patch)
        equals the pure-numpy fallback."""
        from diffab_pytorch_tpu.structure import geometry

        xyz, mask, chain = self._random_structure(7)
        rot_a, dih_a, m_a = geometry.backbone_geometry(xyz, mask, chain)
        rot_b, dih_b, m_b = geometry.backbone_geometry(
            xyz, mask, chain, prefer_native=False
        )
        np.testing.assert_allclose(rot_a, rot_b, atol=1e-5)
        np.testing.assert_allclose(dih_a, dih_b, atol=1e-5)
        np.testing.assert_array_equal(m_a, m_b)

    def test_featurize_patch_parity_on_real_fixture(self):
        """End-to-end: a featurized patch is identical (within f32) whether
        the native or the numpy geometry produced it."""
        import os

        from diffab_pytorch_tpu.structure import antibody, native
        from diffab_pytorch_tpu.structure.patch import featurize_patch

        if not native.available():
            pytest.skip("native library unavailable")
        fixture = os.path.join(
            os.path.dirname(__file__), "fixtures", "ab1_chothia.pdb"
        )
        c = antibody.from_pdb(fixture, "H", "L", ["A"], keep_fv_only=True)
        import unittest.mock as mock

        s_native = featurize_patch(c, patch_size=128)
        with mock.patch.object(
            native, "backbone_geometry_native", lambda *a, **k: None
        ):
            s_numpy = featurize_patch(c, patch_size=128)
        for k in s_native:
            if s_native[k].dtype.kind == "f":
                np.testing.assert_allclose(
                    s_native[k], s_numpy[k], atol=1e-5, err_msg=k
                )
            else:
                np.testing.assert_array_equal(s_native[k], s_numpy[k], err_msg=k)
