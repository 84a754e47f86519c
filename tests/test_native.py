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
