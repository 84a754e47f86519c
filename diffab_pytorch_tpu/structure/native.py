"""ctypes binding for the native (C++) PDB parser.

The pure-Python parser (structure/pdb.py) is the semantic reference and
the always-available fallback; the native library accelerates the bulk
preprocessing fan-out (8,400 SAbDab complexes, SURVEY.md §2 #18).  Loading
is lazy and fault-tolerant: if the .so is absent the loader tries one
`make -C native`, and on any failure the caller silently uses Python.

Parity between the two parsers is pinned by tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional

import numpy as np

from diffab_pytorch_tpu.constants import MAX_N_ATOMS_PER_RESIDUE
from diffab_pytorch_tpu.structure.pdb import Residue

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libdiffab_native.so"))

_lib = None
_lib_checked = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(_LIB_PATH)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.diffab_parse_pdb.restype = ctypes.c_int
        lib.diffab_parse_pdb.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_char_p, ctypes.c_char_p,
        ]
        if lib.diffab_native_abi_version() != 1:
            return None
        _lib = lib
    except OSError:
        return None
    return _lib


def available() -> bool:
    return _load() is not None


def parse_pdb_native(text: str) -> Optional[Dict[str, List[Residue]]]:
    """Parse with the native library; None if it is unavailable.

    Returns the same {chain: [Residue]} structure as pdb.parse_pdb.
    """
    lib = _load()
    if lib is None:
        return None

    data = text.encode()
    a = MAX_N_ATOMS_PER_RESIDUE
    max_res = max(1024, text.count("\n") // 3 + 16)
    xyz = np.zeros((max_res, a, 3), np.float32)
    mask = np.zeros((max_res, a), np.uint8)
    seq = np.zeros(max_res, np.int32)
    resseq = np.zeros(max_res, np.int32)
    icode = ctypes.create_string_buffer(max_res)
    chain = ctypes.create_string_buffer(max_res)

    n = lib.diffab_parse_pdb(
        data, len(data), max_res,
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        seq.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        resseq.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        icode, chain,
    )
    if n < 0:
        return None  # overflow: fall back to Python

    from diffab_pytorch_tpu.constants import AA_THREE

    chains: Dict[str, List[Residue]] = {}
    chain_bytes = chain.raw[:n]
    icode_bytes = icode.raw[:n]
    for i in range(n):
        aa = int(seq[i])
        chains.setdefault(chr(chain_bytes[i]), []).append(
            Residue(
                resseq=int(resseq[i]),
                icode=chr(icode_bytes[i]),
                resname=AA_THREE[aa] if aa < 20 else "UNK",
                xyz=xyz[i].copy(),
                atom_mask=mask[i].astype(bool),
            )
        )
    return chains


def backbone_geometry_native(
    xyz: np.ndarray,  # (L, A, 3) float32
    atom_mask: np.ndarray,  # (L, A) bool
    chain_idx: np.ndarray,  # (L,) int32
):
    """Frames + backbone dihedrals via the native library; None if it (or
    the symbol — older .so builds) is unavailable.

    Returns (orientations (L, 3, 3) f32, dihedrals (L, 3) f32,
    dihedrals_mask (L, 3) bool) with the exact semantics of
    geometry.backbone_orientations / geometry.backbone_dihedrals."""
    lib = _load()
    if lib is None:
        return None
    try:
        fn = lib.diffab_backbone_geometry
    except AttributeError:
        return None  # stale .so without the featurizer — Python fallback
    fn.restype = ctypes.c_int
    L, A = atom_mask.shape
    xyz_c = np.ascontiguousarray(xyz, np.float32)
    mask_c = np.ascontiguousarray(atom_mask, np.uint8)
    chain_c = np.ascontiguousarray(chain_idx, np.int32)
    rot = np.empty((L, 3, 3), np.float32)
    dih = np.empty((L, 3), np.float32)
    dih_mask = np.empty((L, 3), np.uint8)
    rc = fn(
        xyz_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask_c.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        chain_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.c_int(L), ctypes.c_int(A),
        rot.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dih.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dih_mask.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    if rc != 0:
        return None
    return rot, dih, dih_mask.astype(bool)
