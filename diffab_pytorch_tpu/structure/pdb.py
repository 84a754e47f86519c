"""Minimal, dependency-free PDB ATOM-record parser (host-side, numpy).

Part of the structure layer replacing the reference's external `protstruc`
dependency (SURVEY.md §2.7: AntibodyStructureBatch.from_pdb at data.py:68-73
and preprocess_pdb.py:32-38 delegate all PDB I/O to protstruc).  Offline
preprocessing is CPU work — the TPU never sees a PDB file, only the fixed-
shape .npz patches this layer produces.

Parsing rules:
  * ATOM records only, plus HETATM MSE (selenomethionine -> MET, standard).
  * First model only (stop at ENDMDL).
  * Alternate locations: first occurrence per (residue, atom) wins — keeps
    altloc A for ordinary A/B pairs (A precedes B in deposited files) and,
    unlike a strict ' '/'A' filter, retains atoms that exist ONLY as
    altloc B (real SAbDab files have such residues).
  * Unknown residue names -> AA.UNK with backbone-only atoms.
  * Insertion codes preserved; residues keyed by (resseq, icode) in file
    order.

Pinned against curated Chothia-format fixtures with insertion-coded H3
loops, altlocs, HETATM MSE, and multi-model records in
tests/test_structure_fixtures.py.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import numpy as np

from diffab_pytorch_tpu.constants import (
    AA_INDEX,
    AA,
    MAX_N_ATOMS_PER_RESIDUE,
    RESIDUE_ATOMS,
)

# slot lookup: resname -> {atom_name: slot}
_ATOM_SLOT = {
    res: {name: i for i, name in enumerate(atoms)}
    for res, atoms in RESIDUE_ATOMS.items()
}
_BACKBONE_SLOT = {"N": 0, "CA": 1, "C": 2, "O": 3}


@dataclasses.dataclass
class Residue:
    resseq: int
    icode: str
    resname: str
    xyz: np.ndarray  # (A, 3) float32
    atom_mask: np.ndarray  # (A,) bool

    @property
    def aa_index(self) -> int:
        return AA_INDEX.get(self.resname, int(AA.UNK))


def parse_pdb(text: str, prefer_native: bool = True) -> Dict[str, List[Residue]]:
    """Parse PDB text into {chain_id: [Residue, ...]} in file order.

    Uses the native C++ parser (structure/native.py) when its library is
    available and prefer_native is set; this function remains the semantic
    reference and the fallback."""
    if prefer_native:
        from diffab_pytorch_tpu.structure import native

        parsed = native.parse_pdb_native(text)
        if parsed is not None:
            return parsed
    chains: Dict[str, List[Residue]] = {}
    current: Dict[str, tuple] = {}  # chain -> (resseq, icode)
    buffers: Dict[str, Residue] = {}

    def flush(chain_id: str):
        if chain_id in buffers:
            chains.setdefault(chain_id, []).append(buffers.pop(chain_id))

    for line in text.splitlines():
        rec = line[:6]
        if rec == "ENDMDL":
            break
        is_atom = rec == "ATOM  "
        is_mse = rec == "HETATM" and line[17:20] == "MSE"
        if not (is_atom or is_mse):
            continue
        # altloc: no filter — the first occurrence of each (residue, atom)
        # wins below, which keeps A for A/B pairs and retains B-only atoms
        atom_name = line[12:16].strip()
        resname = line[17:20].strip()
        if is_mse:
            resname = "MET"
            if atom_name == "SE":
                atom_name = "SD"
        chain_id = line[21]
        try:
            resseq = int(line[22:26])
            x = float(line[30:38])
            y = float(line[38:46])
            z = float(line[46:54])
        except ValueError:
            continue
        icode = line[26]

        key = (resseq, icode)
        if current.get(chain_id) != key:
            flush(chain_id)
            current[chain_id] = key
            buffers[chain_id] = Residue(
                resseq=resseq,
                icode=icode,
                resname=resname if resname in RESIDUE_ATOMS else "UNK",
                xyz=np.zeros((MAX_N_ATOMS_PER_RESIDUE, 3), np.float32),
                atom_mask=np.zeros(MAX_N_ATOMS_PER_RESIDUE, bool),
            )

        res = buffers[chain_id]
        slots = _ATOM_SLOT.get(res.resname, _BACKBONE_SLOT)
        slot = slots.get(atom_name)
        if slot is None and res.resname == "UNK":
            slot = _BACKBONE_SLOT.get(atom_name)
        if slot is not None and not res.atom_mask[slot]:
            res.xyz[slot] = (x, y, z)
            res.atom_mask[slot] = True

    for chain_id in list(buffers):
        flush(chain_id)
    # drop residues with no CA (unusable for frames/patching)
    for chain_id in chains:
        chains[chain_id] = [r for r in chains[chain_id] if r.atom_mask[1]]
    return chains


def parse_pdb_file(
    path: str, prefer_native: bool = True
) -> Dict[str, List[Residue]]:
    with open(path) as f:
        return parse_pdb(f.read(), prefer_native=prefer_native)


def write_pdb(
    path: str,
    xyz: np.ndarray,  # (L, A, 3)
    atom_mask: np.ndarray,  # (L, A)
    seq_idx: np.ndarray,  # (L,)
    chain_ids: List[str],  # per residue
    residue_numbers: np.ndarray,  # (L,)
    icodes: np.ndarray | None = None,  # (L,) uint8 char codes (or None)
) -> None:
    """Write designed structures back out as a PDB (round-trip surface for
    downstream tools).  Only slots with atom_mask set are emitted.
    Insertion codes are preserved so Chothia-numbered loops (100A-K in a
    long H3) round-trip without residues collapsing on re-parse."""
    from diffab_pytorch_tpu.constants import AA_THREE

    def coord(v: float) -> str:
        # PDB coordinate fields are 8 columns wide; extreme values (e.g.
        # designs from an untrained model) must not overflow and corrupt
        # the fixed-column layout — degrade precision until it fits
        for dec in (3, 2, 1, 0):
            s = f"{v:8.{dec}f}"
            if len(s) == 8:
                return s
        return f"{max(min(v, 9.9e7), -9.9e6):8.0f}"

    lines = []
    serial = 1
    for i in range(xyz.shape[0]):
        resname = AA_THREE[int(seq_idx[i])] if int(seq_idx[i]) < 20 else "UNK"
        atom_names = RESIDUE_ATOMS.get(resname, ["N", "CA", "C", "O"])
        ic = " "
        if icodes is not None and int(icodes[i]) not in (0, ord(" ")):
            ic = chr(int(icodes[i]))
        for a, name in enumerate(atom_names):
            if a >= atom_mask.shape[1] or not atom_mask[i, a]:
                continue
            x, y, z = (coord(float(v)) for v in xyz[i, a])
            element = name[0]
            name4 = f" {name:<3s}" if len(name) < 4 else name
            lines.append(
                f"ATOM  {serial:5d} {name4} {resname:>3s} {chain_ids[i]}"
                f"{int(residue_numbers[i]):4d}{ic}   "
                f"{x}{y}{z}{1.0:6.2f}{0.0:6.2f}"
                f"          {element:>2s}"
            )
            serial += 1
    lines.append("END")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
