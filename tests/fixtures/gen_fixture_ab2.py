"""Generator for ab2_hostile.pdb — the second parser-hostile fixture
(round-1 VERDICT missing #1 / next #7): format pathologies ab1 does not
cover, again on plausible helix geometry.

  chain H (heavy, Chothia 1-118) — SPLIT INTO TWO BLOCKS: residues 1-50
    appear first, then the entire chain L, then H 51-118.  Real deposited
    files interleave chains like this; both blocks must merge into ONE
    chain H in file order.
    * residue 10: unknown resname "XYZ" (ATOM records, full backbone+CB)
      -> parsed as UNK, backbone-only atoms kept
    * residue 20: pyroglutamate as HETATM PCA -> DROPPED entirely (only
      the MSE HETATM exception is recognized; the numbering gap stays)
  chain L (light, Chothia 1-107): plain
  chain a (ANTIGEN, LOWERCASE id, distinct from any uppercase chain):
    * negative / zero residue numbers -3..0 (expression tag), then 1..25
    * HETATM HOH waters and a NAG ligand interleaved under the same chain
      id -> ignored (no CA after HETATM filtering)
  chain B (antigen): CA-ONLY trace chain (low-resolution deposit) —
    residues must survive with CA-only masks

Run:  python gen_fixture_ab2.py > ab2_hostile.pdb
"""

import sys

import numpy as np

from gen_fixture_ab1 import AA20, fmt_atom, helix_backbone


def main(out=sys.stdout):
    rng = np.random.default_rng(11)
    lines = [
        "HEADER    IMMUNE SYSTEM                           02-JAN-20   AB02",
        "TITLE     HOSTILE-FORMAT FIXTURE 2 (SYNTHETIC GEOMETRY)",
    ]
    serial = 1

    def resname_of(chain, j):
        name = AA20[(j * 5 + ord(chain)) % 19]
        return "SER" if name == "GLY" else name

    def emit_residue(chain, resseq, icode, resname, bb, quirk=None,
                     atoms=("N", "CA", "C", "O", "CB")):
        nonlocal serial
        if quirk == "pca":
            for name in ("N", "CA", "C", "O", "CB"):
                lines.append(fmt_atom(serial, name, "PCA", chain, resseq,
                                      icode, bb[name], record="HETATM"))
                serial += 1
            return
        record_resname = "XYZ" if quirk == "unk" else resname
        for name in atoms:
            lines.append(fmt_atom(serial, name, record_resname, chain,
                                  resseq, icode, bb[name]))
            serial += 1

    # ---- chain H, block 1: residues 1-50 -----------------------------
    h_bb = helix_backbone(118, np.zeros(3), rng)
    for j in range(50):
        resseq = j + 1
        quirk = {10: "unk", 20: "pca"}.get(resseq)
        emit_residue("H", resseq, " ", resname_of("H", j), h_bb[j], quirk)

    # ---- chain L, complete -------------------------------------------
    l_bb = helix_backbone(107, np.array([28.0, 4.0, -8.0]), rng)
    for j in range(107):
        emit_residue("L", j + 1, " ", resname_of("L", j), l_bb[j])
    lines.append(f"TER   {serial:5d}      {resname_of('L', 106):>3s} L 107")
    serial += 1

    # ---- chain H, block 2: residues 51-118 (duplicate chain id) ------
    for j in range(50, 118):
        emit_residue("H", j + 1, " ", resname_of("H", j), h_bb[j])
    lines.append(f"TER   {serial:5d}      {resname_of('H', 117):>3s} H 118")
    serial += 1

    # ---- chain a (lowercase): negative resseq + waters + ligand ------
    a_bb = helix_backbone(29, np.array([-20.0, 15.0, 10.0]), rng)
    for j in range(29):
        resseq = j - 3  # -3, -2, -1, 0, 1, ... 25
        emit_residue("a", resseq, " ", resname_of("a", j), a_bb[j])
        if j == 5:
            # interleaved waters under the same chain id
            for w in range(3):
                lines.append(fmt_atom(serial, "O", "HOH", "a", 200 + w, " ",
                                      a_bb[j]["O"] + [4.0 + w, 2.0, 1.0],
                                      record="HETATM"))
                serial += 1
        if j == 10:
            # a glycan ligand: HETATM, no backbone at all
            for k, name in enumerate(["C1", "C2", "O5", "N2"]):
                lines.append(fmt_atom(serial, name, "NAG", "a", 301, " ",
                                      a_bb[j]["CB"] + [3.0, k * 1.2, 0.5],
                                      element=name[0], record="HETATM"))
                serial += 1

    # ---- chain B: CA-only trace --------------------------------------
    b_bb = helix_backbone(20, np.array([10.0, -25.0, 18.0]), rng)
    for j in range(20):
        emit_residue("B", j + 1, " ", resname_of("B", j), b_bb[j],
                     atoms=("CA",))
    lines.append("END")
    out.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
