"""Generator for ab1_chothia.pdb — a curated Chothia-format antibody
fixture (checked in; this script records its provenance and lets it be
regenerated deterministically).

The fixture mimics the format reality of SAbDab chothia-renumbered files
that the reference exercised through protstruc on real PDBs
(reference tests/test_modules.py:274,334 fetch 1REX) but this repo's
air-gapped environment cannot fetch.  It packs every parser-hostile quirk
observed in real deposited antibody files into ~160 residues of plausible
(ideal-helix) backbone geometry:

  chain H (heavy, Chothia 1-118):
    * H3 loop with insertion codes 100A..100K (long CDR-H3, like 2fb4/5dmg)
    * residue 31: altloc A/B pairs for CA and CB (A first; A must win)
    * residue 60: side-chain CB present ONLY as altloc B (must be kept)
    * residue 35: selenomethionine as HETATM MSE with an SE atom (-> MET/SD)
    * residue 75: missing backbone O (mask hole)
    * residue 80: missing CA (residue must be dropped)
    * residues 114-118: constant-region stub beyond the Fv boundary (113)
    * OXT on the final residue (no slot -> ignored)
  chain L (light, Chothia 1-110):
    * L3 insertion codes 95A..95C
    * residues 108-110 beyond the Fv boundary (107)
  chain A (antigen, 1-30): plain helix
  file level:
    * HEADER/REMARK/SEQRES noise, ANISOU records, TER records
    * MODEL 1 / ENDMDL / MODEL 2: the second model is shifted +200 A and
      must be ignored (first-model-only rule)

Run:  python gen_fixture_ab1.py > ab1_chothia.pdb
"""

import math
import sys

import numpy as np

AA20 = [
    "ALA", "ARG", "ASN", "ASP", "CYS", "GLN", "GLU", "GLY", "HIS", "ILE",
    "LEU", "LYS", "MET", "PHE", "PRO", "SER", "THR", "TRP", "TYR", "VAL",
]


def helix_backbone(n, origin, rng):
    """Ideal alpha-helix N/CA/C/O/CB coordinates (bond lengths ~correct,
    (phi, psi) ~ (-57, -47)): standard parametric construction."""
    res = []
    r_ca, rise, turn = 2.30, 1.50, math.radians(100.0)
    for i in range(n):
        t = turn * i

        def at(dt, dz, r=r_ca):
            return np.array(
                [r * math.cos(t + dt), r * math.sin(t + dt), rise * i + dz]
            )

        ca = at(0.0, 0.0)
        n_at = at(math.radians(-28.1), -0.85, r=1.75)
        c_at = at(math.radians(26.3), 0.86, r=1.95)
        # carbonyl O: offset from C roughly opposite the next N
        o_at = c_at + np.array([0.0, 0.0, -1.0]) * 0.4 + (c_at - ca) * 0.55
        # CB: tetrahedral-ish offset out of the backbone plane
        b1 = ca - n_at
        b2 = ca - c_at
        perp = np.cross(b1, b2)
        cb = ca + 0.58 * (b1 + b2) + 0.55 * perp / (np.linalg.norm(perp) + 1e-9)
        res.append(
            {
                "N": n_at + origin,
                "CA": ca + origin,
                "C": c_at + origin,
                "O": o_at + origin,
                "CB": cb + origin,
            }
        )
    return res


def fmt_atom(serial, name, resname, chain, resseq, icode, xyz, altloc=" ",
             occ=1.00, bfac=20.00, element=None, record="ATOM  "):
    element = element or name[0]
    name4 = f" {name:<3s}" if len(name) < 4 else name
    x, y, z = (float(v) for v in xyz)
    return (
        f"{record}{serial:5d} {name4}{altloc}{resname:>3s} {chain}"
        f"{resseq:4d}{icode}   {x:8.3f}{y:8.3f}{z:8.3f}{occ:6.2f}{bfac:6.2f}"
        f"          {element:>2s}"
    )


def main(out=sys.stdout):
    rng = np.random.default_rng(7)
    lines = [
        "HEADER    IMMUNE SYSTEM                           01-JAN-20   AB01",
        "TITLE     CURATED CHOTHIA-FORMAT ANTIBODY FIXTURE (SYNTHETIC GEOMETRY)",
        "REMARK   2 RESOLUTION.    1.80 ANGSTROMS.",
        "SEQRES   1 H   10  GLU VAL GLN LEU VAL GLU SER GLY GLY GLY",
    ]

    # ---- chain H: Chothia numbering with H3 insertion codes ----------
    h_numbering = []
    for n in range(1, 101):
        h_numbering.append((n, " "))
    for ic in "ABCDEFGHIJK":
        h_numbering.append((100, ic))
    for n in range(101, 119):
        h_numbering.append((n, " "))

    serial = 1
    model2_atoms = []  # (name, resname, chain, resseq, icode, xyz)

    def emit_chain(chain, numbering, origin, quirks=None):
        nonlocal serial
        quirks = quirks or {}
        bb = helix_backbone(len(numbering), origin, rng)
        aa_of = {}
        for j, (resseq, icode) in enumerate(numbering):
            resname = AA20[(j * 7 + ord(chain)) % 19]  # skip VAL slot variety
            if resname == "GLY":
                resname = "SER"  # keep CB everywhere for simplicity
            key = (resseq, icode)
            aa_of[key] = resname
            atoms = [("N", bb[j]["N"]), ("CA", bb[j]["CA"]), ("C", bb[j]["C"]),
                     ("O", bb[j]["O"]), ("CB", bb[j]["CB"])]
            if quirks.get(key) == "mse":
                # selenomethionine: HETATM records, SE instead of SD
                for name, xyz in atoms:
                    lines.append(fmt_atom(serial, name, "MSE", chain, resseq,
                                          icode, xyz, record="HETATM"))
                    serial += 1
                lines.append(fmt_atom(serial, "SE", "MSE", chain, resseq,
                                      icode, bb[j]["CB"] + [1.1, 0.4, 0.2],
                                      element="SE", record="HETATM"))
                serial += 1
                continue
            for name, xyz in atoms:
                if quirks.get(key) == "no_O" and name == "O":
                    continue
                if quirks.get(key) == "no_CA" and name == "CA":
                    continue
                if quirks.get(key) == "altloc_AB" and name in ("CA", "CB"):
                    lines.append(fmt_atom(serial, name, resname, chain, resseq,
                                          icode, xyz, altloc="A", occ=0.60))
                    serial += 1
                    lines.append(fmt_atom(serial, name, resname, chain, resseq,
                                          icode, xyz + [0.9, -0.3, 0.5],
                                          altloc="B", occ=0.40))
                    serial += 1
                    continue
                if quirks.get(key) == "cb_only_B" and name == "CB":
                    lines.append(fmt_atom(serial, name, resname, chain, resseq,
                                          icode, xyz, altloc="B", occ=0.35))
                    serial += 1
                    continue
                lines.append(fmt_atom(serial, name, resname, chain, resseq,
                                      icode, xyz))
                serial += 1
                if name == "CA" and (resseq % 17) == 3:
                    # ANISOU noise right after some atoms (must be ignored)
                    lines.append(
                        f"ANISOU{serial - 1:5d}  CA  {resname:>3s} {chain}"
                        f"{resseq:4d}{icode}   2000   2000   2000      0"
                        "      0      0       C"
                    )
            if key == numbering[-1]:
                lines.append(fmt_atom(serial, "OXT", resname, chain, resseq,
                                      icode, bb[j]["O"] + [0.4, 0.4, 0.0],
                                      element="O"))
                serial += 1
        # stash a couple of atoms for the bogus second model
        j0 = 0
        model2_atoms.append(
            ("CA", aa_of[numbering[j0]], chain, numbering[j0][0],
             numbering[j0][1], bb[j0]["CA"] + 200.0)
        )
        lines.append(f"TER   {serial:5d}      {aa_of[numbering[-1]]:>3s} "
                     f"{chain}{numbering[-1][0]:4d}")
        serial += 1

    lines.append("MODEL        1")
    emit_chain(
        "H", h_numbering, np.zeros(3),
        quirks={
            (31, " "): "altloc_AB",
            (35, " "): "mse",
            (60, " "): "cb_only_B",
            (75, " "): "no_O",
            (80, " "): "no_CA",
        },
    )

    l_numbering = [(n, " ") for n in range(1, 96)]
    l_numbering += [(95, ic) for ic in "ABC"]
    l_numbering += [(n, " ") for n in range(96, 111)]
    emit_chain("L", l_numbering, np.array([28.0, 4.0, -8.0]))

    a_numbering = [(n, " ") for n in range(1, 31)]
    emit_chain("A", a_numbering, np.array([-20.0, 15.0, 10.0]))
    lines.append("ENDMDL")

    # second model: same atoms shifted far away — must be ignored
    lines.append("MODEL        2")
    for name, resname, chain, resseq, icode, xyz in model2_atoms:
        lines.append(fmt_atom(serial, name, resname, chain, resseq, icode, xyz))
        serial += 1
    lines.append("ENDMDL")
    lines.append("END")
    out.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
