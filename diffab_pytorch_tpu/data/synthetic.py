"""Learnable synthetic antibody corpus for trained-quality evaluation.

The plain test generator (structure/testing.py) draws sequences uniformly
at random, so amino-acid recovery is information-theoretically capped at
1/20 — useless for demonstrating that TRAINING works.  This module builds a
corpus with a real sequence<->structure joint distribution the model can
learn (no real SAbDab snapshot exists in this environment; the reference
itself trains on user-downloaded PDBs, README.md:29-40):

  * F antibody FAMILIES.  Each family f has
      - a fixed CDR-H3 sequence motif (Chothia H 95-102),
      - a family "barcode" in the framework residues flanking H3
        (Chothia H 88-94 and 103-109) — visible CONTEXT that identifies
        the family, so a trained model can recover the masked H3 sequence
        far above chance;
      - a family-specific H3 loop conformation: a smooth out-of-path bump
        (direction and amplitude set by f) several angstroms wide — so
        backbone RMSD is learnable too.
  * Every sample draws an independent global SO(3) rotation (the model
    must use invariant context, not absolute coordinates) and per-atom
    Gaussian jitter (sigma ~ 0.1 A) so samples within a family differ.

Framework/light/antigen sequences are deterministic functions of position
(identical across families outside the barcode), so the ONLY route to H3
identity is the learned barcode->motif association.

Evaluation contract: a model trained on `write_family_corpus` output and
sampled on held-out members of the same families should reach AAR >> 1/20
and CA-RMSD(H3) ~ jitter scale; an untrained model sits at chance.
"""

from __future__ import annotations

import os

import numpy as np

from diffab_pytorch_tpu.constants import AA_THREE
from diffab_pytorch_tpu.structure.testing import (
    Residue,
    _chain_residues,
    format_pdb,
)

# Chothia ranges (constants.CHOTHIA_CDR_RANGES): H3 = 95..102 inclusive.
H3_RANGE = (95, 102)
BARCODE_RANGES = ((88, 94), (103, 109))


def _aa(i: int) -> str:
    return AA_THREE[i % 20]


def family_h3_motif(family: int) -> list[str]:
    """8-residue H3 motif; 7 is coprime to 20, so motifs at every position
    are distinct across families f < 20."""
    lo, hi = H3_RANGE
    return [_aa(family * 7 + 3 * k + 1) for k in range(hi - lo + 1)]


def _heavy_sequence(resnums: list[int], family: int) -> list[str]:
    seq = []
    lo, hi = H3_RANGE
    for r in resnums:
        if lo <= r <= hi:
            seq.append(family_h3_motif(family)[r - lo])
        elif any(a <= r <= b for a, b in BARCODE_RANGES):
            seq.append(_aa(family * 7 + 5 + r))  # family barcode
        else:
            seq.append(_aa(3 * r))  # shared framework
    return seq


def _light_sequence(resnums: list[int]) -> list[str]:
    return [_aa(5 * r + 2) for r in resnums]


def _antigen_sequence(resnums: list[int]) -> list[str]:
    return [_aa(11 * r + 4) for r in resnums]


def _random_rotation(rng: np.random.Generator) -> np.ndarray:
    """Uniform SO(3) rotation via QR of a Gaussian matrix."""
    q, r = np.linalg.qr(rng.normal(size=(3, 3)))
    q *= np.sign(np.diagonal(r))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


def _transform(residues: list[Residue], rot: np.ndarray,
               jitter: float, rng: np.random.Generator) -> None:
    for res in residues:
        for name, xyz in res.atoms.items():
            res.atoms[name] = xyz @ rot.T + rng.normal(scale=jitter, size=3)


def make_family_pdb(
    family: int,
    seed: int,
    n_families: int = 8,
    heavy_len: int = 118,
    light_len: int = 107,
    antigen_len: int = 60,
    bump_base: float = 1.5,
    bump_step: float = 0.35,
    jitter: float = 0.1,
) -> str:
    """One synthetic complex of the given family: chains H/L/A, Chothia
    numbering, family motif + barcode + loop bump, random global rotation,
    per-atom jitter keyed by (family, seed)."""
    rng = np.random.default_rng((family + 1) * 1_000_003 + seed)

    h_res, h_ca = _chain_residues(
        list(range(1, heavy_len + 1)),
        origin=np.zeros(3), direction=np.array([1.0, 0.2, 0.0]),
        perp=np.array([0.0, 0.0, 1.0]), rng=rng,
        sequence=_heavy_sequence(list(range(1, heavy_len + 1)), family),
    )
    l_res, _ = _chain_residues(
        list(range(1, light_len + 1)),
        origin=np.array([0.0, 14.0, 4.0]), direction=np.array([1.0, -0.2, 0.1]),
        perp=np.array([0.0, 0.0, 1.0]), rng=rng,
        sequence=_light_sequence(list(range(1, light_len + 1))),
    )
    h3_center = h_ca[94:102].mean(axis=0)
    a_res, _ = _chain_residues(
        list(range(1, antigen_len + 1)),
        origin=h3_center + np.array([0.0, -8.0, 6.0]),
        direction=np.array([-1.0, 0.3, 0.2]),
        perp=np.array([0.2, 0.0, 1.0]), rng=rng,
        sequence=_antigen_sequence(list(range(1, antigen_len + 1))),
    )

    # family-specific H3 conformation: rigid per-residue displacement with a
    # smooth sine profile, direction rotating around the chain axis with f,
    # amplitude growing with f — families end up several angstroms apart,
    # far above the jitter scale
    lo, hi = H3_RANGE
    phi = 2.0 * np.pi * family / max(n_families, 1)
    u = np.array([0.0, np.cos(phi), np.sin(phi)])
    amp = bump_base + bump_step * family
    for res in h_res:
        if lo <= res.resnum <= hi:
            w = np.sin(np.pi * (res.resnum - lo + 0.5) / (hi - lo + 1))
            shift = amp * w * u
            for name in res.atoms:
                res.atoms[name] = res.atoms[name] + shift

    rot = _random_rotation(rng)
    for residues in (h_res, l_res, a_res):
        _transform(residues, rot, jitter, rng)

    return format_pdb([("H", h_res), ("L", l_res), ("A", a_res)])


def write_family_corpus(
    out_dir: str,
    n_families: int = 8,
    n_per_family: int = 48,
    seed: int = 0,
    **pdb_kwargs,
) -> str:
    """Write {out_dir}/pdb/fam{f}_s{i}.pdb for every family/sample plus a
    reference-format meta.csv (columns pdb_id, Hchain, Lchain,
    antigen_chain — cli/preprocess.py bulk mode).  Returns the meta path."""
    pdb_dir = os.path.join(out_dir, "pdb")
    os.makedirs(pdb_dir, exist_ok=True)
    rows = ["pdb_id,Hchain,Lchain,antigen_chain"]
    for f in range(n_families):
        for i in range(n_per_family):
            pdb_id = f"fam{f}_s{i}"
            text = make_family_pdb(
                f, seed * 1_000 + i, n_families=n_families, **pdb_kwargs
            )
            with open(os.path.join(pdb_dir, f"{pdb_id}.pdb"), "w") as fh:
                fh.write(text)
            rows.append(f"{pdb_id},H,L,A")
    meta_path = os.path.join(out_dir, "meta.csv")
    with open(meta_path, "w") as fh:
        fh.write("\n".join(rows) + "\n")
    return meta_path
