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
import zlib

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


# ---------------------------------------------------------------------------
# Compositional corpus (round-1 VERDICT weak #5): the family corpus above maps
# whole barcodes to whole motifs — a lookup table a 2.5 M-param model can
# memorize, so held-out-instance AAR of 1.0 cannot distinguish learning from
# memorization.  Here the mapping is COMPOSITIONAL:
#
#   * the barcode is a tuple of N_SLOTS independent slots, each taking one of
#     n_values values; slot j is expressed in its OWN framework positions
#     (3 consecutive barcode residues), identity a function of (slot value,
#     position) only;
#   * H3 position k's residue identity is a function of slot (k mod N_SLOTS)'s
#     value alone — a local rule a model can learn per (position, slot value)
#     pair and APPLY to slot-value combinations it never saw;
#   * the H3 loop conformation is a linear mixture of per-slot displacement
#     fields (fixed direction per slot, amplitude set by the slot's value),
#     kept smooth along the loop so native stereochemistry survives.
#
# Training sees a subset of the n_values**N_SLOTS combinations (covering every
# (slot, value) pair); evaluation on HELD-OUT combinations is then chance-level
# for a barcode memorizer but high for a model that learned the per-slot rule.

N_SLOTS = 4
# flattened barcode framework positions, 3 per slot (within 88-94 + 103-109)
_SLOT_POSITIONS = [
    (88, 89, 90), (91, 92, 93), (103, 104, 105), (106, 107, 108),
]

# Decoupled-shape variant (round 4): a SECOND, independent barcode whose
# slots drive the loop CONFORMATIONS while the original slots drive only
# the SEQUENCES.  On the default (tied) corpus, loop shape is a linear
# function of the same slots as sequence, so a self-conditioned model can
# read the slot values off its own conditioned geometry instead of the
# framework barcode — the hypothesized mechanism behind the multi-loop
# sc/AAR saturation at ~0.90 (QUALITY.md round-3 schedule matrix; r3
# VERDICT weak #4 asked for exactly this attribution experiment).  With
# decouple_shape, conditioned geometry carries ZERO information about the
# sequence rule, so if the saturation is a corpus artifact it must vanish.
# Shape slots sit in their own framework positions (57-68, flanking the
# H2 anchor — inside every multi-CDR patch) so conformation stays
# predictable from visible context.
_SHAPE_SLOT_POSITIONS = [
    (57, 58, 59), (60, 61, 62), (63, 64, 65), (66, 67, 68),
]

# Multi-CDR extension (round 2): the same 4 slots can drive H1 and H2 as
# well, for JOINT compositional design across three loops (Chothia heavy
# ranges, constants.CHOTHIA_CDR_RANGES).  Each loop has its own sequence
# offset (distinct motifs per loop), its own fan phase (distinct
# conformation directions), and its own bump amplitudes (shorter loops
# get gentler displacements so stereochemistry survives).  The default
# cdr_loops=("H3",) reproduces the original corpus byte-for-byte.
CDR_LOOP_RANGES = {"H1": (26, 32), "H2": (52, 56), "H3": (95, 102)}
_LOOP_SEQ_OFFSET = {"H1": 2, "H2": 4, "H3": 1}
_LOOP_PHASE = {"H1": 0.9, "H2": 1.9, "H3": 0.0}
_LOOP_BUMP = {"H1": (0.6, 0.35), "H2": (0.6, 0.35)}  # H3 uses the args


def all_combos(n_values: int) -> list[tuple[int, ...]]:
    """Every slot-value combination, lexicographic."""
    combos = [()]
    for _ in range(N_SLOTS):
        combos = [c + (v,) for c in combos for v in range(n_values)]
    return combos


# Sequence degeneracy (round 3): with seq_degeneracy = d > 1, every loop
# position admits d equally-valid residues per slot value (option g shifts
# the identity by 9g; 9 is coprime to 20 so options are distinct for
# d <= 4) and each INSTANCE draws its options at random.  The conformation
# depends only on the slots, so all options are equally correct — on this
# corpus a calibrated model should SAMPLE across options (diversity > 0)
# while staying inside the valid set, which makes mode collapse
# distinguishable from correct confidence (round-2 VERDICT weak #7: on the
# unique-answer corpus, measured diversity 0.000-0.019 IS the optimum, so
# the old protocol could not tell the two apart).
_DEGENERACY_SHIFT = 9


def loop_motif_index_options(
    combo: tuple[int, ...], loop: str, degeneracy: int
) -> list[list[int]]:
    """Valid amino-acid indices (model vocabulary, 0..19) per loop
    position — the evaluation ground truth for valid-set AAR / option
    coverage on a degenerate corpus."""
    lo, hi = CDR_LOOP_RANGES[loop]
    off = _LOOP_SEQ_OFFSET[loop]
    return [
        [
            (combo[k % N_SLOTS] * 7 + 3 * k + off + _DEGENERACY_SHIFT * g) % 20
            for g in range(degeneracy)
        ]
        for k in range(hi - lo + 1)
    ]


def combo_loop_motif(
    combo: tuple[int, ...], loop: str = "H3",
    choices: list[int] | None = None,
) -> list[str]:
    """Loop position k depends ONLY on slot k mod N_SLOTS: the
    per-position local rule that makes generalization measurable.  Each
    loop has a distinct additive offset so its motifs differ.  `choices`
    (per-position option indices) selects among the degenerate options;
    None = option 0 everywhere (the unique-answer corpus)."""
    lo, hi = CDR_LOOP_RANGES[loop]
    off = _LOOP_SEQ_OFFSET[loop]
    n = hi - lo + 1
    if choices is None:
        choices = [0] * n
    return [
        _aa(combo[k % N_SLOTS] * 7 + 3 * k + off
            + _DEGENERACY_SHIFT * choices[k])
        for k in range(n)
    ]


def combo_h3_motif(combo: tuple[int, ...]) -> list[str]:
    return combo_loop_motif(combo, "H3")


def _heavy_sequence_combo(
    resnums: list[int], combo: tuple[int, ...],
    cdr_loops: tuple[str, ...] = ("H3",),
    loop_choices: dict[str, list[int]] | None = None,
    shape_combo: tuple[int, ...] | None = None,
) -> list[str]:
    seq = []
    loop_of_pos = {
        r: (loop, r - CDR_LOOP_RANGES[loop][0])
        for loop in cdr_loops
        for r in range(CDR_LOOP_RANGES[loop][0],
                       CDR_LOOP_RANGES[loop][1] + 1)
    }
    slot_of_pos = {
        p: (j, i)
        for j, positions in enumerate(_SLOT_POSITIONS)
        for i, p in enumerate(positions)
    }
    shape_slot_of_pos = (
        {}
        if shape_combo is None
        else {
            p: (j, i)
            for j, positions in enumerate(_SHAPE_SLOT_POSITIONS)
            for i, p in enumerate(positions)
        }
    )
    for r in resnums:
        if r in loop_of_pos:
            loop, k = loop_of_pos[r]
            ch = None if loop_choices is None else loop_choices.get(loop)
            seq.append(combo_loop_motif(combo, loop, choices=ch)[k])
        elif r in slot_of_pos:
            j, i = slot_of_pos[r]
            seq.append(_aa(combo[j] * 7 + 5 + 4 * i + j))  # slot-value code
        elif r in shape_slot_of_pos:
            j, i = shape_slot_of_pos[r]
            # shape-slot value code (distinct offset from the seq slots)
            seq.append(_aa(shape_combo[j] * 7 + 2 + 4 * i + 3 * j))
        else:
            seq.append(_aa(3 * r))  # shared framework
    return seq


def _repair_peptide_bonds(residues: list[Residue]) -> None:
    """Snap every N(i+1) onto the ideal 1.329 A peptide bond along the
    existing C(i)->N(i+1) direction.  Displacement fields and per-atom
    jitter stretch inter-residue bonds (the intra-residue geometry rides
    rigidly); this repair keeps the corpus stereochemically valid under the
    evaluation gate (backbone_validity) without shrinking the
    conformational signal — the N moves by at most the local distortion
    (<0.7 A), directions and CA positions are untouched."""
    for a, b in zip(residues, residues[1:]):
        if b.resnum - a.resnum != 1:
            continue
        c, n = a.atoms.get("C"), b.atoms.get("N")
        if c is None or n is None:
            continue
        d = n - c
        norm = float(np.linalg.norm(d))
        if norm > 1e-6:
            b.atoms["N"] = c + d * (1.329 / norm)


def make_combo_pdb(
    combo: tuple[int, ...],
    seed: int,
    heavy_len: int = 118,
    light_len: int = 107,
    antigen_len: int = 60,
    bump_base: float = 1.0,
    bump_step: float = 0.6,
    jitter: float = 0.1,
    cdr_loops: tuple[str, ...] = ("H3",),
    seq_degeneracy: int = 1,
    shape_combo: tuple[int, ...] | None = None,
) -> str:
    """One synthetic complex for the given slot-value combination.  With
    cdr_loops beyond H3, the listed loops' sequences AND conformations are
    slot-driven too (joint multi-CDR compositional design).
    seq_degeneracy > 1 draws each loop position's residue uniformly among
    its d valid options (loop_motif_index_options); the default 1 consumes
    no extra randomness, so existing corpora reproduce byte-for-byte.
    shape_combo (round 4): drive the loop CONFORMATIONS from this second
    barcode (expressed at _SHAPE_SLOT_POSITIONS) instead of `combo` — the
    decoupled-shape variant; None keeps the tied corpus byte-for-byte."""
    if not 1 <= seq_degeneracy <= 4:
        raise ValueError("seq_degeneracy must be in [1, 4] (option shifts "
                         "stay distinct mod 20)")
    rng = np.random.default_rng(
        (hash(combo) & 0x7FFFFFFF) * 2_000_003 + seed
    )
    loop_choices = None
    if seq_degeneracy > 1:
        loop_choices = {
            loop: rng.integers(
                0, seq_degeneracy,
                size=CDR_LOOP_RANGES[loop][1] - CDR_LOOP_RANGES[loop][0] + 1,
            ).tolist()
            for loop in cdr_loops
        }

    h_res, h_ca = _chain_residues(
        list(range(1, heavy_len + 1)),
        origin=np.zeros(3), direction=np.array([1.0, 0.2, 0.0]),
        perp=np.array([0.0, 0.0, 1.0]), rng=rng,
        sequence=_heavy_sequence_combo(
            list(range(1, heavy_len + 1)), combo, tuple(cdr_loops),
            loop_choices=loop_choices, shape_combo=shape_combo,
        ),
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

    # compositional conformation: a smooth sine-profile displacement whose
    # direction/amplitude is the MEAN of per-slot contributions (direction
    # fixed per slot, amplitude affine in the slot's value) — linear in the
    # slots, so an unseen combination's loop is the predictable mixture of
    # contributions seen during training.  Each requested loop gets its own
    # mixture: the fan rotates by the loop's phase and shorter loops use
    # gentler amplitudes (_LOOP_BUMP).
    for loop in cdr_loops:
        lo, hi = CDR_LOOP_RANGES[loop]
        base, step = _LOOP_BUMP.get(loop, (bump_base, bump_step))
        phase = _LOOP_PHASE[loop]
        mix = np.zeros(3)
        for j, v in enumerate(shape_combo if shape_combo is not None
                              else combo):
            # directions form a 150-degree fan in the y-z plane (NOT a full
            # circle: with opposed directions, equal slot values would cancel
            # to a zero displacement and distinct combos would collapse onto
            # one conformation)
            phi = (j / max(N_SLOTS - 1, 1) - 0.5) * (5.0 * np.pi / 6.0) + phase
            u = np.array([0.0, np.cos(phi), np.sin(phi)])
            mix = mix + (base + step * v) * u
        mix = mix / N_SLOTS
        for res in h_res:
            if lo <= res.resnum <= hi:
                w = np.sin(np.pi * (res.resnum - lo + 0.5) / (hi - lo + 1))
                shift = w * mix
                for name in res.atoms:
                    res.atoms[name] = res.atoms[name] + shift

    rot = _random_rotation(rng)
    for residues in (h_res, l_res, a_res):
        _transform(residues, rot, jitter, rng)
        _repair_peptide_bonds(residues)

    return format_pdb([("H", h_res), ("L", l_res), ("A", a_res)])


def split_combos(
    n_values: int, n_train: int, n_heldout: int, seed: int = 0
) -> tuple[list[tuple[int, ...]], list[tuple[int, ...]]]:
    """Random train/held-out combination split with full (slot, value)
    coverage in train (otherwise held-out combos would be unanswerable by
    construction, not by failure to generalize)."""
    combos = all_combos(n_values)
    rng = np.random.default_rng(seed)
    for _ in range(1000):
        order = rng.permutation(len(combos))
        train = [combos[i] for i in order[:n_train]]
        heldout = [combos[i] for i in order[n_train:n_train + n_heldout]]
        seen = {(j, v) for c in train for j, v in enumerate(c)}
        if len(seen) == N_SLOTS * n_values:
            return train, heldout
    raise RuntimeError(
        f"could not cover all {N_SLOTS}x{n_values} (slot, value) pairs "
        f"with {n_train} train combos"
    )


def write_combo_corpus(
    out_dir: str,
    n_values: int = 4,
    n_train_combos: int = 40,
    n_heldout_combos: int = 12,
    n_per_combo: int = 12,
    n_val_instances: int = 2,
    seed: int = 0,
    cdr_loops: tuple[str, ...] = ("H3",),
    seq_degeneracy: int = 1,
    decouple_shape: bool = False,
    **pdb_kwargs,
) -> dict:
    """Write the compositional corpus + split manifest.

    {out_dir}/pdb/c{idx}_s{i}.pdb for train combos (i < n_per_combo; the
    last n_val_instances of each are the held-out-INSTANCE split) and
    h{idx}_s{i}.pdb for held-out combos (i < n_val_instances — the
    held-out-COMBINATION split, never trained on).  Returns the manifest
    (also saved as {out_dir}/combos.json).

    decouple_shape (round 4): every instance draws an INDEPENDENT uniform
    shape barcode that drives the loop conformations (expressed at its own
    framework positions), so loop shape carries zero information about the
    sequence rule — the attribution experiment for the multi-loop
    sc/AAR saturation (see _SHAPE_SLOT_POSITIONS)."""
    import json

    pdb_dir = os.path.join(out_dir, "pdb")
    os.makedirs(pdb_dir, exist_ok=True)
    train, heldout = split_combos(
        n_values, n_train_combos, n_heldout_combos, seed=seed
    )
    shape_rng = np.random.default_rng(seed * 7 + 13)
    draw_shape = (
        (lambda: tuple(int(v) for v in
                       shape_rng.integers(0, n_values, N_SLOTS)))
        if decouple_shape else (lambda: None)
    )
    rows = ["pdb_id,Hchain,Lchain,antigen_chain"]
    for idx, combo in enumerate(train):
        for i in range(n_per_combo):
            pdb_id = f"c{idx}_s{i}"
            with open(os.path.join(pdb_dir, f"{pdb_id}.pdb"), "w") as fh:
                fh.write(make_combo_pdb(combo, seed * 1_000 + i,
                                        cdr_loops=cdr_loops,
                                        seq_degeneracy=seq_degeneracy,
                                        shape_combo=draw_shape(),
                                        **pdb_kwargs))
            rows.append(f"{pdb_id},H,L,A")
    for idx, combo in enumerate(heldout):
        for i in range(n_val_instances):
            pdb_id = f"h{idx}_s{i}"
            with open(os.path.join(pdb_dir, f"{pdb_id}.pdb"), "w") as fh:
                fh.write(make_combo_pdb(combo, seed * 1_000 + 500 + i,
                                        cdr_loops=cdr_loops,
                                        seq_degeneracy=seq_degeneracy,
                                        shape_combo=draw_shape(),
                                        **pdb_kwargs))
            rows.append(f"{pdb_id},H,L,A")
    with open(os.path.join(out_dir, "meta.csv"), "w") as fh:
        fh.write("\n".join(rows) + "\n")
    manifest = {
        "n_values": n_values,
        "n_slots": N_SLOTS,
        "cdr_loops": list(cdr_loops),
        "seq_degeneracy": seq_degeneracy,
        "decouple_shape": decouple_shape,
        "train_combos": [list(c) for c in train],
        "heldout_combos": [list(c) for c in heldout],
        "n_per_combo": n_per_combo,
        "n_val_instances": n_val_instances,
    }
    with open(os.path.join(out_dir, "combos.json"), "w") as fh:
        json.dump(manifest, fh, indent=2)
    return manifest


def _fv_unit_chains(
    rng: np.random.Generator,
    heavy_id: str | None,
    light_id: str | None,
    antigen_ids: list[str],
    combo: tuple[int, ...] | None,
    heavy_len: int = 118,
    light_len: int = 107,
    jitter: float = 0.1,
    bump_base: float = 1.0,
    bump_step: float = 0.6,
) -> list[tuple[str, list[Residue]]]:
    """One Fv unit (heavy and/or light + its antigen chains) as
    (chain_id, residues) pairs in a unit-local pose: the building block of
    the SAbDab-inventory-shaped corpus below.  Geometry and the
    compositional H3 rule follow make_combo_pdb; what varies here is the
    CHAIN COMPOSITION — absent heavy (light-only rows), absent light
    (nanobody rows), 1-5 antigen chains of varying length — matching the
    real meta.csv row being synthesized."""
    chains: list[tuple[str, list[Residue]]] = []
    anchor_ca = None
    if heavy_id is not None:
        resnums = list(range(1, heavy_len + 1))
        seq = (
            _heavy_sequence_combo(resnums, combo, ("H3",))
            if combo is not None
            else [_aa(3 * r) for r in resnums]
        )
        h_res, h_ca = _chain_residues(
            resnums, origin=np.zeros(3),
            direction=np.array([1.0, 0.2, 0.0]),
            perp=np.array([0.0, 0.0, 1.0]), rng=rng, sequence=seq,
        )
        if combo is not None:
            # compositional H3 conformation (the make_combo_pdb mixture)
            lo, hi = CDR_LOOP_RANGES["H3"]
            mix = np.zeros(3)
            for j, v in enumerate(combo):
                phi = (j / max(N_SLOTS - 1, 1) - 0.5) * (5.0 * np.pi / 6.0)
                u = np.array([0.0, np.cos(phi), np.sin(phi)])
                mix = mix + (bump_base + bump_step * v) * u
            mix = mix / N_SLOTS
            for res in h_res:
                if lo <= res.resnum <= hi:
                    w = np.sin(np.pi * (res.resnum - lo + 0.5)
                               / (hi - lo + 1))
                    for name in res.atoms:
                        res.atoms[name] = res.atoms[name] + w * mix
        chains.append((heavy_id, h_res))
        anchor_ca = h_ca[94:102].mean(axis=0)
    if light_id is not None:
        resnums = list(range(1, light_len + 1))
        l_res, l_ca = _chain_residues(
            resnums, origin=np.array([0.0, 14.0, 4.0]),
            direction=np.array([1.0, -0.2, 0.1]),
            perp=np.array([0.0, 0.0, 1.0]), rng=rng,
            sequence=_light_sequence(resnums),
        )
        chains.append((light_id, l_res))
        if anchor_ca is None:
            # light-only rows: antigens dock near the L3 loop instead
            anchor_ca = l_ca[88:97].mean(axis=0)
    for j, ag_id in enumerate(antigen_ids):
        ag_len = int(rng.integers(40, 91))
        resnums = list(range(1, ag_len + 1))
        # fan the antigen chains around the docking site so multi-chain
        # antigens stay distinct but all remain in patch range
        phi = 2.0 * np.pi * j / max(len(antigen_ids), 1)
        side = np.array([0.0, -8.0 - 6.0 * np.cos(phi), 6.0 + 5.0 * np.sin(phi)])
        a_res, _ = _chain_residues(
            resnums, origin=anchor_ca + side,
            direction=np.array([-1.0, 0.3, 0.2 + 0.15 * j]),
            perp=np.array([0.2, 0.0, 1.0]), rng=rng,
            sequence=_antigen_sequence(resnums),
        )
        chains.append((ag_id, a_res))
    # one pose + thermal jitter per unit, bonds repaired afterwards
    rot = _random_rotation(rng)
    for _, residues in chains:
        _transform(residues, rot, jitter, rng)
        _repair_peptide_bonds(residues)
    return chains


def write_meta_shaped_corpus(
    out_dir: str,
    meta_path: str,
    n_values: int = 4,
    n_train_combos: int = 40,
    n_heldout_combos: int = 12,
    n_heldout_targets: int = 24,
    seed: int = 0,
    limit: int | None = None,
) -> dict:
    """Synthesize a corpus with the EXACT inventory shape of a SAbDab
    meta.csv (reference data/meta.csv: 8,400 rows over 4,413 PDB files)
    — the round-5 dress rehearsal for real data (round-4 VERDICT #1).

    One PDB file per unique pdb_id containing every row's chains under
    their real chain ids (multi-Fv files up to 16 rows, multi-chain
    antigens up to 5, 'nan' heavy/light rows preserved); a meta.csv in the
    reference's column format ('a | b' antigen joins, empty = nan) drives
    `cli.preprocess --meta` over all rows exactly as the reference's
    snakemake fan-out would (preprocess.smk:9-21 semantics).

    The learnable signal is the compositional barcode rule of
    write_combo_corpus, assigned one combo per Fv row: training rows draw
    from the train-combo set, and `n_heldout_targets` single-row PDBs are
    reserved as the held-out-COMBINATION eval split (their combos never
    appear in training).  Returns (and writes) a manifest mapping each
    row's npz stem to its combo and split."""
    import json

    import pandas as pd

    meta = pd.read_csv(meta_path)
    meta = meta[["pdb_id", "Hchain", "Lchain", "antigen_chain"]]
    if limit is not None:
        meta = meta.iloc[:limit]
    train_combos, heldout_combos = split_combos(
        n_values, n_train_combos, n_heldout_combos, seed=seed
    )
    rng = np.random.default_rng(seed * 9_000_017 + 5)

    def _chain(v):
        s = "" if v is None or (isinstance(v, float) and np.isnan(v)) \
            else str(v).strip()
        return s or None

    # held-out targets: single-row pdbs WITH a heavy chain (the rule is
    # expressed in H3, so heavy-less rows cannot carry an eval combo)
    counts = meta.groupby("pdb_id").size()
    single = [
        p for p in counts[counts == 1].index
        if _chain(meta[meta.pdb_id == p].iloc[0].Hchain) is not None
    ]
    heldout_pdbs = set(
        rng.permutation(sorted(single))[:n_heldout_targets].tolist()
    )

    pdb_dir = os.path.join(out_dir, "pdb")
    os.makedirs(pdb_dir, exist_ok=True)
    manifest_rows = {}
    n_files = 0
    ho_cycle = 0
    for pdb_id, grp in meta.groupby("pdb_id", sort=True):
        units = []
        for rec in grp.itertuples():
            heavy, light = _chain(rec.Hchain), _chain(rec.Lchain)
            ag_raw = _chain(rec.antigen_chain)
            antigens = (
                [c.strip() for c in ag_raw.split("|")] if ag_raw else []
            )
            if heavy is None:
                combo = None
            elif pdb_id in heldout_pdbs:
                combo = heldout_combos[ho_cycle % len(heldout_combos)]
                ho_cycle += 1
            else:
                combo = train_combos[int(rng.integers(len(train_combos)))]
            stem = "_".join([
                str(pdb_id), heavy or "na", light or "na",
                "".join(antigens) or "na",
            ])
            manifest_rows[stem] = {
                "pdb_id": str(pdb_id),
                "combo": list(combo) if combo is not None else None,
                "split": ("heldout" if pdb_id in heldout_pdbs else
                          "train" if combo is not None else "no_heavy"),
            }
            units.append((heavy, light, antigens, combo))
        # crc32, not hash(): str hashing is salted per process
        # (PYTHONHASHSEED), and the corpus must reproduce across runs
        unit_rng = np.random.default_rng(
            (zlib.crc32(str(pdb_id).encode()) & 0x7FFFFFFF) * 3_000_161
            + seed
        )
        chains: list[tuple[str, list[Residue]]] = []
        seen_ids: set[str] = set()
        for u, (heavy, light, antigens, combo) in enumerate(units):
            unit = _fv_unit_chains(unit_rng, heavy, light, antigens, combo)
            # spread the units apart so patches never mix Fv units
            off = np.array([95.0 * u, 23.0 * (u % 3), 40.0 * (u // 3)])
            for cid, residues in unit:
                if cid in seen_ids:
                    continue  # shared antigen chain: first definition wins
                seen_ids.add(cid)
                for res in residues:
                    for name in res.atoms:
                        res.atoms[name] = res.atoms[name] + off
                chains.append((cid, residues))
        with open(os.path.join(pdb_dir, f"{pdb_id}.pdb"), "w") as fh:
            fh.write(format_pdb(chains))
        n_files += 1

    # reference-format meta.csv (the exact columns cli.preprocess reads)
    out_rows = ["pdb_id,Hchain,Lchain,antigen_chain"]
    for rec in meta.itertuples():
        heavy, light = _chain(rec.Hchain), _chain(rec.Lchain)
        ag = _chain(rec.antigen_chain) or ""
        out_rows.append(
            f"{rec.pdb_id},{heavy or ''},{light or ''},{ag}"
        )
    with open(os.path.join(out_dir, "meta.csv"), "w") as fh:
        fh.write("\n".join(out_rows) + "\n")

    manifest = {
        "meta_path": meta_path,
        "n_rows": int(len(meta)),
        "n_pdb_files": n_files,
        "n_values": n_values,
        "train_combos": [list(c) for c in train_combos],
        "heldout_combos": [list(c) for c in heldout_combos],
        "heldout_pdbs": sorted(heldout_pdbs),
        "rows": manifest_rows,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2)
    return manifest


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
