"""Global constants: amino-acid vocabulary, atom ordering, CDR definitions.

TPU-native re-design of the reference's scattered constants:
  - AA enum / UNK fill value      (reference: protstruc.general.AA, used at
                                   diffab_pytorch/diffab_pytorch.py:115,273)
  - ATOM enum with CA == 1        (reference: protstruc.general.ATOM; CA_IDX=1
                                   hardcoded at diffab_pytorch/diffab_pytorch.py:110,249)
  - unified vocab size 21         (reference is inconsistent: 21 in diffusion.py:47,
                                   21 with a "why 22?" TODO at diffab_pytorch.py:60,193,
                                   25 at diffab_pytorch.py:514 — we unify on 21,
                                   see SURVEY.md §2.9#8)
  - Chothia CDR ranges            (reference delegates to protstruc.get_cdr_mask,
                                   data.py:93; ranges re-derived from the Chothia
                                   numbering scheme definitions)
"""

from __future__ import annotations

import enum

# ---------------------------------------------------------------------------
# Amino acids. 20 standard + UNK. Index order: alphabetical by 3-letter code
# (ALA, ARG, ASN, ASP, CYS, GLN, GLU, GLY, HIS, ILE, LEU, LYS, MET, PHE, PRO,
#  SER, THR, TRP, TYR, VAL), UNK last. Vocabulary size is 21 everywhere.
# ---------------------------------------------------------------------------

AA_VOCAB_SIZE = 21

THREE_TO_ONE = {
    "ALA": "A", "ARG": "R", "ASN": "N", "ASP": "D", "CYS": "C",
    "GLN": "Q", "GLU": "E", "GLY": "G", "HIS": "H", "ILE": "I",
    "LEU": "L", "LYS": "K", "MET": "M", "PHE": "F", "PRO": "P",
    "SER": "S", "THR": "T", "TRP": "W", "TYR": "Y", "VAL": "V",
}

AA_THREE = list(THREE_TO_ONE.keys())  # canonical index order, 0..19
AA_INDEX = {name: i for i, name in enumerate(AA_THREE)}
AA_ONE_INDEX = {THREE_TO_ONE[k]: i for i, k in enumerate(AA_THREE)}


class AA(enum.IntEnum):
    ALA = 0
    ARG = 1
    ASN = 2
    ASP = 3
    CYS = 4
    GLN = 5
    GLU = 6
    GLY = 7
    HIS = 8
    ILE = 9
    LEU = 10
    LYS = 11
    MET = 12
    PHE = 13
    PRO = 14
    SER = 15
    THR = 16
    TRP = 17
    TYR = 18
    VAL = 19
    UNK = 20


# ---------------------------------------------------------------------------
# Atoms. Backbone order N, CA, C, O (matching the reference's ATOM enum with
# CA == 1), then CB, then side-chain heavy atoms in PDB-canonical order.
# Up to MAX_N_ATOMS_PER_RESIDUE = 15 slots per residue (the reference model
# default n_atoms=15, diffab_pytorch.py:641; TRP has the most heavy atoms: 14).
# ---------------------------------------------------------------------------

MAX_N_ATOMS_PER_RESIDUE = 15


class ATOM(enum.IntEnum):
    N = 0
    CA = 1
    C = 2
    O = 3
    CB = 4


# Per-residue heavy-atom name lists in our canonical slot order. Slot i of
# residue r holds atom RESIDUE_ATOMS[r][i]; missing slots are mask=0.
RESIDUE_ATOMS = {
    "ALA": ["N", "CA", "C", "O", "CB"],
    "ARG": ["N", "CA", "C", "O", "CB", "CG", "CD", "NE", "CZ", "NH1", "NH2"],
    "ASN": ["N", "CA", "C", "O", "CB", "CG", "OD1", "ND2"],
    "ASP": ["N", "CA", "C", "O", "CB", "CG", "OD1", "OD2"],
    "CYS": ["N", "CA", "C", "O", "CB", "SG"],
    "GLN": ["N", "CA", "C", "O", "CB", "CG", "CD", "OE1", "NE2"],
    "GLU": ["N", "CA", "C", "O", "CB", "CG", "CD", "OE1", "OE2"],
    "GLY": ["N", "CA", "C", "O"],
    "HIS": ["N", "CA", "C", "O", "CB", "CG", "ND1", "CD2", "CE1", "NE2"],
    "ILE": ["N", "CA", "C", "O", "CB", "CG1", "CG2", "CD1"],
    "LEU": ["N", "CA", "C", "O", "CB", "CG", "CD1", "CD2"],
    "LYS": ["N", "CA", "C", "O", "CB", "CG", "CD", "CE", "NZ"],
    "MET": ["N", "CA", "C", "O", "CB", "CG", "SD", "CE"],
    "PHE": ["N", "CA", "C", "O", "CB", "CG", "CD1", "CD2", "CE1", "CE2", "CZ"],
    "PRO": ["N", "CA", "C", "O", "CB", "CG", "CD"],
    "SER": ["N", "CA", "C", "O", "CB", "OG"],
    "THR": ["N", "CA", "C", "O", "CB", "OG1", "CG2"],
    "TRP": ["N", "CA", "C", "O", "CB", "CG", "CD1", "CD2", "NE1", "CE2",
            "CE3", "CZ2", "CZ3", "CH2"],
    "TYR": ["N", "CA", "C", "O", "CB", "CG", "CD1", "CD2", "CE1", "CE2",
            "CZ", "OH"],
    "VAL": ["N", "CA", "C", "O", "CB", "CG1", "CG2"],
}

# ---------------------------------------------------------------------------
# Chothia CDR definitions (inclusive residue-number ranges in Chothia
# numbering, as used by the SAbDab 'chothia' PDB snapshot the reference trains
# on, README.md:25-40). The reference consumes these via
# protstruc.get_cdr_mask(subset=...) (data.py:93) and
# get_cdr_anchor_mask() (preprocess_pdb.py:45).
# ---------------------------------------------------------------------------

CDR_NAMES = ["H1", "H2", "H3", "L1", "L2", "L3"]


class CDR(enum.IntEnum):
    """Per-residue CDR label. 0 = framework/antigen (not a CDR)."""
    NONE = 0
    H1 = 1
    H2 = 2
    H3 = 3
    L1 = 4
    L2 = 5
    L3 = 6


# Chothia CDR loop boundaries (chain, start, end) — inclusive, insertion codes
# included.
CHOTHIA_CDR_RANGES = {
    "H1": (26, 32),
    "H2": (52, 56),
    "H3": (95, 102),
    "L1": (24, 34),
    "L2": (50, 56),
    "L3": (89, 97),
}

# Fv region upper bounds in Chothia numbering (keep_fv_only trimming,
# reference preprocess_pdb.py:37).
FV_MAX_RESNUM = {"H": 113, "L": 107}

# Chain-index convention: 0 is reserved for padding (the reference uses
# nn.Embedding(10, d, padding_idx=0) at diffab_pytorch.py:65), so real chains
# are numbered from 1: heavy=1, light=2, antigen chains 3, 4, ...
MAX_N_CHAINS = 10
HEAVY_CHAIN_IDX = 1
LIGHT_CHAIN_IDX = 2
FIRST_ANTIGEN_CHAIN_IDX = 3
