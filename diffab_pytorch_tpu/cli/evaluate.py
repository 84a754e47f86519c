"""Evaluation CLI: designed PDBs vs the native complex -> design metrics.

Closes the design loop the reference never had (its README stops at
training; evaluation was left to the DiffAb paper's private tooling):

  cli.preprocess  PDB -> patch
  cli.sample      patch + checkpoint -> design_*.pdb + designs.fasta
  cli.evaluate    designs + native patch -> AAR / RMSD / diversity   <- here

Per design: amino-acid recovery over the designed CDR positions, CA RMSD
in the native frame (the design's context is written back in native
coordinates, so no alignment is needed), and context-aligned RMSD (Kabsch
fit on the fixed residues — guards against any global drift).  Across
designs: mean/std of each metric plus pairwise sequence diversity.

Output: a human-readable table and optionally --json for machines.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

from diffab_pytorch_tpu.constants import ATOM, CDR, CDR_NAMES
from diffab_pytorch_tpu.data.dataset import generation_mask_from_cdr
from diffab_pytorch_tpu.structure.patch import load_patch
from diffab_pytorch_tpu.structure.pdb import parse_pdb_file


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--native-patch", required=True,
                   help="Preprocessed .npz patch of the native complex "
                        "(the cli.sample input)")
    p.add_argument("--designs", required=True,
                   help="Directory of design_*.pdb files (cli.sample "
                        "output) or a glob pattern")
    p.add_argument("--cdrs", nargs="+", default=["H3"],
                   help="CDRs that were designed (must match cli.sample)")
    p.add_argument("--json", default=None, help="Also write metrics JSON here")
    p.add_argument("--scores", default=None,
                   help="scores.json written by `cli.sample --rank` "
                        "(default: auto-detect next to the designs).  When "
                        "present, each design row carries its model score "
                        "and the aggregate reports how well the oracle-free "
                        "ranking tracked ground truth (Spearman rho, "
                        "top-1-by-score RMSD vs the best-of-n oracle).")
    return p.parse_args(argv)


def _design_arrays(path: str, n_expected: int):
    """Flatten a design PDB back into patch-ordered arrays.

    cli.sample writes residues in patch row order (masked rows only), so
    file order IS patch order; resseq/chain stay available as a guard."""
    chains = parse_pdb_file(path)
    seq, xyz, amask, resnums = [], [], [], []
    for chain_id, residues in chains.items():
        for r in residues:
            seq.append(r.aa_index)
            xyz.append(r.xyz)
            amask.append(r.atom_mask)
            resnums.append(r.resseq)
    if len(seq) != n_expected:
        raise ValueError(
            f"{path}: {len(seq)} residues, native patch has {n_expected}"
        )
    return (
        np.array(seq),
        np.array(xyz, np.float32),
        np.array(amask, bool),
        np.array(resnums),
    )


def main(argv=None) -> int:
    args = parse_args(argv)
    bad = set(args.cdrs) - set(CDR_NAMES)
    if bad:
        print(f"unknown CDRs {sorted(bad)}", file=sys.stderr)
        return 2

    native = load_patch(args.native_patch)
    res_mask = native["residue_mask"].astype(bool)
    gen_full = (
        generation_mask_from_cdr(native["cdr_idx"], args.cdrs) & res_mask
    )
    # design PDBs contain only the valid (masked) rows, in patch order
    gen = gen_full[res_mask]
    ctx = ~gen
    native_seq = native["seq_idx"][res_mask]
    native_ca = native["xyz"][res_mask, ATOM.CA, :].astype(np.float32)
    native_resnums = native["residue_number"][res_mask]
    n_rows = int(res_mask.sum())

    pattern = (
        os.path.join(args.designs, "design_*.pdb")
        if os.path.isdir(args.designs)
        else args.designs
    )
    paths = sorted(glob.glob(pattern))
    if not paths:
        print(f"no designs match {pattern}", file=sys.stderr)
        return 1

    from diffab_pytorch_tpu.evaluation import (
        aligned_ca_rmsd,
        amino_acid_recovery,
        backbone_validity,
        ca_rmsd,
        sequence_diversity,
    )

    chain_idx = native["chain_idx"][res_mask]
    residue_idx = native["residue_idx"][res_mask]

    rows = []
    seqs = []
    for path in paths:
        seq, xyz, amask, resnums = _design_arrays(path, n_rows)
        if not np.array_equal(resnums, native_resnums):
            raise ValueError(
                f"{path}: residue numbering differs from the native patch"
            )
        ca = xyz[:, ATOM.CA, :]
        # stereochemistry gate: peptide bonds / CA continuity across the
        # designed loop + anchors, CA clashes vs context (PDB coords are
        # already in angstroms).  Rows missing backbone N or C (possible in
        # native context) drop out of the edge set rather than fake-violate.
        has_bb = amask[:, ATOM.N] & amask[:, ATOM.CA] & amask[:, ATOM.C]
        val = backbone_validity(
            xyz[None, :, ATOM.N, :], ca[None], xyz[None, :, ATOM.C, :],
            has_bb[None], chain_idx[None], residue_idx[None], gen[None],
        )
        m = {
            "design": os.path.basename(path),
            "aar": float(
                amino_acid_recovery(seq[None], native_seq[None], gen[None])[0]
            ),
            "ca_rmsd": float(ca_rmsd(ca[None], native_ca[None], gen[None])[0]),
            "ca_rmsd_aligned": float(
                aligned_ca_rmsd(
                    ca[None], native_ca[None], gen[None], ctx[None]
                )[0]
            ),
            "bond_viol": int(val["bond_viol"][0]),
            "bond_max_dev": float(val["bond_max_dev"][0]),
            "ca_break": int(val["ca_break"][0]),
            "clash_count": int(val["clash_count"][0]),
            "valid": bool(val["valid"][0]),
        }
        rows.append(m)
        seqs.append(seq)

    diversity = float(
        sequence_diversity(np.stack(seqs), gen)
    ) if len(seqs) > 1 else 0.0

    # model scores from `cli.sample --rank`: how well did the oracle-free
    # ranking track ground truth on this target?
    scores_path = args.scores
    if scores_path is None and os.path.isdir(args.designs):
        cand = os.path.join(args.designs, "scores.json")
        scores_path = cand if os.path.exists(cand) else None
    rank_agg = {}
    if scores_path:
        with open(scores_path) as fh:
            score_map = json.load(fh)
        matched = [
            m for m in rows
            if os.path.splitext(m["design"])[0] in score_map
        ]
        for m in matched:
            m["model_score"] = float(
                score_map[os.path.splitext(m["design"])[0]]["score"]
            )
        if len(matched) > 1:
            from diffab_pytorch_tpu.evaluation import spearman_corr

            sc = np.array([m["model_score"] for m in matched])
            rm = np.array([m["ca_rmsd"] for m in matched])
            rank_agg = {
                "rank_spearman": float(spearman_corr(sc, rm)),
                "ca_rmsd_top1_by_score": float(rm[sc.argmin()]),
                "ca_rmsd_best_of_n": float(rm.min()),
                "aar_top1_by_score": float(
                    matched[int(sc.argmin())]["aar"]
                ),
            }

    print(f"{'design':<20s} {'AAR':>6s} {'RMSD(A)':>8s} {'alnRMSD':>8s} "
          f"{'valid':>6s}")
    for m in rows:
        flag = "ok" if m["valid"] else (
            f"b{m['bond_viol']}/c{m['ca_break']}/x{m['clash_count']}"
        )
        print(f"{m['design']:<20s} {m['aar']:>6.3f} "
              f"{m['ca_rmsd']:>8.3f} {m['ca_rmsd_aligned']:>8.3f} {flag:>6s}")
    agg = {
        "n_designs": len(rows),
        "cdrs": args.cdrs,
        "aar_mean": float(np.mean([m["aar"] for m in rows])),
        "aar_std": float(np.std([m["aar"] for m in rows])),
        "ca_rmsd_mean": float(np.mean([m["ca_rmsd"] for m in rows])),
        "ca_rmsd_std": float(np.std([m["ca_rmsd"] for m in rows])),
        "ca_rmsd_aligned_mean": float(
            np.mean([m["ca_rmsd_aligned"] for m in rows])
        ),
        "diversity": diversity,
        "valid_rate": float(np.mean([m["valid"] for m in rows])),
        "bond_viol_rate": float(np.mean([m["bond_viol"] > 0 for m in rows])),
        "clash_rate": float(np.mean([m["clash_count"] > 0 for m in rows])),
        **rank_agg,
    }
    print(f"{'mean':<20s} {agg['aar_mean']:>6.3f} {agg['ca_rmsd_mean']:>8.3f} "
          f"{agg['ca_rmsd_aligned_mean']:>8.3f}   diversity={diversity:.3f} "
          f"valid={agg['valid_rate']:.2f}")
    if rank_agg:
        print(f"[evaluate] ranking: rho={rank_agg['rank_spearman']:+.2f}  "
              f"top1-by-score {rank_agg['ca_rmsd_top1_by_score']:.3f} A "
              f"vs oracle best-of-n {rank_agg['ca_rmsd_best_of_n']:.3f} A")

    if args.json:
        with open(args.json, "w") as fh:
            json.dump({"designs": rows, "aggregate": agg}, fh, indent=2)
        print(f"[evaluate] wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
