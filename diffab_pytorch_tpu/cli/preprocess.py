"""Preprocessing CLI: PDB(s) -> fixed-shape .npz patches.

TPU-native equivalent of BOTH reference entry points:
  * `python -m diffab_pytorch.preprocess_pdb` (preprocess_pdb.py:8-25) —
    single-PDB mode via --input/--output;
  * the Snakemake fan-out over data/meta.csv (pipelines/preprocess.smk:12-30,
    README.md:36-40) — bulk mode via --meta/--data-dir/--out-dir with a
    multiprocessing pool and --keep-going semantics (bad PDBs are logged
    and skipped, the only fault-tolerance policy the reference has,
    SURVEY.md §5.3).  This bulk mode IS the pipeline — there is no
    snakemake dependency (DESIGN.md §2 #16).

meta.csv format (reference data/meta.csv): columns pdb_id, Hchain, Lchain,
antigen_chain; 'nan' chain ids mean absent (preprocess.smk:19-21); multi-
chain antigens are written 'a | b' (preprocess.smk:9-10).
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import os
import sys
import traceback

from diffab_pytorch_tpu.structure import antibody, patch


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-i", "--input", help="Path to a single input PDB file.")
    p.add_argument("-o", "--output", help="Output .npz path (single mode).")
    p.add_argument("--heavy-chain-id", default=None)
    p.add_argument("--light-chain-id", default=None)
    p.add_argument("-a", "--antigen-chain-ids", default=None,
                   help="Concatenated chain letters, e.g. 'AB'.")
    p.add_argument("-k", "--nearest-k", type=int, default=128,
                   help="Patch size (K nearest residues around CDR anchors).")
    p.add_argument("--no-fv-trim", action="store_true",
                   help="Keep full chains instead of trimming to the Fv region.")
    # bulk mode
    p.add_argument("--meta", help="meta.csv for bulk preprocessing.")
    p.add_argument("--data-dir", help="Directory of {pdb_id}.pdb files.")
    p.add_argument("--out-dir", help="Output directory for .npz patches.")
    p.add_argument("-j", "--jobs", type=int, default=os.cpu_count() or 1)
    return p.parse_args(argv)


def _norm_chain(v):
    s = "" if v is None else str(v).strip()
    return None if s.lower() in ("", "nan", "none") else s


def process_one(
    pdb_path: str,
    out_path: str,
    heavy: str | None,
    light: str | None,
    antigens: str | None,
    k: int,
    keep_fv_only: bool = True,
) -> None:
    complex_ = antibody.from_pdb(
        pdb_path,
        heavy_chain_id=_norm_chain(heavy),
        light_chain_id=_norm_chain(light),
        antigen_chain_ids=list(antigens) if antigens else (),
        keep_fv_only=keep_fv_only,
    )
    sample = patch.featurize_patch(complex_, patch_size=k)
    patch.save_patch(out_path, sample)


def _bulk_worker(row) -> tuple[str, str | None]:
    pdb_path, out_path, heavy, light, antigens, k, keep_fv = row
    try:
        process_one(pdb_path, out_path, heavy, light, antigens, k, keep_fv)
        return out_path, None
    except Exception:
        return out_path, traceback.format_exc(limit=2)


def run_bulk(args) -> int:
    import pandas as pd

    meta = pd.read_csv(args.meta)
    os.makedirs(args.out_dir, exist_ok=True)
    rows = []
    for rec in meta.itertuples():
        heavy = _norm_chain(getattr(rec, "Hchain", None))
        light = _norm_chain(getattr(rec, "Lchain", None))
        ag_raw = _norm_chain(getattr(rec, "antigen_chain", None))
        antigens = "".join(c for c in ag_raw.split(" | ")) if ag_raw else None
        name = "_".join(
            str(x) for x in [rec.pdb_id, heavy or "na", light or "na",
                             antigens or "na"]
        )
        rows.append((
            os.path.join(args.data_dir, f"{rec.pdb_id}.pdb"),
            os.path.join(args.out_dir, f"{name}.npz"),
            heavy, light, antigens, args.nearest_k, not args.no_fv_trim,
        ))

    n_ok = n_fail = 0
    # spawn, not fork: the importing process usually already has JAX/XLA
    # threads (this container starts a backend in every python process),
    # and forking a threaded process can deadlock mid-run — unacceptable
    # for an 8,400-file sweep.
    with mp.get_context("spawn").Pool(args.jobs) as pool:
        for out_path, err in pool.imap_unordered(_bulk_worker, rows):
            if err is None:
                n_ok += 1
            else:
                n_fail += 1
                print(f"[skip] {out_path}:\n{err}", file=sys.stderr)
    print(f"preprocessed {n_ok} complexes, skipped {n_fail}")
    return 0 if n_ok > 0 else 1


def main(argv=None) -> int:
    args = parse_args(argv)
    if args.meta:
        if not (args.data_dir and args.out_dir):
            print("bulk mode requires --data-dir and --out-dir", file=sys.stderr)
            return 2
        return run_bulk(args)
    if not (args.input and args.output):
        print("single mode requires --input and --output "
              "(or use --meta for bulk)", file=sys.stderr)
        return 2
    process_one(
        args.input, args.output, args.heavy_chain_id, args.light_chain_id,
        args.antigen_chain_ids, args.nearest_k, not args.no_fv_trim,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
