"""Probe sampling-time self-conditioning gating (sample(sc_t_max=...)).

Against a trained self-conditioned checkpoint, sweep the timestep
threshold below which the clean-state estimate is fed back: high-t steps
run cold (the estimate is noise there, and on the multi-loop corpus the
sequence shortcut lives at high t — QUALITY.md), low-t steps keep the
geometric benefit.  No retraining: both flag states are in the training
distribution.

Usage:
  python scripts/probe_sc_tmax.py --workdir runs/quality_mcdr48k_scg \
      --cdrs H1 H2 H3
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", required=True)
    p.add_argument("--cdrs", nargs="+", default=["H3"])
    p.add_argument("--split", default="h", choices=["h", "c"])
    p.add_argument("--designs-per-target", type=int, default=8)
    p.add_argument("--max-targets", type=int, default=24)
    p.add_argument("--noise-scale", type=float, default=1.0)
    p.add_argument("--t-max-grid", type=int, nargs="+",
                   default=[0, 10, 25, 50, 75, 100])
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffab_pytorch_tpu.config import default_config
    from diffab_pytorch_tpu.data.dataset import (
        COORD_SCALE, PatchDataset, assemble_batch,
    )
    from diffab_pytorch_tpu.evaluation import amino_acid_recovery, ca_rmsd
    from diffab_pytorch_tpu.train import DiffAb
    from diffab_pytorch_tpu.train.checkpoint import (
        load_model_config, restore_params,
    )

    t0 = time.time()
    log = lambda m: print(f"[sc_tmax +{time.time()-t0:6.1f}s] {m}", flush=True)

    cfg = default_config()
    saved = load_model_config(os.path.join(args.workdir, "checkpoints"))
    if saved is None:
        print("checkpoint has no model_config.json"); return 2
    cfg = dataclasses.replace(cfg, model=saved)
    if not cfg.model.self_conditioning:
        print("checkpoint is not self-conditioned"); return 2
    harness = DiffAb(cfg)
    n = args.designs_per_target

    paths = sorted(glob.glob(os.path.join(args.workdir, "npz",
                                          f"{args.split}*.npz")))
    ds = PatchDataset(paths, cdrs_to_generate=args.cdrs)
    take = np.unique(np.linspace(0, len(ds) - 1,
                                 min(len(ds), args.max_targets)).astype(int))
    one0, _ = assemble_batch([ds[0]], args.cdrs)
    params, step = restore_params(
        os.path.abspath(os.path.join(args.workdir, "checkpoints")),
        harness.init(jax.random.key(0), one0).params,
    )
    log(f"restored @ step {step}; sc_seq={cfg.model.self_conditioning_sequence}; "
        f"{len(take)} targets x {n} designs, ns={args.noise_scale}")

    def _eval(params, one, rep, key, t_max):
        res = harness.sample(params, one, key, n_designs=n,
                             noise_scale=args.noise_scale,
                             sc_t_max=None if t_max >= 100 else t_max)
        gen = rep.generation_mask & rep.residue_mask
        return {
            "aar": amino_acid_recovery(res.seq_idx, rep.seq_idx, gen),
            "rmsd": ca_rmsd(res.translations, rep.translations, gen,
                            scale=COORD_SCALE),
        }

    fns = {tm: jax.jit(lambda p, o, r, k, tm=tm: _eval(p, o, r, k, tm))
           for tm in args.t_max_grid}

    rows = {tm: [] for tm in args.t_max_grid}
    for vi in take:
        raw = ds[int(vi)]
        one, _ = assemble_batch([raw], args.cdrs)
        rep, _ = assemble_batch([raw] * n, args.cdrs)
        key = jax.random.fold_in(jax.random.key(args.seed + 7), vi)
        for tm, fn in fns.items():
            rows[tm].append(jax.device_get(fn(params, one, rep, key)))

    report = {}
    for tm in args.t_max_grid:
        aar = np.concatenate([r["aar"] for r in rows[tm]])
        rmsd = np.concatenate([r["rmsd"] for r in rows[tm]])
        report[str(tm)] = {
            "aar": float(aar.mean()),
            "rmsd_mean": float(rmsd.mean()),
            "rmsd_median": float(np.median(rmsd)),
        }
        log(f"sc_t_max={tm:3d}  aar={aar.mean():.3f}  "
            f"rmsd={rmsd.mean():.3f}A (med {np.median(rmsd):.3f})")
    out = os.path.join(args.workdir, "sc_tmax_probe.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=2)
    log(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
