"""Diversity vs correctness on the degenerate compositional corpus.

Round-2 VERDICT weak #7: on the unique-answer corpus, trained-mode
sequence diversity measured 0.000-0.019 on every split — but there
collapse IS the optimum, so the protocol could not distinguish "correctly
confident" from "mode-collapsed".  The degenerate corpus
(write_combo_corpus(seq_degeneracy=d), data/synthetic.py) gives every
loop position d equally-valid residues per slot value with IDENTICAL
conformation, so a calibrated sampler should stay inside the valid set
(valid-set AAR ~ 1) while actually spreading over the options
(coverage > 1/d, diversity > 0); a mode-collapsed one aces validity but
covers one option.

Evaluates a finished quality_run workdir trained on such a corpus, over
noise_scale in {0, 0.5, 1.0}:

  aar_exact      exact match vs the instance's own drawn motif (the old
                 metric — capped at ~ 1/d + (d-1)/d * 1/d by construction
                 for a calibrated sampler when d > 1)
  aar_valid      design residue in the position's valid option set
  coverage       mean over (target, position) of
                 (#distinct valid options sampled across designs) / d
  diversity      mean pairwise hamming across designs (the metric
                 QUALITY.md reports)

Usage (after: python scripts/quality_run.py --workdir runs/quality_div2
       --seq-degeneracy 2 ...):
  python scripts/probe_diversity.py --workdir runs/quality_div2
Writes {workdir}/diversity_probe.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default="runs/quality_div2")
    p.add_argument("--designs-per-target", type=int, default=16)
    p.add_argument("--max-targets", type=int, default=16)
    p.add_argument("--noise-scales", type=float, nargs="+",
                   default=[0.0, 0.5, 1.0])
    p.add_argument("--cdrs", nargs="+", default=["H3"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args(argv)

    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from diffab_pytorch_tpu.config import default_config, tiny_config
    from diffab_pytorch_tpu.data.dataset import PatchDataset, assemble_batch
    from diffab_pytorch_tpu.data.synthetic import (
        CDR_LOOP_RANGES, loop_motif_index_options,
    )
    from diffab_pytorch_tpu.evaluation import sequence_diversity
    from diffab_pytorch_tpu.train import DiffAb
    from diffab_pytorch_tpu.train.checkpoint import (
        load_model_config, restore_params,
    )

    t0 = time.time()
    log = lambda m: print(f"[divprobe +{time.time()-t0:6.1f}s] {m}", flush=True)

    with open(os.path.join(args.workdir, "combos.json")) as fh:
        manifest = json.load(fh)
    degeneracy = int(manifest.get("seq_degeneracy", 1))
    loops = [l for l in ("H1", "H2", "H3")
             if l in manifest.get("cdr_loops", ["H3"]) and l in args.cdrs]
    heldout = [tuple(c) for c in manifest["heldout_combos"]]
    log(f"corpus degeneracy d={degeneracy}, loops={loops}, "
        f"{len(heldout)} held-out combos")

    ckpt_dir = os.path.abspath(os.path.join(args.workdir, "checkpoints"))
    cfg = tiny_config() if args.smoke else default_config()
    saved_model = load_model_config(ckpt_dir)
    if saved_model is not None:
        cfg = dataclasses.replace(cfg, model=saved_model)
    if not args.smoke:
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, compute_dtype="bfloat16"))
    harness = DiffAb(cfg)
    n = args.designs_per_target

    paths = sorted(glob.glob(os.path.join(args.workdir, "npz", "h*.npz")))
    if not paths:
        print(f"no h*.npz under {args.workdir}/npz"); return 2
    take = np.linspace(0, len(paths) - 1,
                       min(len(paths), args.max_targets)).astype(int)
    paths = [paths[i] for i in np.unique(take)]
    ds = PatchDataset(paths, cdrs_to_generate=args.cdrs)

    one0, _ = assemble_batch([ds[0]], args.cdrs)
    params, step = restore_params(
        ckpt_dir, harness.init(jax.random.key(0), one0).params
    )
    log(f"restored checkpoint @ step {step}; {len(paths)} targets x {n}")

    sample_fns = {
        f"ns={ns}": jax.jit(lambda p, b, k, _ns=ns: harness.sample(
            p, b, k, n_designs=n, noise_scale=_ns))
        for ns in args.noise_scales
    }
    # the round-3 recommended stochastic recipe: coordinate noise only at
    # t <= 50 (DESIGN.md scatter study).  Only COORDINATE noise is gated —
    # the sequence chain keeps its full stochasticity — so diversity /
    # coverage should match ns=1.0 while the scatter is gone; this arm
    # verifies that directly.
    sample_fns["ns=1.0,ntmax=50"] = jax.jit(
        lambda p, b, k: harness.sample(
            p, b, k, n_designs=n, noise_scale=1.0, noise_t_max=50))
    # chord-start arms (round 3): the structural prior replaces the
    # high-t transport — does it cost sequence diversity/coverage?  The
    # sequence chain still starts from the uniform prior, so it should
    # not; this verifies that, including for the fast few-step recipes.
    T = cfg.diffusion.T
    sample_fns["chord75,ns=1.0,ntmax=50"] = jax.jit(
        lambda p, b, k: harness.sample(
            p, b, k, n_designs=n, init="chord", t_start=3 * T // 4,
            noise_scale=1.0, noise_t_max=T // 2))
    sample_fns["chord75,ns=0,25step"] = jax.jit(
        lambda p, b, k: harness.sample(
            p, b, k, n_designs=n, init="chord", t_start=3 * T // 4,
            noise_scale=0.0, n_steps=25))
    sample_fns["chord60,ns=0,10step"] = jax.jit(
        lambda p, b, k: harness.sample(
            p, b, k, n_designs=n, init="chord", t_start=6 * T // 10,
            noise_scale=0.0, n_steps=10))
    # the round-4 fast STOCHASTIC recipe (22 evals): chord start, coarse
    # noiseless transport, stride-1 noisy tail (n_fine_tail) — must match
    # the 100-eval ns=1+ntmax50 recipe on sequence coverage/diversity
    # (it matches it on scatter/structure-diversity in the
    # coord_reverse probes, runs/r4_ck{A,B})
    sample_fns["chord60,22tail12,ns=1"] = jax.jit(
        lambda p, b, k: harness.sample(
            p, b, k, n_designs=n, init="chord", t_start=6 * T // 10,
            noise_scale=1.0, n_steps=22, n_fine_tail=12, noise_t_max=12))

    out = {"meta": {"workdir": args.workdir, "degeneracy": degeneracy,
                    "designs": n, "targets": len(paths),
                    "checkpoint_step": step, "cdrs": args.cdrs}}
    for label, fn in sample_fns.items():
        rows = []
        for ti, path in enumerate(paths):
            stem = os.path.splitext(os.path.basename(path))[0]
            combo = heldout[int(stem.split("_")[0][1:])]
            # valid option sets, in residue order across the designed loops
            options = []
            for loop in loops:
                options.extend(loop_motif_index_options(
                    combo, loop, degeneracy))

            raw = ds[ti]
            one, _ = assemble_batch([raw], args.cdrs)
            key = jax.random.fold_in(jax.random.key(args.seed + 7), ti)
            res = jax.device_get(fn(params, one, key))
            gen = np.asarray(one.generation_mask[0] & one.residue_mask[0])
            pos = np.where(gen)[0]
            if len(pos) != len(options):
                raise RuntimeError(
                    f"{stem}: {len(pos)} generated positions vs "
                    f"{len(options)} option sets — cdrs/corpus mismatch")
            seqs = np.asarray(res.seq_idx)[:, pos]  # (n, P)
            native = np.asarray(one.seq_idx[0])[pos]

            valid = np.stack([
                np.isin(seqs[:, j], options[j]) for j in range(len(pos))
            ], axis=1)  # (n, P)
            cov = np.mean([
                len(set(seqs[:, j]) & set(options[j])) / degeneracy
                for j in range(len(pos))
            ])
            div = float(sequence_diversity(
                jnp.asarray(res.seq_idx), jnp.asarray(gen)))
            rows.append({
                "aar_exact": float((seqs == native[None]).mean()),
                "aar_valid": float(valid.mean()),
                "coverage": float(cov),
                "diversity": div,
            })
        agg = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
        out[label] = agg
        log(f"{label}: exact {agg['aar_exact']:.3f}, valid "
            f"{agg['aar_valid']:.3f}, coverage {agg['coverage']:.3f}, "
            f"diversity {agg['diversity']:.3f}")

    path = os.path.join(args.workdir, "diversity_probe.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    log(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
