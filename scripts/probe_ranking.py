"""Probe the design-ranking scorer's knobs against a trained checkpoint.

Loads a quality-run checkpoint (scripts/quality_run.py workdir), samples
n designs per val target in the scatter-prone codesign ns=1.0 mode, and
scores them under several scorer configurations — t-grid placement,
number of draws, per-component weights — reporting Spearman rho and the
RMSD of the top-1-by-score design vs the oracle best-of-n for each.

Everything per (target, config) runs as ONE jitted program; the sampling
pass is shared across configs (same designs, same RMSDs).

Usage:
  python scripts/probe_ranking.py --workdir runs/quality_combo12k
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
    p.add_argument("--workdir", default="runs/quality_combo12k")
    p.add_argument("--split", default="h", choices=["h", "c"],
                   help="h = held-out combos (val_combo), c = trained combos")
    p.add_argument("--designs-per-target", type=int, default=8)
    p.add_argument("--max-targets", type=int, default=24)
    p.add_argument("--noise-scale", type=float, default=1.0)
    p.add_argument("--mode", default="codesign",
                   choices=["codesign", "fix-sequence", "fix-structure"],
                   help="Sampling mode to rank.  fix-structure (sequence "
                        "design) ranks against 1-AAR instead of RMSD; "
                        "round-3 VERDICT weak #4: the low-t default grid "
                        "was validated for codesign only")
    p.add_argument("--n-steps", type=int, default=None,
                   help="Few-step chain length (e.g. 25 gives the ranking "
                        "probe a regime with real sequence errors to rank)")
    p.add_argument("--fine-tail-22", action="store_true",
                   help="Sample with the round-4 production fast STOCHASTIC "
                        "recipe (22-eval fine-tail chord chain: n_steps=22, "
                        "n_fine_tail=12, noise_t_max=12, chord@0.6T, ns=1) — "
                        "round-4 VERDICT #5: the oracle-free ranking was "
                        "only ever validated on 100-eval chains")
    p.add_argument("--cdrs", nargs="+", default=["H3"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--smoke", action="store_true", help="CPU + tiny preset")
    args = p.parse_args(argv)

    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffab_pytorch_tpu.config import default_config, tiny_config
    from diffab_pytorch_tpu.data.dataset import (
        COORD_SCALE, PatchDataset, assemble_batch,
    )
    from diffab_pytorch_tpu.evaluation import ca_rmsd, spearman_corr
    from diffab_pytorch_tpu.train import DiffAb
    from diffab_pytorch_tpu.train.checkpoint import (
        load_model_config, restore_params,
    )

    t0 = time.time()
    log = lambda m: print(f"[rankprobe +{time.time()-t0:6.1f}s] {m}", flush=True)

    cfg = tiny_config() if args.smoke else default_config()
    saved_model = load_model_config(
        os.path.join(args.workdir, "checkpoints")
    )
    if saved_model is not None:
        cfg = dataclasses.replace(cfg, model=saved_model)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model,
            compute_dtype="float32" if args.smoke else "bfloat16",
        )
    )
    harness = DiffAb(cfg)
    T = cfg.diffusion.T
    n = args.designs_per_target

    paths = sorted(glob.glob(os.path.join(args.workdir, "npz",
                                          f"{args.split}*.npz")))
    if not paths:
        print(f"no {args.split}*.npz under {args.workdir}/npz"); return 2
    ds = PatchDataset(paths, cdrs_to_generate=args.cdrs)
    take = np.linspace(0, len(ds) - 1,
                       min(len(ds), args.max_targets)).astype(int)

    one0, _ = assemble_batch([ds[0]], args.cdrs)
    params, step = restore_params(
        os.path.abspath(os.path.join(args.workdir, "checkpoints")),
        harness.init(jax.random.key(0), one0).params,
    )
    gen_flags = dict(
        generate_structure=args.mode != "fix-structure",
        generate_sequence=args.mode != "fix-sequence",
    )
    log(f"restored checkpoint @ step {step}; {len(np.unique(take))} targets "
        f"x {n} designs, mode={args.mode}, ns={args.noise_scale}, "
        f"n_steps={args.n_steps}")

    # scorer configurations under probe
    lo = tuple(np.unique(np.round(np.linspace(1, T // 4, 8)).astype(int)))
    hi = tuple(np.unique(np.round(np.linspace(3 * T // 4, T, 8)).astype(int)))
    uni = tuple(np.unique(np.round(np.linspace(1, T, 8)).astype(int)))
    uni16 = tuple(np.unique(np.round(np.linspace(1, T, 16)).astype(int)))
    mid = tuple(np.unique(np.round(np.linspace(1, T // 2, 8)).astype(int)))
    configs = {
        "default(8t x 2draw)": {},
        "low-t(1..25)": dict(t_grid=lo),
        "low-t(1..50)": dict(t_grid=mid),
        "uniform(1..100)": dict(t_grid=uni),
        "high-t(75..100)": dict(t_grid=hi),
        "uniform16 x 1draw": dict(t_grid=uni16, n_draws=1),
        "4 draws": dict(n_draws=4),
    }
    if args.mode != "fix-structure":
        configs.update({
            "translations-only": dict(seq_weight=0.0, orientations_weight=0.0),
            "orientations-only": dict(seq_weight=0.0, translations_weight=0.0),
            "trans+orient": dict(seq_weight=0.0),
            "low-t trans-only": dict(t_grid=lo, seq_weight=0.0,
                                     orientations_weight=0.0),
            "low-t trans+orient": dict(t_grid=lo, seq_weight=0.0),
            "low-t x4 draws": dict(t_grid=lo, n_draws=4),
        })
    if args.mode != "fix-sequence":
        configs["seq-only"] = dict(translations_weight=0.0,
                                   orientations_weight=0.0)
    if args.mode == "fix-structure":
        # only the seq term is live; sweep its grid placement at 4 draws too
        configs.update({
            "mid-t x4 draws": dict(t_grid=mid, n_draws=4),
            "uniform x4 draws": dict(t_grid=uni, n_draws=4),
        })

    tail_kw = {}
    if args.fine_tail_22:
        tail_kw = dict(n_steps=22, n_fine_tail=12, noise_t_max=12,
                       init="chord", t_start=6 * T // 10, noise_scale=1.0)

    def _eval(params, one, rep, key):
        skw = tail_kw or dict(noise_scale=args.noise_scale,
                              n_steps=args.n_steps)
        res = harness.sample(params, one, key, n_designs=n, **skw,
                             **gen_flags)
        gen = rep.generation_mask & rep.residue_mask
        rmsd = ca_rmsd(res.translations, rep.translations, gen,
                       scale=COORD_SCALE)
        match = (res.seq_idx == rep.seq_idx) & gen
        aar = match.sum(-1) / jnp.maximum(gen.sum(-1), 1)
        out = {"rmsd": rmsd, "aar": aar}
        for name, kw in configs.items():
            sc = harness.score_designs(params, one, res,
                                       jax.random.fold_in(key, 12345),
                                       **gen_flags, **kw)
            out[name] = sc.score
        return out

    eval_fn = jax.jit(_eval)

    rows = []
    for vi in np.unique(take):
        raw = ds[int(vi)]
        one, _ = assemble_batch([raw], args.cdrs)
        rep, _ = assemble_batch([raw] * n, args.cdrs)
        key = jax.random.fold_in(jax.random.key(args.seed + 7), vi)
        rows.append(jax.device_get(eval_fn(params, one, rep, key)))
    log(f"sampled+scored {len(rows)} targets")

    report = {"meta": {"mode": args.mode, "noise_scale": args.noise_scale,
                       "n_steps": args.n_steps, "designs": n,
                       "targets": len(rows),
                       "fine_tail_22": bool(args.fine_tail_22),
                       "sample_kwargs": {k: str(v) for k, v in
                                         tail_kw.items()}}}
    rmsds = np.stack([r["rmsd"] for r in rows])  # (targets, n)
    aars = np.stack([r["aar"] for r in rows])
    # the "badness" the ranking should order: geometric error when
    # structure was generated, sequence error (1 - AAR) for fix-structure
    bad = rmsds if args.mode != "fix-structure" else (1.0 - aars)
    unit = "A" if args.mode != "fix-structure" else " (1-AAR)"
    oracle = float(bad.min(axis=1).mean())
    for name in configs:
        scores = np.stack([r[name] for r in rows])
        rho = np.array([
            float(spearman_corr(jnp.asarray(s), jnp.asarray(g)))
            for s, g in zip(scores, bad)
        ])
        pick = scores.argmin(axis=1)
        top1 = bad[np.arange(len(bad)), pick]
        report[name] = {
            "rho_mean": float(np.nanmean(rho)),
            "top1_mean": float(top1.mean()),
            "top1_median": float(np.median(top1)),
            "top1_aar_mean": float(
                aars[np.arange(len(aars)), pick].mean()
            ),
        }
        log(f"{name:24s} rho={np.nanmean(rho):+.3f} "
            f"top1={top1.mean():.3f}{unit} (median {np.median(top1):.3f})")
    log(f"{'oracle best-of-n':24s} {oracle:.3f}{unit} | unranked mean "
        f"{bad.mean():.3f}{unit} median {np.median(bad):.3f}")
    report["oracle_best_of_n"] = oracle
    report["unranked_mean"] = float(bad.mean())
    report["unranked_aar_mean"] = float(aars.mean())
    if args.fine_tail_22:
        suffix = "_finetail22"
    else:
        suffix = "" if args.mode == "codesign" and args.n_steps is None \
            else (
                f"_{args.mode.replace('-', '')}"
                + (f"_{args.n_steps}step" if args.n_steps else "")
            )
    out = os.path.join(args.workdir, f"rank_probe{suffix}.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=2)
    log(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
