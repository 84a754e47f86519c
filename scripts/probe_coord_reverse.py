"""Scatter-mitigation A/B: coordinate reverse modes on a trained checkpoint.

probe_scatter.py localized the scattered-design mechanism: chains freeze
near their init during the HIGH-t transport phase (100% "never entered
the basin"; translations stagnate at ~0.2 of the data extent while
sequence/orientations recover normally) — the posterior-mean step
contracts the chain's residual below the marginal radius sqrt(1-abar_s),
leaving under-transported chains off the training manifold at mid-t.

This probe measures the candidate fixes on the SAME checkpoint and key
protocol (pure sampling-time changes):

  * coord_ddim_t_min (sampler knob): DDIM-direction steps at t > k keep
    the chain on the marginal radius; posterior contraction below.
  * step_schedule="hight" (few-step only): spend the step budget densely
    at high t, where the basin entry is decided.
  * combinations.

Usage: python scripts/probe_coord_reverse.py --workdir runs/quality_combo12k
Writes {workdir}/coord_reverse_probe.json.
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


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default="runs/quality_combo12k")
    p.add_argument("--targets", type=int, default=12)
    p.add_argument("--designs", type=int, default=16)
    p.add_argument("--cdrs", nargs="+", default=["H3"])
    p.add_argument("--scatter-thresh", type=float, default=2.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--arms", nargs="*", default=None,
                   help="Run only these arms (substring match); default all."
                        "  Results merge into an existing probe JSON.")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from diffab_pytorch_tpu.config import default_config, tiny_config
    from diffab_pytorch_tpu.data.dataset import (
        COORD_SCALE, PatchDataset, assemble_batch,
    )
    from diffab_pytorch_tpu.train import DiffAb
    from diffab_pytorch_tpu.train import checkpoint as ckpt_lib

    t0 = time.time()
    log = lambda m: print(f"[coordrev +{time.time()-t0:7.1f}s] {m}", flush=True)

    ckpt_dir = os.path.abspath(os.path.join(args.workdir, "checkpoints"))
    cfg = tiny_config() if args.smoke else default_config()
    saved_model = ckpt_lib.load_model_config(ckpt_dir)
    if saved_model is not None:
        cfg = dataclasses.replace(cfg, model=saved_model)
    harness = DiffAb(cfg)

    npz_dir = os.path.join(args.workdir, "npz")
    stem = lambda p: os.path.splitext(os.path.basename(p))[0]
    val_paths = [p for p in sorted(glob.glob(os.path.join(npz_dir, "*.npz")))
                 if stem(p).startswith("h")]
    if not val_paths:
        raise SystemExit(f"no val_combo (h*) patches under {npz_dir}")
    take = np.linspace(0, len(val_paths) - 1,
                       min(len(val_paths), args.targets)).astype(int)
    val_paths = [val_paths[i] for i in np.unique(take)]
    ds = PatchDataset(val_paths, cdrs_to_generate=args.cdrs)

    one0, _ = assemble_batch([ds[0]], args.cdrs)
    state = harness.init(jax.random.key(args.seed), one0)
    params, at_step = ckpt_lib.restore_params(ckpt_dir, state.params)
    log(f"restored {ckpt_dir} @ step {at_step}")

    n = args.designs

    def make_fn(**kw):
        def _fn(params, one, rep, key):
            res = harness.sample(params, one, key, n_designs=n, **kw)
            genm = rep.generation_mask & rep.residue_mask
            denom = jnp.maximum(genm.sum(-1), 1)
            diff = (res.translations - rep.translations) * COORD_SCALE
            sq = (diff**2).sum(-1)
            rmsd = jnp.sqrt((sq * genm).sum(-1) / denom)  # (n,)
            aar = ((res.seq_idx == rep.seq_idx) & genm).sum(-1) / denom
            # structural diversity: mean pairwise CA-RMSD among the n
            # designs over the generated region — the quantity the
            # stochastic modes exist to buy (round-4: a fast stochastic
            # recipe must match the full-length recipe here, not just on
            # scatter).  Designs that themselves scatter (> thresh vs
            # native) are excluded so a 2%-scatter arm is not credited
            # with "diversity" that is really failure spread.
            x = res.translations * COORD_SCALE  # (n, L, 3)
            pd = ((x[:, None] - x[None, :]) ** 2).sum(-1)  # (n, n, L)
            gm = genm[0].astype(x.dtype)
            prmsd = jnp.sqrt((pd * gm).sum(-1) / jnp.maximum(gm.sum(), 1))
            ok = rmsd <= 2.0  # clean designs only
            wpair = ok[:, None] & ok[None, :] & ~jnp.eye(n, dtype=bool)
            # NaN (not 0.0) when < 2 designs pass the clean filter: a
            # fully-scattered arm must stay distinguishable from a
            # mode-collapsed one, and a 0.0 would deflate the
            # cross-target mean (aggregated with nanmean below)
            pairdiv = jnp.where(
                wpair.sum() > 0,
                (prmsd * wpair).sum() / jnp.maximum(wpair.sum(), 1),
                jnp.nan,
            )
            return dict(rmsd=rmsd, aar=aar, pairdiv=pairdiv)

        return jax.jit(_fn)

    T = cfg.diffusion.T
    arms = {
        # full-length stochastic chain (the 30%-scatter mode): defer the
        # posterior noise past the high-t entry region (the deterministic
        # full chain never scatters — probe_scatter.py)
        "ns1_base": make_fn(noise_scale=1.0),
        "ns1_ntmax90": make_fn(noise_scale=1.0, noise_t_max=9 * T // 10),
        "ns1_ntmax75": make_fn(noise_scale=1.0, noise_t_max=3 * T // 4),
        "ns1_ntmax50": make_fn(noise_scale=1.0, noise_t_max=T // 2),
        # 25-step deterministic chain (the 25%-scatter fast mode): high-t-
        # dense schedules, exponent trades scatter vs low-t precision
        "ns0_25_base": make_fn(noise_scale=0.0, n_steps=25),
        "ns0_25_hight50": make_fn(noise_scale=0.0, n_steps=25,
                                  step_schedule="hight"),
        "ns0_25_hight65": make_fn(noise_scale=0.0, n_steps=25,
                                  step_schedule="hight",
                                  step_schedule_p=0.65),
        "ns0_25_hight80": make_fn(noise_scale=0.0, n_steps=25,
                                  step_schedule="hight",
                                  step_schedule_p=0.8),
        # few-step x deferred-noise composition (round 3): if a 50- or
        # 25-step chain with noise_t_max holds full-chain quality, the
        # effective design throughput doubles/quadruples — the few-step
        # scatter (big respaced jumps) and the full-length scatter
        # (high-t noise) are different mechanisms, so measure the combo.
        "ns0_50_base": make_fn(noise_scale=0.0, n_steps=50),
        "ns1_50_ntmax50": make_fn(noise_scale=1.0, n_steps=50,
                                  noise_t_max=T // 2),
        "ns1_25_ntmax50": make_fn(noise_scale=1.0, n_steps=25,
                                  noise_t_max=T // 2),
        # orientation posterior reverse (diffusion/orientation.py
        # mode="posterior", the rotational beta-tilde analogue): the
        # DiffAb-paper "renoise" heuristic redraws the full forward
        # kernel at s every step, over-noising frames 3-6x at mid-t —
        # does the posterior-matched chain help design quality, alone
        # and composed with the coordinate-noise deferral?
        "ns1_opost": make_fn(noise_scale=1.0,
                             orientation_reverse="posterior"),
        "ns1_ntmax50_opost": make_fn(noise_scale=1.0, noise_t_max=T // 2,
                                     orientation_reverse="posterior"),
        # higher-order coordinate solvers (sampler coord_solver, round 3):
        # respaced-jump scatter is eps_hat bias amplified by the JUMP SIZE
        # — a second-order x0 estimate attacks it directly.  "ab2" costs
        # zero extra model evals; "heun" adds one eval per active step
        # (tN variants bound the extra evals to the stiff high-t region).
        "ns0_25_ab2": make_fn(noise_scale=0.0, n_steps=25,
                              coord_solver="ab2"),
        "ns0_25_heun": make_fn(noise_scale=0.0, n_steps=25,
                               coord_solver="heun"),
        "ns0_25_heun_t40": make_fn(noise_scale=0.0, n_steps=25,
                                   coord_solver="heun",
                                   coord_solver_t_min=2 * T // 5),
        "ns0_25_ab2_hight": make_fn(noise_scale=0.0, n_steps=25,
                                    coord_solver="ab2",
                                    step_schedule="hight"),
        "ns0_50_ab2": make_fn(noise_scale=0.0, n_steps=50,
                              coord_solver="ab2"),
        "ns0_10_ab2": make_fn(noise_scale=0.0, n_steps=10,
                              coord_solver="ab2"),
        "ns0_10_heun": make_fn(noise_scale=0.0, n_steps=10,
                               coord_solver="heun"),
        # chord-start generation (sampler init="chord", round 3): start
        # the designed coordinates from the forward-noised anchor-anchor
        # chord at t_start < T instead of pure noise at T — the scatter
        # diagnosis says failures happen during high-t transport, so skip
        # most of it.  Zero extra model evals; composes with few-step.
        "ns0_25_chord75": make_fn(noise_scale=0.0, n_steps=25,
                                  init="chord", t_start=3 * T // 4),
        "ns0_25_chord85": make_fn(noise_scale=0.0, n_steps=25,
                                  init="chord", t_start=85 * T // 100),
        "ns0_10_chord60": make_fn(noise_scale=0.0, n_steps=10,
                                  init="chord", t_start=6 * T // 10),
        "ns0_50_chord75": make_fn(noise_scale=0.0, n_steps=50,
                                  init="chord", t_start=3 * T // 4),
        "ns1_chord75_ntmax50": make_fn(noise_scale=1.0, init="chord",
                                       t_start=3 * T // 4,
                                       noise_t_max=T // 2),
        # orientation-chord variants (sampler chord_orientations=True,
        # round 3c): designed frames start from the forward-noised
        # anchor slerp instead of the uniform prior — testing the
        # hypothesis that the stochastic chord compositions lose because
        # the uniform frame init is off the forward marginal at t_start
        "ns0_10_chordR60": make_fn(noise_scale=0.0, n_steps=10,
                                   init="chord", chord_orientations=True,
                                   t_start=6 * T // 10),
        "ns0_25_chordR75": make_fn(noise_scale=0.0, n_steps=25,
                                   init="chord", chord_orientations=True,
                                   t_start=3 * T // 4),
        "ns1_chordR75_ntmax50": make_fn(noise_scale=1.0, init="chord",
                                        chord_orientations=True,
                                        t_start=3 * T // 4, noise_t_max=50),
        "ns1_25_chordR75_ntmax50": make_fn(noise_scale=1.0, n_steps=25,
                                           init="chord",
                                           chord_orientations=True,
                                           t_start=3 * T // 4,
                                           noise_t_max=50),
        "ns1_25_chord75_ntmax50": make_fn(noise_scale=1.0, n_steps=25,
                                          init="chord", t_start=3 * T // 4,
                                          noise_t_max=T // 2),
        # fine-tail stochastic recipes (round 4, sampler n_fine_tail):
        # the final k timesteps run at stride 1 and carry ALL the injected
        # noise (noise_t_max = k), so noise is always re-contracted by a
        # single-step posterior before the next move — the regime the
        # full-length ns1+ntmax recipe lives in — while the coarse strides
        # above are noiseless deterministic transport from the chord.
        # Total evals = n_steps (<= 25 target, VERDICT r3 #3).
        "ns1_16tail6_chord60": make_fn(
            noise_scale=1.0, n_steps=16, n_fine_tail=6, noise_t_max=6,
            init="chord", t_start=6 * T // 10),
        "ns1_22tail12_chord60": make_fn(
            noise_scale=1.0, n_steps=22, n_fine_tail=12, noise_t_max=12,
            init="chord", t_start=6 * T // 10),
        "ns1_25tail18_chord60": make_fn(
            noise_scale=1.0, n_steps=25, n_fine_tail=18, noise_t_max=18,
            init="chord", t_start=6 * T // 10),
        "ns1_22tail12_chord60_ns07": make_fn(
            noise_scale=0.7, n_steps=22, n_fine_tail=12, noise_t_max=12,
            init="chord", t_start=6 * T // 10),
        # ablation: same budget/tail from the PRIOR (no chord) — is the
        # chord load-bearing or is the fine tail alone enough?
        "ns1_22tail12_prior": make_fn(
            noise_scale=1.0, n_steps=22, n_fine_tail=12, noise_t_max=12),
        # ablation: same budget, noise in the tail but WITHOUT stride-1
        # (uniform 22 steps, ntmax=12) — isolates the stride-1 mechanism
        "ns1_22_chord60_ntmax12": make_fn(
            noise_scale=1.0, n_steps=22, noise_t_max=12,
            init="chord", t_start=6 * T // 10),
    }
    if args.arms:
        arms = {a: fn for a, fn in arms.items()
                if any(sel in a for sel in args.arms)}
        if not arms:
            raise SystemExit(f"--arms matched nothing: {args.arms}")
        log(f"running {len(arms)} arms: {list(arms)}")

    raw = {a: [] for a in arms}
    for vi in range(len(ds)):
        one, _ = assemble_batch([ds[vi]], args.cdrs)
        rep, _ = assemble_batch([ds[vi]] * n, args.cdrs)
        key = jax.random.fold_in(jax.random.key(args.seed + 7), vi)
        for arm, fn in arms.items():
            raw[arm].append(jax.device_get(fn(params, one, rep, key)))
        if vi == 0:
            log("first target done (compiles paid)")

    path = os.path.join(args.workdir, "coord_reverse_probe.json")
    out = {}
    if args.arms and os.path.exists(path):
        with open(path) as fh:
            out = json.load(fh)  # merge new arms into the existing probe
    out["meta"] = {
        "workdir": args.workdir, "checkpoint_step": at_step,
        "targets": len(ds), "designs_per_target": n,
        "scatter_thresh_A": args.scatter_thresh, "cdrs": args.cdrs,
    }
    thr = args.scatter_thresh
    for arm in arms:
        rmsd = np.concatenate([r["rmsd"] for r in raw[arm]])
        aar = np.concatenate([r["aar"] for r in raw[arm]])
        best = np.mean([r["rmsd"].min() for r in raw[arm]])
        m = {
            "scatter_fraction": float((rmsd > thr).mean()),
            "rmsd_mean": float(rmsd.mean()),
            "rmsd_median": float(np.median(rmsd)),
            "rmsd_best_of_n": float(best),
            "aar": float(aar.mean()),
            # mean pairwise CA-RMSD among CLEAN designs of one target;
            # targets with < 2 clean designs contribute NaN, excluded by
            # nanmean, and are counted separately so a scattered arm is
            # not read as mode-collapsed (ADVICE r4)
            "structure_diversity_A": float(
                np.nanmean([r["pairdiv"] for r in raw[arm]])
            ),
            "targets_under_2_clean": int(
                np.sum([np.isnan(r["pairdiv"]) for r in raw[arm]])
            ),
        }
        out[arm] = m
        log(f"{arm}: scatter {m['scatter_fraction']:.3f} "
            f"mean {m['rmsd_mean']:.2f} med {m['rmsd_median']:.2f} "
            f"best {m['rmsd_best_of_n']:.2f} AAR {m['aar']:.3f} "
            f"sdiv {m['structure_diversity_A']:.3f}")

    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    log(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
