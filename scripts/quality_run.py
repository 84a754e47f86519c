"""Trained-quality recipe: the numbers behind QUALITY.md.

Corpus -> preprocess -> train -> checkpoint -> sample -> evaluate, end to
end through the public package surface, on whatever backend is default
(the real TPU chip in this environment; --smoke forces CPU + tiny preset
for a fast self-check).

The corpus is the COMPOSITIONAL synthetic corpus (data/synthetic.py,
round-1 VERDICT weak #5): the framework barcode is a tuple of independent
slots, H3 position k's identity is a function of slot (k mod m) alone, and
the loop conformation is a linear mixture of per-slot displacement fields.
Training sees a SUBSET of slot-value combinations; evaluation reports two
splits:

  val_instance  unseen jitter/pose instances of TRAINED combinations —
                the round-1 protocol (a memorizer can ace this);
  val_combo     instances of combinations NEVER seen in training — chance
                level for a whole-barcode memorizer, high iff the model
                learned the per-slot rule and composes it.

No real SAbDab snapshot exists in this zero-egress environment; the
reference itself ships no data and no trained numbers (README
"Reproduction status: WIP").

Usage (full run, ~20 min wall on one v5e through the remote tunnel):
  python scripts/quality_run.py --workdir runs/quality_combo
  python scripts/quality_run.py --smoke        # CPU, tiny, ~3 min

Outputs {workdir}/quality.json with untrained-vs-trained metrics for both
splits and all sampling modes (codesign from the prior, deterministic
codesign, t-restart optimization), including the stereochemical validity
rates (evaluation.backbone_validity)."""

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


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default="runs/quality")
    p.add_argument("--n-values", type=int, default=4,
                   help="values per barcode slot (combinations = v^4)")
    p.add_argument("--train-combos", type=int, default=40)
    p.add_argument("--heldout-combos", type=int, default=12)
    p.add_argument("--per-combo", type=int, default=12,
                   help="instances per train combo (last one is val_instance)")
    p.add_argument("--val-instances", type=int, default=2,
                   help="instances per held-out combo")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("-b", "--bsz", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--adam-eps", type=float, default=1e-8,
                   help="Raise (e.g. 1e-5) to damp the late-training "
                        "spiral at high lr (config.py TrainConfig)")
    p.add_argument("--designs-per-target", type=int, default=8)
    p.add_argument("--t-restart", type=int, default=50)
    p.add_argument("--max-eval-targets", type=int, default=40,
                   help="Evaluate at most this many targets per split "
                        "(deterministic subsample; keeps the eval loop "
                        "bounded for large --train-combos)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cdrs", nargs="+", default=["H3"],
                   help="CDRs to design jointly (subset of H1 H2 H3 L1 L2 L3)")
    p.add_argument("--self-conditioning", action="store_true",
                   help="Train/sample with self-conditioning "
                        "(ModelConfig.self_conditioning; ~2x train step)")
    p.add_argument("--sc-geometry-only", action="store_true",
                   help="Self-conditioning features exclude the predicted "
                        "p(s_0) (the multi-loop recipe; config.py "
                        "self_conditioning_sequence)")
    p.add_argument("--sc-late-fusion", action="store_true",
                   help="Conditioned features after the trunk, geometry "
                        "heads only (ModelConfig.sc_late_fusion — the "
                        "round-4 attribution lever)")
    p.add_argument("--sc-split-trunk", action="store_true",
                   help="Separate geometry trunk for the conditioned "
                        "pathway (ModelConfig.sc_split_trunk — full "
                        "architectural isolation, ~2x trunk params; the "
                        "round-5 ceiling arm for the late-fusion seed "
                        "spread)")
    p.add_argument("--sc-rate", type=float, default=0.5,
                   help="Fraction of each batch trained conditioned")
    p.add_argument("--sc-onset", type=int, default=0,
                   help="Steps trained fully cold before conditioning "
                        "starts (late-onset sc)")
    p.add_argument("--sc-rate-warmup", type=int, default=0,
                   help="Steps to ramp the sc rate 0 -> sc-rate after onset")
    p.add_argument("--sc-seq-loss-weight", type=float, default=1.0,
                   help="Sequence-loss weight on the conditioned half "
                        "(<1 keeps the seq head's gradient cold-dominated)")
    p.add_argument("--sc-per-residue", action="store_true",
                   help="Per-residue sc mask: every sample keeps cold rows "
                        "(TrainConfig.sc_per_residue)")
    p.add_argument("--mode-dropout", type=float, default=0.0,
                   help="Context-mode dropout: probability each that a "
                        "training sample is presented as fix-structure / "
                        "fix-sequence instead of codesign "
                        "(TrainConfig.mode_dropout)")
    p.add_argument("--eval-fixed-modes", action="store_true",
                   help="Also evaluate the fix-structure (sequence design) "
                        "and fix-sequence (structure design) sampling modes "
                        "— meaningful on --mode-dropout checkpoints")
    p.add_argument("--dist-atoms", type=int, default=None,
                   help="Atoms entering the pair distance feature "
                        "(ModelConfig.dist_atoms; 4 = backbone-only, the "
                        "train-HBM lever — DESIGN.md §3)")
    p.add_argument("--d-pair", type=int, default=None,
                   help="ModelConfig.d_pair_emb override (the narrower-"
                        "pair-representation train lever — DESIGN.md §5; "
                        "changes the parameter budget, hence this quality "
                        "gate)")
    p.add_argument("--update-clip-rms", type=float, default=1.0,
                   help="Per-leaf RMS cap on the Adam-normalized update "
                        "(TrainConfig.update_clip_rms; bounds per-step "
                        "parameter movement at ~cap*lr — the spiral "
                        "counter that works where grad clipping and "
                        "adam_eps measured useless).  Default ON: the "
                        "seed matrix in QUALITY.md shows the plain lr "
                        "6e-4 recipe diverges on 2/3 seeds.  0 disables")
    p.add_argument("--ema", type=float, default=0.999,
                   help="Parameter-EMA decay (TrainConfig.ema_decay); "
                        "> 0 evaluates/saves the EMA weights (robust "
                        "default, QUALITY.md seed matrix).  0 disables")
    p.add_argument("--decouple-shape", action="store_true",
                   help="Corpus variant: loop conformations driven by an "
                        "independent per-instance shape barcode (own "
                        "framework positions) instead of the sequence "
                        "slots — the round-4 attribution experiment for "
                        "the multi-loop sc/AAR saturation "
                        "(data/synthetic.py _SHAPE_SLOT_POSITIONS)")
    p.add_argument("--seq-degeneracy", type=int, default=1,
                   help="Valid residues per (loop position, slot value) "
                        "in the corpus (>1 makes diversity measurable — "
                        "mode collapse vs correct confidence; "
                        "data/synthetic.py, scripts/probe_diversity.py)")
    p.add_argument("--smoke", action="store_true",
                   help="CPU backend, tiny preset, few combos, 60 steps")
    p.add_argument("--eval-only", action="store_true",
                   help="Skip training: restore {workdir}/checkpoints and "
                        "run only the trained-model evaluation (for "
                        "measuring new sampling modes against an existing "
                        "run without the 12k-step retrain).  Merges into "
                        "the existing quality.json when present.")
    p.add_argument("--ckpt-every", type=int, default=0,
                   help="Save a mid-run checkpoint every N steps (0 = auto, "
                        "steps//8; negative disables).  Long runs through "
                        "the remote-compile tunnel can lose the backend "
                        "mid-training — a 48k-step run with no mid-run "
                        "checkpoint loses everything (measured the hard "
                        "way).  Retention is orbax max_to_keep=3.")
    p.add_argument("--skip-untrained", action="store_true",
                   help="Skip the untrained-model eval (~10 min on the big "
                        "corpora).  For replicate runs whose purpose is the "
                        "trained checkpoint (e.g. probe targets) — the "
                        "untrained floor is already recorded by siblings.")
    p.add_argument("--train-only", action="store_true",
                   help="Stop after saving the trained checkpoint (implies "
                        "--skip-untrained; no sampling eval).  For probe-"
                        "target replicate runs (scatter/diversity probes "
                        "restore the checkpoint and run their own "
                        "sampling) — cuts ~2/3 of the wall per replicate.")
    p.add_argument("--resume", action="store_true",
                   help="Restore the latest {workdir}/checkpoints state and "
                        "continue training from its step (same shuffled "
                        "index stream — the per-step RNG folds state.step "
                        "in-jit, so the continued run consumes the exact "
                        "key sequence a straight-through run would).  The "
                        "untrained-model eval is reloaded from the partial "
                        "quality.json when present.")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.n_values, args.train_combos, args.heldout_combos = 2, 8, 3
        args.per_combo, args.val_instances = 3, 1
        args.steps, args.bsz, args.designs_per_target = 60, 8, 4
        args.t_restart = 10

    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffab_pytorch_tpu.cli.preprocess import process_one
    from diffab_pytorch_tpu.config import (
        TrainConfig, default_config, tiny_config,
    )
    from diffab_pytorch_tpu.data.dataset import (
        COORD_SCALE, PatchDataset, assemble_batch,
    )
    from diffab_pytorch_tpu.data.synthetic import write_combo_corpus
    from diffab_pytorch_tpu.evaluation import (
        evaluate_designs, sequence_diversity, spearman_corr,
        validity_from_result,
    )
    from diffab_pytorch_tpu.train import DiffAb
    from diffab_pytorch_tpu.train.checkpoint import save_checkpoint

    t0 = time.time()
    log = lambda msg: print(f"[quality +{time.time()-t0:7.1f}s] {msg}", flush=True)
    os.makedirs(args.workdir, exist_ok=True)

    # ---- 1. corpus + preprocess (host, numpy) ------------------------
    npz_dir = os.path.join(args.workdir, "npz")
    want = (args.train_combos * args.per_combo
            + args.heldout_combos * args.val_instances)
    if len(glob.glob(os.path.join(npz_dir, "*.npz"))) != want:
        log(f"generating compositional corpus: {args.train_combos} train + "
            f"{args.heldout_combos} held-out combos (v={args.n_values})")
        # heavy-chain CDRs in --cdrs drive the corpus: slot-driven sequence
        # AND conformation per listed loop (multi-CDR joint design);
        # unlisted loops stay deterministic framework-like regions
        from diffab_pytorch_tpu.data.synthetic import CDR_LOOP_RANGES

        loops = tuple(c for c in args.cdrs if c in CDR_LOOP_RANGES) or ("H3",)
        write_combo_corpus(
            args.workdir, n_values=args.n_values,
            n_train_combos=args.train_combos,
            n_heldout_combos=args.heldout_combos,
            n_per_combo=args.per_combo,
            n_val_instances=args.val_instances, seed=args.seed,
            cdr_loops=loops,
            seq_degeneracy=args.seq_degeneracy,
            decouple_shape=args.decouple_shape,
        )
        os.makedirs(npz_dir, exist_ok=True)
        for pdb_path in sorted(glob.glob(os.path.join(args.workdir, "pdb",
                                                      "*.pdb"))):
            pdb_id = os.path.splitext(os.path.basename(pdb_path))[0]
            process_one(
                pdb_path, os.path.join(npz_dir, f"{pdb_id}.npz"),
                "H", "L", "A", 128,
            )
        log(f"preprocessed {want} complexes")
    else:
        log(f"reusing {want} preprocessed complexes in {npz_dir}")

    # splits: c{i}_s{last} = held-out INSTANCES of trained combos;
    # h{i}_s* = held-out COMBINATIONS (never trained)
    all_paths = sorted(glob.glob(os.path.join(npz_dir, "*.npz")))
    stem = lambda p: os.path.splitext(os.path.basename(p))[0]
    val_instance_ids = {
        f"c{i}_s{args.per_combo - 1}" for i in range(args.train_combos)
    }
    train_paths = [
        p for p in all_paths
        if stem(p).startswith("c") and stem(p) not in val_instance_ids
    ]
    val_splits = {
        "val_instance": [p for p in all_paths if stem(p) in val_instance_ids],
        "val_combo": [p for p in all_paths if stem(p).startswith("h")],
    }
    log(f"split: {len(train_paths)} train / "
        f"{len(val_splits['val_instance'])} val_instance / "
        f"{len(val_splits['val_combo'])} val_combo patches")

    # cache=True: normalized samples stay in RAM after epoch 1, so the
    # host path is pure stacking — without it the single-core input
    # pipeline left the device idle ~2/3 of the time (VERDICT weak #4)
    train_ds = PatchDataset(train_paths, cdrs_to_generate=args.cdrs,
                            cache=True)
    val_ds = {
        split: PatchDataset(paths, cdrs_to_generate=args.cdrs)
        for split, paths in val_splits.items()
    }

    # ---- 2. model ------------------------------------------------------
    cfg = tiny_config() if args.smoke else default_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            compute_dtype="float32" if args.smoke else "bfloat16",
            self_conditioning=args.self_conditioning,
            self_conditioning_sequence=not args.sc_geometry_only,
            sc_late_fusion=args.sc_late_fusion,
            sc_split_trunk=args.sc_split_trunk,
            dist_atoms=args.dist_atoms,
            **({} if args.d_pair is None else {"d_pair_emb": args.d_pair}),
        ),
        train=TrainConfig(
            batch_size=args.bsz, lr=args.lr, seed=args.seed,
            grad_clip_norm=1.0, adam_eps=args.adam_eps,
            update_clip_rms=args.update_clip_rms,
            ema_decay=args.ema,
            # cosine decay over the whole run: the cure for the
            # late-training Adam spiral (config.py lr_decay_steps note)
            lr_warmup_steps=min(100, args.steps // 10),
            lr_decay_steps=args.steps,
            sc_rate=args.sc_rate,
            sc_onset_steps=args.sc_onset,
            sc_rate_warmup=args.sc_rate_warmup,
            sc_seq_loss_weight=args.sc_seq_loss_weight,
            sc_per_residue=args.sc_per_residue,
            mode_dropout=args.mode_dropout,
        ),
    )
    harness = DiffAb(cfg)
    sample0 = assemble_batch([train_ds[0]], args.cdrs)[0]
    state = harness.init(jax.random.key(args.seed), sample0)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    log(f"model: {n_params/1e6:.2f} M params, dtype={cfg.model.compute_dtype}, "
        f"backend={jax.default_backend()}")
    untrained_params = state.params

    # ---- 3. evaluation harness ------------------------------------------
    # ONE jitted program per sampling mode: reverse scan + all metrics.
    # Anything less (eager harness.sample / evaluate_designs per target)
    # pays a host round-trip per op on the tunneled backend — the original
    # version of this script spent 10+ minutes where this spends seconds.
    n_designs = args.designs_per_target

    def make_eval_fn(t_start, noise_scale=1.0, n_steps=None, **skw):
        gen_flags = dict(
            generate_structure=skw.get("generate_structure", True),
            generate_sequence=skw.get("generate_sequence", True),
        )

        def _eval(params, one, rep, cdr_idx, key):
            # shared-context fan-out: n designs of the one target, pair
            # tensors read once (round-2 flagship path); metrics compare
            # against the n-row replicated native batch
            res = harness.sample(params, one, key, t_start=t_start,
                                 noise_scale=noise_scale,
                                 n_designs=n_designs, n_steps=n_steps,
                                 **skw)
            m = evaluate_designs(
                res, rep, coord_scale=COORD_SCALE,
                cdr_idx=cdr_idx, cdrs=tuple(args.cdrs), align=False,
            )
            m["ca_rmsd_aligned"] = evaluate_designs(
                res, rep, coord_scale=COORD_SCALE, align=True
            )["ca_rmsd"]
            m["diversity"] = sequence_diversity(
                res.seq_idx, rep.generation_mask[0]
            )
            # validity of the geometry cli.sample actually ships (CA
            # continuity relaxation + designed-edge bond idealization),
            # next to the raw-frames validity evaluate_designs reports
            vi = validity_from_result(
                res, rep, coord_scale=COORD_SCALE, idealize=True,
                relax=True,
            )
            m["valid_idealized"] = vi["valid"]
            m["ca_break_idealized"] = vi["ca_break"]
            m["clash_idealized"] = vi["clash_count"]
            # model-based design ranking (sampling/scoring.py): does the
            # oracle-free score pick good designs?  rank_spearman > 0 means
            # lower score <-> lower RMSD; *_top1_by_score is what a user
            # who keeps only the best-scored design actually gets (compare
            # against ca_rmsd_best_of_n, the ground-truth oracle)
            sc = harness.score_designs(
                params, one, res, jax.random.fold_in(key, 12345),
                **gen_flags,
            )
            m["rank_spearman"] = spearman_corr(sc.score, m["ca_rmsd"])
            top1 = jnp.argmin(sc.score)
            m["ca_rmsd_top1_by_score"] = m["ca_rmsd"][top1]
            m["aar_top1_by_score"] = m["aar"][top1]
            return m

        return jax.jit(_eval)

    eval_fns = {
        "codesign": make_eval_fn(None),
        # deterministic posterior-mean chain: the precision mode — on this
        # corpus each context admits one right answer, so re-injected
        # posterior noise only costs geometry (measured 20.1 -> 0.8 A)
        "codesign_precise": make_eval_fn(None, noise_scale=0.0),
        # few-step: the 25-step respaced chain (4x design throughput);
        # quality cost measured next to the full-length chain
        "codesign_precise_25step": make_eval_fn(None, noise_scale=0.0,
                                                n_steps=25),
        # the round-3 stochastic recipe: full posterior noise, but only
        # after the deterministic high-t transport (scatter mechanism
        # diagnosed + killed, DESIGN.md round-3 scatter study: ns=1.0
        # scatter fraction 0.297 -> 0.021 with AAR/median unchanged)
        "codesign_ntmax50": make_eval_fn(None, noise_t_max=50),
        "optimize": make_eval_fn(args.t_restart),
    }
    if args.eval_fixed_modes:
        # the reference's two fixed-modality conditioning modes
        # (encode_context flags, diffab_pytorch.py:693-700): sequence
        # design on fixed geometry, and structure design on fixed
        # sequence.  RMSD is trivially ~0 for fix_structure and AAR
        # trivially 1 for fix_sequence — read the other column.
        eval_fns["fix_structure"] = make_eval_fn(
            None, generate_structure=False
        )
        eval_fns["fix_sequence"] = make_eval_fn(
            None, generate_sequence=False, noise_t_max=50
        )

    def eval_params(params, label):
        """Sample n_designs per target, both val splits, all modes."""
        out = {}
        for split, ds in val_ds.items():
            rows = {m: [] for m in eval_fns}
            n_targets = len(ds)
            take = np.linspace(
                0, n_targets - 1,
                min(n_targets, args.max_eval_targets),
            ).astype(int)
            for vi in np.unique(take):
                raw = ds[int(vi)]
                one, _ = assemble_batch([raw], args.cdrs)
                rep, _ = assemble_batch([raw] * n_designs, args.cdrs)
                cdr_idx = jnp.asarray(np.stack([raw["cdr_idx"]] * n_designs))
                key = jax.random.fold_in(
                    jax.random.key(args.seed + 7), vi
                )
                for mode, fn in eval_fns.items():
                    m = jax.device_get(fn(params, one, rep, cdr_idx, key))
                    rows[mode].append(m)
            out[split] = {}
            for mode in rows:
                agg = {}
                for k in rows[mode][0]:
                    vals = np.concatenate(
                        [np.atleast_1d(r[k]) for r in rows[mode]]
                    )
                    agg[k] = float(np.mean(vals))
                    agg[k + "_std"] = float(np.std(vals))
                    agg[k + "_median"] = float(np.median(vals))
                # per-target best-of-n (min RMSD over a target's designs,
                # averaged over targets): the metric a pick-the-best
                # design workflow sees.  The MEAN RMSD of stochastic modes
                # is dominated by a small scattered minority (median
                # ~0.25-0.29 A at every noise scale, probe 2026-08-17);
                # reporting only the mean misreads those modes.
                agg["ca_rmsd_best_of_n"] = float(np.mean(
                    [np.atleast_1d(r["ca_rmsd"]).min() for r in rows[mode]]
                ))
                out[split][mode] = agg
                log(f"{label}/{split}/{mode}: aar={agg['aar']:.3f} "
                    f"rmsd={agg['ca_rmsd']:.2f}A "
                    f"(med {agg['ca_rmsd_median']:.2f}, "
                    f"best {agg['ca_rmsd_best_of_n']:.2f}, "
                    f"top1-by-score {agg['ca_rmsd_top1_by_score']:.2f}, "
                    f"rho {agg['rank_spearman']:.2f}) "
                    f"valid={agg['valid']:.2f}"
                    f"/{agg['valid_idealized']:.2f}(ideal) "
                    f"div={agg['diversity']:.3f}")
        return out

    out_path = os.path.join(args.workdir, "quality.json")
    ckpt_dir = os.path.abspath(os.path.join(args.workdir, "checkpoints"))
    if args.eval_only:
        # re-measure sampling modes against an existing run's checkpoint
        # (e.g. a new few-step mode) without paying the retrain
        from diffab_pytorch_tpu.train.checkpoint import restore_params

        params, at_step = restore_params(ckpt_dir, state.params)
        log(f"eval-only: restored {ckpt_dir} @ step {at_step}")
        results = {}
        if os.path.exists(out_path):
            with open(out_path) as fh:
                results = json.load(fh)
        trained = eval_params(params, "trained")
        for split, modes in trained.items():
            results.setdefault("trained", {}).setdefault(split, {}).update(modes)
        results.setdefault("meta", {})["eval_only_step"] = at_step
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=2)
        log(f"wrote {out_path}")
        return 0

    from diffab_pytorch_tpu.train.checkpoint import (
        restore_checkpoint, save_model_config,
    )

    start_step = 0
    if args.resume:
        try:
            state = restore_checkpoint(ckpt_dir, state)
            start_step = int(state.step)
            log(f"resume: restored {ckpt_dir} @ step {start_step}")
        except FileNotFoundError:
            log("resume: no checkpoint found — training from scratch")

    results = None
    if args.resume and os.path.exists(out_path):
        with open(out_path) as fh:
            prev = json.load(fh)
        if "untrained" in prev:
            results = {"untrained": prev["untrained"]}
            log("resume: reloaded untrained-model eval from quality.json")
    if results is None and (args.skip_untrained or args.train_only):
        results = {"untrained": {}}
        log("skipping untrained-model eval (--skip-untrained)")
    if results is None:
        log("evaluating UNTRAINED model on both val splits")
        results = {"untrained": eval_params(untrained_params, "untrained")}
        # partial write: a mid-training crash/resume does not repay the
        # untrained eval (~10 min of sampling on the big corpora)
        with open(out_path, "w") as fh:
            json.dump({**results, "meta": {"partial": True}}, fh, indent=2)

    # ---- 4. train --------------------------------------------------------
    log(f"training: {args.steps} steps @ batch {args.bsz}")
    # Device-resident pool: the whole normalized corpus uploads once and
    # per-step batches are on-device gathers — on the tunneled backend the
    # per-step feature transfer was the binding cost (384 samples/s with
    # the prefetch loader vs ~790 device-resident, DESIGN.md §3).
    pool, _ = train_ds.device_pool()
    n_rows = pool.batch_size
    pool = jax.device_put(pool)
    log(f"device pool: {n_rows} samples resident")
    # donate=False so finite-state snapshots below stay valid buffers
    step_fn = harness.make_pool_train_step(donate=False)
    base_key = jax.random.key(args.seed + 1)
    idx_iter = train_ds.epoch_indices(
        args.bsz, n_rows=n_rows, shuffle=True, seed=args.seed
    )
    losses = []
    # Divergence guard: keep the last snapshot still NEAR the best loss
    # seen.  "Last finite" is not enough — a late-training Adam spiral can
    # leave the loss finite-but-exploded (measured: 0.52 -> 33,545 between
    # two logging points of a 24k-step sc run) and a finite-only fallback
    # would ship the exploded parameters.
    state_good, step_good, best_loss = state, start_step, float("inf")
    near_best = lambda v: np.isfinite(v) and v <= 3.0 * best_loss + 1.0
    # Mid-run checkpoints: the remote-compile tunnel can drop mid-training
    # and a 48k-step run without them loses everything.  The step counter
    # rides state.step, so --resume continues the identical RNG stream.
    ckpt_every = args.ckpt_every if args.ckpt_every else max(
        args.steps // 8, 1
    )
    t_train0 = time.time()
    for i, idx in enumerate(idx_iter):
        if i >= args.steps:
            break
        if i < start_step:
            continue  # consume the shuffle stream up to the restored step
        state, metrics = step_fn(state, pool, idx, base_key)
        if ckpt_every > 0 and (i + 1) % ckpt_every == 0 and \
                i + 1 < args.steps:
            save_checkpoint(ckpt_dir, state)
            save_model_config(ckpt_dir, cfg.model)
            log(f"mid-run checkpoint saved @ step {int(state.step)}")
        if i % max(1, args.steps // 20) == 0 or i == args.steps - 1:
            terms = {
                k.removeprefix("train/"): round(float(v), 4)
                for k, v in metrics.items()
            }
            losses.append({"step": i, **terms})
            log(f"step {i}: " + " ".join(f"{k}={v}" for k, v in terms.items()))
            if near_best(terms["loss"]):
                state_good, step_good = state, i
                best_loss = min(best_loss, terms["loss"])
    final_loss = losses[-1]["loss"] if losses else float("nan")
    if not near_best(final_loss):
        log(f"final loss {final_loss} is non-finite or far above the best "
            f"({best_loss}); falling back to the step-{step_good} snapshot")
        state = state_good
    train_wall = time.time() - t_train0
    steps_done = args.steps - start_step
    sps = steps_done * args.bsz / train_wall
    log(f"trained {steps_done} steps in {train_wall:.1f}s "
        f"({sps:.0f} samples/s incl. host input pipeline)")

    save_checkpoint(ckpt_dir, state)
    save_model_config(ckpt_dir, cfg.model)
    log(f"checkpoint saved to {ckpt_dir} @ step {int(state.step)}")

    if not args.train_only:
        log("evaluating TRAINED model on both val splits")
        eval_p = state.params if state.ema_params is None else state.ema_params
        results["trained"] = eval_params(eval_p, "trained")

    results["meta"] = {
        "corpus": "compositional",
        "n_values": args.n_values,
        "train_combos": args.train_combos,
        "heldout_combos": args.heldout_combos,
        "train_patches": len(train_paths),
        "val_patches": {k: len(v) for k, v in val_splits.items()},
        "designs_per_target": n_designs,
        "cdrs": args.cdrs,
        "decouple_shape": args.decouple_shape,
        "steps": args.steps,
        "batch_size": args.bsz,
        "lr": args.lr,
        "t_restart": args.t_restart,
        "seed": args.seed,
        "update_clip_rms": args.update_clip_rms,
        "ema_decay": args.ema,
        "params_m": n_params / 1e6,
        "self_conditioning": args.self_conditioning,
        "sc_schedule": {
            "late_fusion": args.sc_late_fusion,
            "split_trunk": args.sc_split_trunk,
            "rate": args.sc_rate, "onset": args.sc_onset,
            "rate_warmup": args.sc_rate_warmup,
            "seq_loss_weight": args.sc_seq_loss_weight,
            "per_residue": args.sc_per_residue,
        },
        "backend": jax.default_backend(),
        "compute_dtype": cfg.model.compute_dtype,
        "train_samples_per_sec": sps,
        "loss_curve": losses,
    }
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=2)
    log(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
