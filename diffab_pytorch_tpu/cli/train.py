"""Training CLI.

TPU-native equivalent of reference `python -m diffab_pytorch.train`
(train.py:14-43 flags, :46-108 main).  Differences: trains from
preprocessed .npz patches (run `python -m diffab_pytorch_tpu.cli.preprocess`
first) instead of re-parsing PDBs per batch; --learning-rate actually
reaches the optimizer (the reference parses but drops it, SURVEY.md
§2.9#2); checkpointing and resume are explicit.

Example:
  python -m diffab_pytorch_tpu.cli.train \
      --data-dir data/preprocessed --cdrs H3 -b 16 -e 60
"""

from __future__ import annotations

import argparse
import dataclasses

import numpy as np

from diffab_pytorch_tpu.config import (
    DiffAbConfig,
    TrainConfig,
    default_config,
    production_config,
    tiny_config,
)
from diffab_pytorch_tpu.data.dataset import PatchDataset
from diffab_pytorch_tpu.train import DiffAb
from diffab_pytorch_tpu.train import checkpoint as ckpt_lib
from diffab_pytorch_tpu.train.trainer import fit
from diffab_pytorch_tpu.utils.logging import MetricLogger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", required=True,
                   help="Directory of preprocessed .npz patches")
    p.add_argument("--cdrs", nargs="+", default=["H3"],
                   help="CDRs to generate (subset of H1 H2 H3 L1 L2 L3)")
    p.add_argument("--val-pct", type=float, default=0.1)
    p.add_argument("--no-cache-data", action="store_true",
                   help="Disable the in-RAM normalized-sample cache "
                        "(~35 KB/sample; keeps the single-core host "
                        "pipeline from starving the device)")
    p.add_argument("--device-pool", action="store_true",
                   help="Upload the whole dataset to the device once and "
                        "gather batches on device (per-step transfer = "
                        "4*batch index bytes; ~165 KB HBM per sample). "
                        "Fastest option on tunneled/remote backends.")
    p.add_argument("--production", action="store_true",
                   help="Start from config.production_config(): the "
                        "measured-best recipe (dist_atoms=4, d_pair 48, "
                        "bf16, lr 6e-4 warmup+cosine over the run, "
                        "grad/update clipping, EMA, mode dropout — every "
                        "piece quality-gated, DESIGN.md §3 / QUALITY.md). "
                        "Explicit recipe flags below still override.")
    p.add_argument("-b", "--bsz", type=int, default=None,
                   help="Batch size (default 16; 32 under --production)")
    p.add_argument("-e", "--epochs", type=int, default=60)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("-l", "--learning-rate", type=float, default=None,
                   help="Peak lr (default 1e-4, the reference's value; "
                        "6e-4 under --production where the cosine decay "
                        "makes it stable)")
    p.add_argument("--grad-clip", type=float, default=None,
                   help="Global grad-norm clip (default 0 = off; 1.0 "
                        "under --production)")
    p.add_argument("--update-clip-rms", type=float, default=1.0,
                   help="Per-leaf RMS cap on the Adam-normalized update "
                        "(TrainConfig.update_clip_rms) — bounds per-step "
                        "parameter movement at ~cap*lr; the measured "
                        "counter to late-training Adam spirals (default "
                        "ON per the QUALITY.md seed matrix).  0 off")
    p.add_argument("--ema", type=float, default=0.999,
                   help="Parameter-EMA decay (TrainConfig.ema_decay); "
                        "checkpoints then carry EMA weights, which "
                        "cli.sample/evaluate prefer at restore (robust "
                        "default, QUALITY.md seed matrix).  0 off")
    p.add_argument("--seq-ce-weight", type=float, default=1.0,
                   help="D3PM hybrid loss: weight of the direct CE on "
                        "p_hat(s_0); 0 = the reference's pure-KL objective")
    p.add_argument("--lr-warmup-steps", type=int, default=None,
                   help="Warmup steps (default 0; min(100, steps/10) "
                        "under --production)")
    p.add_argument("--lr-decay-steps", type=int, default=None,
                   help="Cosine-decay horizon (includes warmup); 0 = "
                        "constant lr (the default; under --production the "
                        "full planned horizon).  Recommended = total "
                        "planned steps (prevents the late-training Adam "
                        "instability)")
    p.add_argument("-s", "--seed", type=int, default=42)
    p.add_argument("--tiny", action="store_true",
                   help="Tiny model preset (BASELINE config #1)")
    p.add_argument("--mode-dropout", type=float, default=None,
                   help="Context-mode dropout: probability each that a "
                        "training sample is presented as fix-structure / "
                        "fix-sequence instead of codesign, so one "
                        "checkpoint supports all three conditioning modes "
                        "at sampling time (TrainConfig.mode_dropout; "
                        "default 0; 0.15 under --production)")
    p.add_argument("--self-conditioning", action="store_true",
                   help="Train with self-conditioning (feeds the previous "
                        "denoising estimate back in; ~1.3x step cost, "
                        "measured ~3x lower scatter — QUALITY.md)")
    p.add_argument("--sc-geometry-only", action="store_true",
                   help="Self-conditioning features exclude the predicted "
                        "p(s_0) — the multi-loop recipe (QUALITY.md)")
    p.add_argument("--sc-late-fusion", action="store_true",
                   help="Inject the conditioned features after the IPA "
                        "trunk, geometry heads only — the sequence head "
                        "trains fully cold (ModelConfig.sc_late_fusion; "
                        "round-4 attribution lever, QUALITY.md)")
    p.add_argument("--sc-split-trunk", action="store_true",
                   help="Separate geometry trunk for the conditioned "
                        "pathway — full architectural isolation of the "
                        "sequence head, ~2x trunk params "
                        "(ModelConfig.sc_split_trunk, QUALITY.md round 5)")
    p.add_argument("--sc-rate", type=float, default=0.5,
                   help="Fraction of each batch trained conditioned "
                        "(TrainConfig.sc_rate; the Chen et al. recipe is 0.5)")
    p.add_argument("--sc-onset", type=int, default=0,
                   help="Steps trained fully cold before self-conditioning "
                        "starts (late-onset sc; TrainConfig.sc_onset_steps)")
    p.add_argument("--sc-rate-warmup", type=int, default=0,
                   help="Steps to ramp the sc rate 0 -> sc-rate after onset "
                        "(annealed sc; TrainConfig.sc_rate_warmup)")
    p.add_argument("--sc-seq-loss-weight", type=float, default=1.0,
                   help="Weight of the sequence losses (KL + CE) on the "
                        "conditioned half of the batch; <1 keeps the "
                        "sequence head's gradient dominated by the cold "
                        "half (TrainConfig.sc_seq_loss_weight)")
    p.add_argument("--sc-per-residue", action="store_true",
                   help="Draw the self-conditioning mask per RESIDUE "
                        "instead of per sample — every sample keeps cold "
                        "rows (TrainConfig.sc_per_residue)")
    p.add_argument("--adam-eps", type=float, default=1e-8,
                   help="Adam epsilon; raising it (e.g. 1e-5) bounds the "
                        "late-training tiny-second-moment spiral "
                        "(TrainConfig.adam_eps)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (MXU-native; params stay f32)")
    p.add_argument("--dist-atoms", type=int, default=-1,
                   help="Atoms entering the pair DISTANCE feature (by "
                        "index; 4 = backbone N/CA/C/O).  Default: all "
                        "n_atoms (the reference's 225-channel kernel; "
                        "4 under --production).  Narrowing cuts the "
                        "dominant train-side HBM streams "
                        "(ModelConfig.dist_atoms; DESIGN.md §3); 0 "
                        "forces all-atom explicitly")
    p.add_argument("--d-pair", type=int, default=None,
                   help="Pair-embedding width (ModelConfig.d_pair_emb; "
                        "default 64, the reference's value; 48 under "
                        "--production — +7-9%% samples/s, quality-gated "
                        "in QUALITY.md)")
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--csv", default=None, help="Metrics CSV path")
    p.add_argument("--wandb", action="store_true", default=False)
    p.add_argument("--data-parallel", action="store_true",
                   help="Shard the batch over all local devices")
    p.add_argument("--multihost", action="store_true",
                   help="Initialize jax.distributed for a multi-host pod "
                        "(coordinator/process env per JAX conventions)")
    return p.parse_args(argv)


def build_config(args, horizon: int = 0) -> DiffAbConfig:
    """Resolve flags into a DiffAbConfig.

    Recipe flags default to None (or -1 for --dist-atoms, where None
    means all-atom) so --production can fill them from
    production_config() while explicit user values always win.
    ``horizon`` = total planned optimizer steps (for the production
    cosine-decay default; 0 = unknown).
    """
    prod = production_config(steps=max(horizon, 1)) if args.production \
        else None
    if args.tiny:
        cfg = tiny_config()
    elif args.production:
        cfg = prod
    else:
        cfg = default_config()

    def pick(user, prod_value, plain_default):
        if user is not None:
            return user
        return prod_value if prod is not None else plain_default

    train = TrainConfig(
        batch_size=pick(args.bsz, prod.train.batch_size if prod else 0, 16),
        epochs=args.epochs,
        lr=pick(args.learning_rate, prod.train.lr if prod else 0, 1e-4),
        grad_clip_norm=pick(args.grad_clip,
                            prod.train.grad_clip_norm if prod else 0, 0.0),
        seq_ce_weight=args.seq_ce_weight,
        lr_warmup_steps=pick(args.lr_warmup_steps,
                             prod.train.lr_warmup_steps if prod else 0, 0),
        lr_decay_steps=pick(args.lr_decay_steps,
                            prod.train.lr_decay_steps if prod else 0, 0),
        seed=args.seed,
        val_pct=args.val_pct,
        checkpoint_dir=args.checkpoint_dir,
        mode_dropout=pick(args.mode_dropout,
                          prod.train.mode_dropout if prod else 0, 0.0),
        sc_rate=args.sc_rate,
        sc_onset_steps=args.sc_onset,
        sc_rate_warmup=args.sc_rate_warmup,
        sc_seq_loss_weight=args.sc_seq_loss_weight,
        sc_per_residue=args.sc_per_residue,
        adam_eps=args.adam_eps,
        update_clip_rms=args.update_clip_rms,
        ema_decay=args.ema,
    )
    cfg = dataclasses.replace(cfg, train=train)
    if args.bf16 or args.production:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, compute_dtype="bfloat16")
        )
    dist_atoms = args.dist_atoms
    if dist_atoms == -1:  # unset: production default 4, else all-atom
        dist_atoms = 4 if args.production else None
    elif dist_atoms == 0:  # explicit all-atom
        dist_atoms = None
    if dist_atoms != cfg.model.dist_atoms:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, dist_atoms=dist_atoms)
        )
    if args.d_pair is not None:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, d_pair_emb=args.d_pair)
        )
    if args.self_conditioning:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, self_conditioning=True,
                self_conditioning_sequence=not args.sc_geometry_only,
                sc_late_fusion=args.sc_late_fusion,
                sc_split_trunk=args.sc_split_trunk,
            )
        )
    return cfg


def main(argv=None) -> int:
    args = parse_args(argv)
    if args.multihost:
        import jax

        jax.distributed.initialize()
        print(f"[train] multihost: process {jax.process_index()} of "
              f"{jax.process_count()}, {jax.device_count()} global devices")

    ds = PatchDataset.from_dir(args.data_dir, cdrs_to_generate=args.cdrs)
    if len(ds) == 0:
        print(f"no .npz patches under {args.data_dir}")
        return 1
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(ds.paths))
    n_val = int(len(order) * args.val_pct)
    val_paths = [ds.paths[i] for i in order[:n_val]]
    train_paths = [ds.paths[i] for i in order[n_val:]]

    # total planned optimizer steps — the production preset's cosine
    # horizon (peak lr 6e-4 is only stable decaying over the full run)
    bsz = args.bsz or (32 if args.production else 16)
    steps_per_epoch = max(len(train_paths) // max(bsz, 1), 1)
    horizon = args.max_steps or args.epochs * steps_per_epoch
    cfg = build_config(args, horizon=horizon)
    train_ds = PatchDataset(train_paths, cdrs_to_generate=args.cdrs,
                            cache=not args.no_cache_data)
    val_ds = PatchDataset(val_paths, cdrs_to_generate=args.cdrs) if n_val else None

    harness = DiffAb(cfg)
    # record the architecture next to the weights so inference CLIs can
    # rebuild the exact parameter tree without re-supplying flags
    # (process 0 only on a pod — identical content, avoid the write race)
    import jax

    if jax.process_index() == 0:
        ckpt_lib.save_model_config(args.checkpoint_dir, cfg.model)
    logger = MetricLogger(
        csv_path=args.csv, use_wandb=args.wandb,
        config=dataclasses.asdict(cfg), print_every=cfg.train.log_every,
    )

    sharding = None
    train_step = None
    if args.data_parallel:
        from diffab_pytorch_tpu.parallel import make_mesh, make_dp_train_step, batch_sharding

        mesh = make_mesh()
        sharding = batch_sharding(mesh)
        train_step = make_dp_train_step(harness, mesh)

    fit(
        harness,
        train_ds,
        val_ds,
        epochs=args.epochs,
        max_steps=args.max_steps,
        logger=logger,
        checkpoint_dir=args.checkpoint_dir,
        resume=not args.no_resume,
        sharding=sharding,
        train_step=train_step,
        device_pool=args.device_pool,
    )
    logger.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
