"""Design/optimization CLI: checkpoint + complex -> designed CDRs.

The user-facing surface for the sampler (the reference has NO generation
entry point — DiffAb.sample is a stub, diffab_pytorch.py:770-776).

Input: either a preprocessed .npz patch (--patch) or a raw PDB with chain
ids (--pdb/--heavy-chain-id/...; preprocessing runs inline).  Output: one
backbone PDB per design (denormalized coordinates, designed sequence) plus
a FASTA of designed sequences.

Modes:
  codesign (default)     sequence + structure of the chosen CDRs
  fix-sequence           structure only
  fix-structure          sequence only
  --t-restart T'         optimization by partial renoising from T' < T
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import jax
import numpy as np

from diffab_pytorch_tpu.config import default_config, tiny_config
from diffab_pytorch_tpu.constants import AA_THREE, THREE_TO_ONE
from diffab_pytorch_tpu.data.dataset import assemble_batch
from diffab_pytorch_tpu.parallel import make_mesh, sample_fanout_sharded
from diffab_pytorch_tpu.structure import antibody, featurize_patch, write_pdb
from diffab_pytorch_tpu.structure.patch import load_patch
from diffab_pytorch_tpu.train import DiffAb
from diffab_pytorch_tpu.train import checkpoint as ckpt_lib


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    src = p.add_argument_group("input")
    src.add_argument("--patch", help="Preprocessed .npz patch")
    src.add_argument("--pdb", help="Raw PDB (preprocessed inline)")
    src.add_argument("--heavy-chain-id", default=None)
    src.add_argument("--light-chain-id", default=None)
    src.add_argument("-a", "--antigen-chain-ids", default=None)

    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--cdrs", nargs="+", default=["H3"])
    p.add_argument("-n", "--n-samples", type=int, default=8)
    p.add_argument("--mode", choices=["codesign", "fix-sequence", "fix-structure"],
                   default="codesign")
    p.add_argument("--t-restart", type=int, default=None,
                   help="Optimization: renoise to this timestep (< T)")
    p.add_argument("--n-steps", type=int, default=None,
                   help="Few-step sampling: length of the strided reverse "
                        "chain (respaced posteriors; ~T/n_steps x faster)")
    p.add_argument("--noise-scale", type=float, default=1.0,
                   help="Posterior-noise std multiplier for the coordinate "
                        "reverse chain (1.0 exact DDPM; <1 trades design "
                        "diversity for geometric precision; 0 = "
                        "deterministic posterior-mean chain)")
    p.add_argument("--orientation-reverse", choices=["renoise", "posterior"],
                   default="renoise",
                   help="Frame reverse kernel: 'renoise' (DiffAb-paper "
                        "heuristic — full forward kernel at s on the "
                        "predicted frames) or 'posterior' (rotational "
                        "beta-tilde analogue — frame-memory chain with "
                        "posterior-matched noise; see "
                        "diffusion/orientation.py)")
    p.add_argument("--noise-t-max", type=int, default=None,
                   help="Defer coordinate posterior noise to steps "
                        "t <= this threshold (deterministic high-t "
                        "transport).  Cuts the ns=1.0 scattered-design "
                        "fraction 14x with AAR/median unchanged "
                        "(DESIGN.md round-3 scatter study; 50 is the "
                        "measured sweet spot on T=100).  Default: AUTO — "
                        "T//2 for full-length stochastic chains, off for "
                        "few-step chains (where it measures WORSE: the "
                        "respaced-jump scatter mechanism wants the "
                        "noise's dither) and for noise-scale 0.  Pass 0 "
                        "to force it off, or an explicit threshold")
    p.add_argument("--init", choices=["prior", "chord"], default="prior",
                   help="Generation start: 'prior' (pure noise at "
                        "t_start) or 'chord' (designed coordinates start "
                        "from the forward-noised anchor-anchor chord — "
                        "the structural prior between the context "
                        "residues flanking each designed span; built "
                        "from context only).  Pair with --t-restart < T "
                        "and optionally --n-steps: the measured fast "
                        "recipe '--init chord --t-restart 60 --n-steps "
                        "10 --noise-scale 0' holds full-length-recipe "
                        "quality at 1/10th the model evals "
                        "(DESIGN.md round-3)")
    p.add_argument("--chord-orientations", action="store_true",
                   help="With --init chord: designed FRAMES also start "
                        "from the forward-noised geodesic interpolation "
                        "between the flanking anchors' frames instead of "
                        "the uniform prior (context-only, same leakage "
                        "contract; measured trade in DESIGN.md round-3)")
    p.add_argument("--coord-solver", choices=["none", "ab2", "heun"],
                   default="none",
                   help="Higher-order coordinate solver for few-step "
                        "chains (sampling/sampler.py coord_solver): 'ab2' "
                        "second-order multistep (zero extra model evals), "
                        "'heun' predictor-corrector (one extra eval per "
                        "active step; bound the region with "
                        "--coord-solver-t-min)")
    p.add_argument("--coord-solver-t-min", type=int, default=0,
                   help="Apply the solver correction only at steps with "
                        "t above this threshold")
    p.add_argument("--step-schedule", choices=["uniform", "hight"],
                   default="uniform",
                   help="Few-step t-subsequence: 'uniform' striding or "
                        "'hight' (dense at high t where basin entry is "
                        "decided — trades median precision for a lower "
                        "scatter rate; see DESIGN.md)")
    p.add_argument("--n-fine-tail", type=int, default=None,
                   help="Few-step chains: run the final k timesteps at "
                        "stride 1 (the noisy segment of the round-4 fast "
                        "STOCHASTIC recipe '--init chord --t-restart 60 "
                        "--n-steps 22 --n-fine-tail 12 --noise-t-max 12 "
                        "--noise-scale 1' — full-recipe scatter/precision/"
                        "diversity at 22 evals, DESIGN.md §3)")
    p.add_argument("--x0-clip", default="auto",
                   help="Static thresholding of the implied clean coords "
                        "each reverse step: 'auto' (bound from the context "
                        "extent), a float (global box, normalized units), "
                        "or 'none'")
    p.add_argument("-s", "--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("-o", "--out-dir", default="designs")
    p.add_argument("--no-idealize", action="store_true",
                   help="Skip the peptide-bond idealization of designed "
                        "edges when writing PDBs")
    p.add_argument("--no-relax", action="store_true",
                   help="Skip the designed-CA continuity relaxation "
                        "(loop closure) before writing PDBs")
    p.add_argument("--data-parallel", action="store_true",
                   help="Fan designs out over all local devices")
    p.add_argument("--multihost", action="store_true",
                   help="Initialize jax.distributed for a multi-host pod; "
                        "with --data-parallel the fan-out spans the global "
                        "mesh, results are gathered, process 0 writes")
    p.add_argument("--rank", action="store_true",
                   help="Score every design with the model-based "
                        "likelihood ranking (sampling/scoring.py; no "
                        "ground truth needed) — outputs stay in design-"
                        "index order with score and rank annotated on "
                        "each FASTA header / scores.json entry (rank 0 "
                        "= best)")
    return p.parse_args(argv)


def resolve_noise_t_max(noise_t_max, *, T, n_steps, noise_scale):
    """--noise-t-max auto rule (measured, DESIGN.md round-3 scatter study).

    None (auto): full-length stochastic chains get the deferred-noise
    recipe (T//2 — scatter fraction 14x lower, AAR/median unchanged);
    few-step chains keep it OFF (the composition measures worse:
    respaced-jump scatter wants the noise's dither), as do deterministic
    (noise_scale=0) chains where it is a no-op.  0/negative forces off;
    explicit positive values pass through.
    """
    if noise_t_max is None:
        if n_steps is None and noise_scale > 0:
            return T // 2
        return None
    if noise_t_max <= 0:
        return None
    return noise_t_max


def main(argv=None) -> int:
    args = parse_args(argv)
    if args.multihost:
        jax.distributed.initialize()
        print(f"[sample] multihost: process {jax.process_index()} of "
              f"{jax.process_count()}, {jax.device_count()} global devices")

    if args.patch:
        sample_dict = load_patch(args.patch)
    elif args.pdb:
        complex_ = antibody.from_pdb(
            args.pdb,
            heavy_chain_id=args.heavy_chain_id,
            light_chain_id=args.light_chain_id,
            antigen_chain_ids=list(args.antigen_chain_ids or ""),
            keep_fv_only=True,
        )
        sample_dict = featurize_patch(complex_)
    else:
        print("need --patch or --pdb")
        return 2

    batch, norm = assemble_batch([sample_dict], cdrs_to_generate=args.cdrs)
    cfg = tiny_config() if args.tiny else default_config()
    # the checkpoint records its architecture (cli.train writes
    # model_config.json): restore the exact tree shape — a checkpoint
    # trained with e.g. self_conditioning has a wider fuse layer and would
    # not fit the default template
    saved_model = ckpt_lib.load_model_config(args.checkpoint_dir)
    if saved_model is not None:
        cfg = dataclasses.replace(cfg, model=saved_model)
        print(f"[sample] using the checkpoint's recorded model config"
              + (" (self-conditioning)" if saved_model.self_conditioning
                 else ""))
    harness = DiffAb(cfg)
    # params-only restore: sampling must not depend on the TrainConfig the
    # checkpoint was trained with (opt_state tree shape varies with it)
    template = harness.init(jax.random.key(0), batch).params
    params, step = ckpt_lib.restore_params(args.checkpoint_dir, template)
    print(f"[sample] restored checkpoint at step {step}")

    noise_t_max = resolve_noise_t_max(
        args.noise_t_max, T=cfg.diffusion.T, n_steps=args.n_steps,
        noise_scale=args.noise_scale,
    )
    if noise_t_max is not None and args.noise_t_max is None:
        print(f"[sample] deferred-noise recipe on: noise_t_max="
              f"{noise_t_max} (pass --noise-t-max 0 to disable)")

    kwargs = dict(
        generate_structure=args.mode != "fix-structure",
        generate_sequence=args.mode != "fix-sequence",
        t_start=args.t_restart,
        init=args.init,
        chord_orientations=args.chord_orientations,
        n_steps=args.n_steps,
        noise_scale=args.noise_scale,
        noise_t_max=noise_t_max,
        step_schedule=args.step_schedule,
        n_fine_tail=args.n_fine_tail,
        coord_solver=args.coord_solver,
        coord_solver_t_min=args.coord_solver_t_min,
        orientation_reverse=args.orientation_reverse,
        x0_clip=(
            None if str(args.x0_clip).lower() in ("none", "0")
            else "auto" if args.x0_clip == "auto"
            else float(args.x0_clip)
        ),
    )
    # n designs of ONE target: the shared-context fan-out (one copy of the
    # pair tensor / bias logits for all designs — sampling/sampler.py
    # n_designs; the old replicate_batch path tiled them n-fold)
    key = jax.random.key(args.seed)
    if args.data_parallel:
        mesh = make_mesh()
        result = sample_fanout_sharded(
            harness, params, batch, key, mesh,
            n_designs=args.n_samples, **kwargs,
        )
    else:
        result = jax.jit(
            lambda p, b, k: harness.sample(
                p, b, k, n_designs=args.n_samples, **kwargs
            )
        )(params, batch, key)

    if jax.process_count() > 1:
        # pod run: replicate the (dp-sharded) design rows to host on every
        # process, then let only process 0 do the host-side post-processing
        # and writes.  Fully-addressable leaves (the no-fan-out path, where
        # every process computed identical designs) convert directly —
        # process_allgather would stack per-process copies.
        from jax.experimental import multihost_utils

        def to_host(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return multihost_utils.process_allgather(x)
            return np.asarray(x)

        result = jax.tree.map(to_host, result)
        if jax.process_index() != 0:
            return 0

    os.makedirs(args.out_dir, exist_ok=True)
    scores = ranks = None
    if args.rank:
        # score the sampler's RAW output (before relax/idealize touch the
        # geometry): the score estimates the model's own likelihood of what
        # it generated.  Lower = better; comparable within this target.
        sc = jax.jit(
            lambda p, b, d, k: harness.score_designs(
                p, b, d, k,
                generate_structure=kwargs["generate_structure"],
                generate_sequence=kwargs["generate_sequence"],
            )
        )(params, batch, result, jax.random.key(args.seed + 1))
        scores = np.asarray(sc.score)
        order = np.argsort(scores)
        ranks = np.empty_like(order)
        ranks[order] = np.arange(len(order))
        import json

        with open(os.path.join(args.out_dir, "scores.json"), "w") as f:
            json.dump(
                {
                    f"design_{i:04d}": {
                        "score": float(scores[i]),
                        "seq_score": float(np.asarray(sc.seq_score)[i]),
                        "translations_score": float(
                            np.asarray(sc.translations_score)[i]
                        ),
                        "orientations_score": float(
                            np.asarray(sc.orientations_score)[i]
                        ),
                        "rank": int(ranks[i]),
                    }
                    for i in range(args.n_samples)
                },
                f, indent=2,
            )
        print(f"[sample] best design by model score: "
              f"design_{int(order[0]):04d} (score {scores[order[0]]:.4f})")
    if not args.no_relax and args.mode != "fix-structure":
        # designed-CA continuity projection (loop closure): repairs the
        # CA-CA anchor breaks that dominate validity failures of the
        # stochastic chains; a fixed point for already-valid geometry
        # (structure/relax.py).  Runs in normalized model units, before
        # the pose denormalization below.
        from diffab_pytorch_tpu.data.dataset import COORD_SCALE
        from diffab_pytorch_tpu.structure.relax import relax_ca

        n = args.n_samples
        rep = lambda a: jax.numpy.repeat(a, n, axis=0)
        relaxed = relax_ca(
            result.translations, rep(batch.residue_mask),
            rep(batch.chain_idx), rep(batch.residue_idx),
            rep(batch.generation_mask), coord_scale=COORD_SCALE,
        )
        result = dataclasses.replace(result, translations=relaxed)
    seqs = np.asarray(result.seq_idx)
    # invert the pose normalization (center + canonical rotation + scale)
    # for BOTH coordinates and frames — reconstruct_backbone places N/C/O
    # from the frames, so they must be expressed in the same (native) pose
    fan_norm = dataclasses.replace(
        norm,
        center=np.repeat(norm.center, args.n_samples, axis=0),
        rot=None if norm.rot is None
        else np.repeat(norm.rot, args.n_samples, axis=0),
    )
    xyz_ca = fan_norm.denormalize(np.asarray(result.translations))
    ori = fan_norm.denormalize_orientations(np.asarray(result.orientations))
    mask = np.asarray(batch.residue_mask[0])
    gen = np.asarray(batch.generation_mask[0])
    chain_idx = np.asarray(batch.chain_idx[0])
    chain_letters = ["?", "H", "L"] + [chr(ord("A") + i) for i in range(7)]

    from diffab_pytorch_tpu.structure import reconstruct_backbone
    from diffab_pytorch_tpu.structure.reconstruct import idealize_peptide_bonds

    # full backbone (N, CA, C, O) reconstructed from the designed frames;
    # context residues keep their original atoms
    fasta_lines = []
    for i in range(args.n_samples):
        L = seqs.shape[1]
        xyz, am = reconstruct_backbone(ori[i], xyz_ca[i])
        orig_xyz = np.asarray(sample_dict["xyz"], np.float32)
        orig_mask = np.asarray(sample_dict["atom_mask"], bool)
        xyz = np.where(gen[:, None, None], xyz, orig_xyz)
        am = np.where(gen[:, None], am, orig_mask)
        if not args.no_idealize:
            # snap designed-edge peptide bonds to the ideal length (the
            # standard idealization pass; CA positions and native context
            # are untouched — structure/reconstruct.py)
            xyz = idealize_peptide_bonds(
                xyz, am, np.asarray(sample_dict["chain_idx"]),
                np.asarray(sample_dict["residue_idx"]), edge_mask=gen,
            )
        pdb_path = os.path.join(args.out_dir, f"design_{i:04d}.pdb")
        icodes = sample_dict.get("icode")
        write_pdb(
            pdb_path,
            xyz[mask],
            am[mask],
            seqs[i][mask],
            [chain_letters[c] for c in chain_idx[mask]],
            np.asarray(sample_dict["residue_number"])[mask],
            icodes=None if icodes is None else np.asarray(icodes)[mask],
        )
        cdr_seq = "".join(
            THREE_TO_ONE.get(AA_THREE[s], "X") if s < 20 else "X"
            for s in seqs[i][gen]
        )
        header = f">design_{i:04d} cdrs={'+'.join(args.cdrs)}"
        if scores is not None:
            header += f" score={scores[i]:.4f} rank={int(ranks[i])}"
        fasta_lines.append(header)
        fasta_lines.append(cdr_seq)
        print(f"design {i:04d}: {cdr_seq}"
              + (f" score={scores[i]:.4f}" if scores is not None else ""))

    with open(os.path.join(args.out_dir, "designs.fasta"), "w") as f:
        f.write("\n".join(fasta_lines) + "\n")
    print(f"[sample] wrote {args.n_samples} designs to {args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
