"""Trajectory-level diagnosis of the scattered-design tail (round-3 #1).

QUALITY.md's scatter facts: stochastic/few-step modes put a minority of
designs at 10-200 A while the median stays at ~0.3 A, and ONLY the
scattered fraction moves with noise_scale.  Every shipped mitigation
(ranking, relax, best-of-n) is downstream.  This probe uses
sample(return_trajectory=True) — never exploited before — to localize the
mechanism:

  * WHEN: at which reverse step does a scattered chain leave (or fail to
    enter) the sub-2A basin?
  * WHICH modality moves first: CA positions, frames, or sequence?
  * WHAT correlates: x0_clip saturation (max |x| near the bound) at high
    t?  orientation noise at mid t?

All per-step statistics are reduced IN-JIT — the raw (T, n, L, ...)
trajectories never cross the tunnel; only (T, n) curves do.

It also A/Bs the round-3 orientation posterior reverse mode
(diffusion/orientation.py reverse_step mode="posterior" — the rotational
beta-tilde analogue; a sampling-time-only change, so the SAME checkpoint
serves both arms).

Usage (against a finished quality run's checkpoint + corpus):
  python scripts/probe_scatter.py --workdir runs/quality_combo12k
Writes {workdir}/scatter_probe.json.
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
    p.add_argument("--targets", type=int, default=12,
                   help="val_combo targets to probe")
    p.add_argument("--designs", type=int, default=16,
                   help="designs per target (trajectory fan-out)")
    p.add_argument("--cdrs", nargs="+", default=["H3"])
    p.add_argument("--scatter-thresh", type=float, default=2.0,
                   help="final CA-RMSD (A) above which a design counts as "
                        "scattered")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--smoke", action="store_true",
                   help="CPU backend + tiny checkpoint-free self-check")
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
    from diffab_pytorch_tpu.geometry import so3
    from diffab_pytorch_tpu.train import DiffAb
    from diffab_pytorch_tpu.train import checkpoint as ckpt_lib

    t0 = time.time()
    log = lambda m: print(f"[scatter +{time.time()-t0:7.1f}s] {m}", flush=True)

    # ---- checkpoint + corpus -------------------------------------------
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
    log(f"restored {ckpt_dir} @ step {at_step}; "
        f"{len(val_paths)} targets x {args.designs} designs")

    n = args.designs

    # ---- jitted trajectory-statistics program per mode ------------------
    def make_fn(noise_scale, n_steps, orientation_reverse):
        def _fn(params, one, rep, key):
            res = harness.sample(
                params, one, key, n_designs=n, noise_scale=noise_scale,
                n_steps=n_steps, return_trajectory=True,
                orientation_reverse=orientation_reverse,
            )
            gen = rep.generation_mask & rep.residue_mask  # (n, L)
            denom = jnp.maximum(gen.sum(-1), 1)  # (n,)

            xt = res.translations_trajectory  # (T, n, L, 3)
            diff = (xt - rep.translations[None]) * COORD_SCALE
            sq = (diff**2).sum(-1)
            rmsd_t = jnp.sqrt((sq * gen[None]).sum(-1) / denom[None])  # (T, n)

            rt = res.orientations_trajectory  # (T, n, L, 3, 3)
            rel = jnp.einsum("...ji,...jk->...ik", rep.orientations[None], rt)
            ang = jnp.linalg.norm(so3.rotation_matrix_to_vector(rel), axis=-1)
            orient_err_t = (ang * gen[None]).sum(-1) / denom[None]  # rad

            match = (res.seq_trajectory == rep.seq_idx[None]) & gen[None]
            seq_match_t = match.sum(-1) / denom[None]

            max_abs_t = jnp.max(
                jnp.where(gen[None, :, :, None], jnp.abs(xt), 0.0),
                axis=(2, 3),
            )  # normalized units, vs the x0_clip bound

            # context extent -> the auto x0_clip bound actually used
            ctx = rep.residue_mask & ~rep.generation_mask
            bound = 1.5 * jnp.maximum(jnp.max(jnp.where(
                ctx[..., None], jnp.abs(rep.translations), 0.0), axis=(1, 2)),
                1.0)  # (n,)

            return dict(rmsd_t=rmsd_t, orient_err_t=orient_err_t,
                        seq_match_t=seq_match_t, max_abs_t=max_abs_t,
                        clip_bound=bound)

        return jax.jit(_fn)

    modes = {
        "ns1_renoise": make_fn(1.0, None, "renoise"),
        "ns1_posterior": make_fn(1.0, None, "posterior"),
        "ns0_25step_renoise": make_fn(0.0, 25, "renoise"),
        "ns0_25step_posterior": make_fn(0.0, 25, "posterior"),
    }

    # ---- run ------------------------------------------------------------
    raw = {m: [] for m in modes}
    for vi in range(len(ds)):
        one, _ = assemble_batch([ds[vi]], args.cdrs)
        rep, _ = assemble_batch([ds[vi]] * n, args.cdrs)
        key = jax.random.fold_in(jax.random.key(args.seed + 7), vi)
        for mode, fn in modes.items():
            raw[mode].append(jax.device_get(fn(params, one, rep, key)))
        if vi == 0:
            log(f"first target done (all mode compiles paid)")
    log("sampling done; analyzing")

    # ---- host analysis ---------------------------------------------------
    out = {"meta": {
        "workdir": args.workdir, "checkpoint_step": at_step,
        "targets": len(ds), "designs_per_target": n,
        "scatter_thresh_A": args.scatter_thresh, "cdrs": args.cdrs,
    }}
    thr = args.scatter_thresh
    for mode in modes:
        rmsd = np.concatenate([r["rmsd_t"] for r in raw[mode]], axis=1)  # (T, N)
        orient = np.concatenate([r["orient_err_t"] for r in raw[mode]], axis=1)
        seqm = np.concatenate([r["seq_match_t"] for r in raw[mode]], axis=1)
        maxab = np.concatenate([r["max_abs_t"] for r in raw[mode]], axis=1)
        bound = np.concatenate([r["clip_bound"] for r in raw[mode]])
        T, N = rmsd.shape
        final = rmsd[-1]
        scat = final > thr

        def curves(sel):
            if sel.sum() == 0:
                return None
            return {
                "rmsd_t": rmsd[:, sel].mean(1).round(3).tolist(),
                "orient_err_t": orient[:, sel].mean(1).round(4).tolist(),
                "seq_match_t": seqm[:, sel].mean(1).round(3).tolist(),
                "max_abs_over_bound_t": (
                    (maxab[:, sel] / bound[None, sel]).mean(1).round(3).tolist()
                ),
            }

        # basin-entry bookkeeping per design, in scan order (t descending):
        # ever_in: ever below threshold; entry: first step below; exit:
        # entered then finished above (left the basin) vs never entered
        below = rmsd < thr
        ever_in = below.any(0)
        entry = np.where(ever_in, below.argmax(0), -1)
        left = ever_in & scat
        never = (~ever_in) & scat
        # for leavers: last step that was still below the threshold
        last_in = np.where(
            ever_in, (T - 1) - below[::-1].argmax(0), -1
        )

        m = {
            "n_designs": int(N),
            "scatter_fraction": float(scat.mean()),
            "final_rmsd_mean": float(final.mean()),
            "final_rmsd_median": float(np.median(final)),
            "aar_final": float(seqm[-1].mean()),
            "n_scattered": int(scat.sum()),
            "n_never_entered_basin": int(never.sum()),
            "n_entered_then_left": int(left.sum()),
            "entry_step_clean_mean": (
                float(entry[ever_in & ~scat].mean()) if (ever_in & ~scat).any() else None
            ),
            "entry_step_scattered_mean": (
                float(entry[ever_in & scat].mean()) if (ever_in & scat).any() else None
            ),
            "leave_step_mean": (
                float(last_in[left].mean()) if left.any() else None
            ),
            "curves_clean": curves(~scat),
            "curves_scattered": curves(scat),
            "final_rmsd_scattered": np.sort(final[scat])[::-1][:20].round(1).tolist(),
        }
        out[mode] = m
        log(f"{mode}: scatter {m['scatter_fraction']:.3f} "
            f"({m['n_never_entered_basin']} never-entered / "
            f"{m['n_entered_then_left']} left), mean {m['final_rmsd_mean']:.2f} "
            f"med {m['final_rmsd_median']:.2f} A, AAR {m['aar_final']:.3f}")

    path = os.path.join(args.workdir, "scatter_probe.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    log(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
