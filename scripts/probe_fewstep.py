"""Probe: few-step sampling quality vs chain length / schedule / noise.

Loads the quality_combo12k checkpoint and evaluates a handful of val_combo
targets under a grid of few-step configurations, printing AAR / CA-RMSD /
shipped validity per config.  Exploratory companion to quality_run.py
(whose --eval-only mode records the chosen configs in quality.json).

Run on the TPU chip:  python scripts/probe_fewstep.py
"""

import glob
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffab_pytorch_tpu.config import default_config
    from diffab_pytorch_tpu.data.dataset import (
        COORD_SCALE, PatchDataset, assemble_batch,
    )
    from diffab_pytorch_tpu.evaluation import (
        evaluate_designs, validity_from_result,
    )
    from diffab_pytorch_tpu.train import DiffAb
    from diffab_pytorch_tpu.train.checkpoint import restore_params

    workdir = sys.argv[1] if len(sys.argv) > 1 else "runs/quality_combo12k"
    n_targets = 8
    n_designs = 8

    harness = DiffAb(default_config())
    paths = sorted(glob.glob(os.path.join(workdir, "npz", "h*.npz")))
    ds = PatchDataset(paths, cdrs_to_generate=["H3"])
    raw0 = ds[0]
    one0, _ = assemble_batch([raw0], ["H3"])
    template = harness.init(jax.random.key(0), one0).params
    params, step = restore_params(
        os.path.join(workdir, "checkpoints"), template
    )
    print(f"[probe] checkpoint @ step {step}; {len(ds)} val_combo targets")

    # A quadratic (low-t-dense) respacing was probed alongside these and
    # measured strictly worse than uniform striding at every step count
    # (25-step: AAR 0.814 vs 0.959, RMSD 34.7 vs 17.7 A) — see DESIGN.md §3;
    # the sampler therefore keeps only the uniform schedule.
    configs = [
        ("full ns=0", dict(noise_scale=0.0)),
        ("50 lin ns=0", dict(noise_scale=0.0, n_steps=50)),
        ("25 lin ns=0", dict(noise_scale=0.0, n_steps=25)),
        ("25 lin ns=1", dict(noise_scale=1.0, n_steps=25)),
        ("10 lin ns=0", dict(noise_scale=0.0, n_steps=10)),
    ]

    def make_fn(kw):
        def _eval(params, one, rep, key):
            res = harness.sample(params, one, key, n_designs=n_designs, **kw)
            m = evaluate_designs(res, rep, coord_scale=COORD_SCALE)
            vi = validity_from_result(
                res, rep, coord_scale=COORD_SCALE, idealize=True, relax=True
            )
            return {"aar": m["aar"], "rmsd": m["ca_rmsd"],
                    "valid": vi["valid"]}
        return jax.jit(_eval)

    take = np.linspace(0, len(ds) - 1, n_targets).astype(int)
    targets = []
    for vi in np.unique(take):
        raw = ds[int(vi)]
        one, _ = assemble_batch([raw], ["H3"])
        rep, _ = assemble_batch([raw] * n_designs, ["H3"])
        targets.append((vi, one, rep))

    for name, kw in configs:
        fn = make_fn(kw)
        t0 = time.time()
        rows = []
        for vi, one, rep in targets:
            key = jax.random.fold_in(jax.random.key(7), int(vi))
            rows.append(jax.device_get(fn(params, one, rep, key)))
        agg = {k: float(np.mean(np.concatenate(
            [np.atleast_1d(r[k]) for r in rows]))) for k in rows[0]}
        print(f"[probe] {name:14s} aar={agg['aar']:.3f} "
              f"rmsd={agg['rmsd']:6.2f}A valid={agg['valid']:.2f} "
              f"({time.time()-t0:.0f}s incl compile)", flush=True)


if __name__ == "__main__":
    main()
