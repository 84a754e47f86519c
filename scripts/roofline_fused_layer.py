"""Roofline the fused IPA layer kernel ITSELF (round-4 VERDICT weak #3).

The r4 trace attributes ~47-52% of the reverse scan's device time to the
six `fused_ipa_layer` Pallas calls (runs/profile_r4b/sample_top_ops.json:
~227 us per call at n=128 fan-out, 100 calls per layer per batch), but no
committed artifact said whether the kernel is at ITS OWN limit.  This
script closes that:

  1. an itemized analytic FLOP and HBM-byte ledger for ONE kernel call
     (what is inside the kernel per ops/ipa_pallas.py _fused_layer_kernel:
     the six projections, frame transforms, augmented-logit contraction,
     softmax, scalar/point value reductions, inverse-frame transform, and
     the scalar/point/norm slices of the output projection — the pair-row
     reduction and pair out-slice run OUTSIDE in XLA);
  2. the measured per-call microseconds, read from the committed r4b
     trace (and optionally re-measured standalone);
  3. attainment vs the chip's peak FLOP/s, peak HBM BW, and — the number
     that matters — vs the kernel's OWN roofline at its arithmetic
     intensity: min(peak_flops, AI * peak_bw);
  4. (--ab) the one named in-kernel lever that is a config knob:
     DESIGNS_PER_BLOCK re-tuned at the n=512 fast-recipe width (the r2b
     sweep picked db=4 at n=128; short chains at n=512 have 4x the grid
     cells, so per-cell weight re-fetch amortization changes).

Usage:
  python scripts/roofline_fused_layer.py                  # analytic only
  timeout 1500 python scripts/roofline_fused_layer.py --ab  # + on-device
Writes runs/r5_roofline/fused_kernel_roofline.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def kernel_call_ledger(cfg, b: int, L: int) -> dict:
    """Itemized FLOPs and HBM bytes of ONE fused_ipa_layer call.

    b = total design rows (n_designs * n_targets).  Mirrors
    ops/ipa_pallas.py _fused_layer_kernel / _x_project_kernel: per grid
    cell (db designs), the kernel reads the x block + frames + weight
    blocks, runs everything in VMEM, and writes the bf16 attention
    weights + the (db, L, d) accumulator.  The bias block is fetched once
    per TARGET (constant BlockSpec index across the design axis — Pallas
    skips revisited blocks), not per cell.
    """
    m = cfg.model
    h, ds = m.n_head, m.d_scalar_per_head
    pq, pv = m.n_query_point_per_head, m.n_value_point_per_head
    d, dp = m.d_residue_emb, m.d_pair_emb
    bl, bhll = b * L, b * h * L * L

    # --- FLOPs (2*m*n*k per dot) -------------------------------------
    # augmented contraction width: ds + 3*pq + 3 (sq-norm / ones / mask
    # rows), zero-padded to a multiple of 16 lanes (_layer_kernel f_aug)
    f_aug = ds + 3 * pq + 3
    f_aug_padded = -(-f_aug // 16) * 16
    flops = {
        # fused projections per design: x (L, d) against wq|wk|wv with
        # widths h*(ds+3*pq) twice + h*(ds+3*pv) once
        "projections": 2 * bl * d * (3 * h * ds + 2 * h * pq * 3
                                     + h * pv * 3),
        # augmented logit contraction: q_aug (h, L, F) . k_aug (h, F, L)
        "attn_logits": 2 * bhll * f_aug_padded,
        # attention-weighted reductions inside the kernel: scalar values
        # (ds) and value points (3*pv) — the pair-row reduction is OUTSIDE
        "attn_values": 2 * bhll * (ds + 3 * pv),
        # frame transforms: q/k/v points into global + the inverse for
        # outputs — 4 transforms of (bl, h, P, 3) at ~18 flops per point
        "frame_transforms": 4 * bl * h * max(pq, pv) * 18,
        # softmax (max + exp + sum + div) over (b, h, L, L)
        "softmax": 4 * bhll,
        # output projection inside the kernel: the scalar/point/norm
        # slices — (bl, h*ds + h*pv*3 + h*pv) @ (., d)
        "out_projection": 2 * bl * (h * ds + h * pv * 3 + h * pv) * d,
    }

    # --- HBM bytes ----------------------------------------------------
    db = 4  # DESIGNS_PER_BLOCK auto pick (ops/ipa_pallas.py)
    cells = max(b // db, 1)
    w_cols = 3 * h * ds + 2 * h * pq * 3 + h * pv * 3
    out_rows = h * ds + h * pv * 3 + h * pv
    n_targets = 1  # fan-out: bias per target
    bytes_ = {
        "x_read": bl * d * 2,
        # rot (9) + g-scaled trans per head (h*3) + trans (3) + key-mask
        # row (1), all compute-dtype bf16 (_pallas_layer per-step tensors)
        "frames_read": bl * (9 + h * 3 + 3 + 1) * 2,
        "bias_read": n_targets * h * L * L * 4,  # f32, once per target
        "weights_refetch": cells * (d * w_cols + out_rows * d) * 2,
        "attn_weights_write": b * h * L * L * 2,  # bf16 out for XLA
        "accum_write": bl * d * 2,
    }
    return {
        "flops_by_term": flops,
        "flops_total": float(sum(flops.values())),
        "bytes_by_term": bytes_,
        "bytes_total": float(sum(bytes_.values())),
        "designs_per_block": db,
        "grid_cells": cells,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ab", action="store_true",
                    help="run the on-device DESIGNS_PER_BLOCK A/B at n=512")
    ap.add_argument("--out", default="runs/r5_roofline")
    ap.add_argument("--trace", default="runs/profile_r4b",
                    help="profile dir whose sample_top_ops.json supplies the\n                    measured per-call microseconds")
    ap.add_argument("--name", default="fused_kernel_roofline.json")
    args = ap.parse_args(argv)

    from diffab_pytorch_tpu.config import default_config

    cfg = default_config()
    os.makedirs(args.out, exist_ok=True)

    # measured per-call us from the committed r4b trace: six layer_* Pallas
    # calls, each 100 scan steps per sample batch at n=128
    trace_path = os.path.join(REPO, args.trace, "sample_top_ops.json")
    with open(trace_path) as fh:
        trace = json.load(fh)
    layer_us = [
        op["us_per_call"] / op["count_per_call"]
        for op in trace["top_ops"]
        if op["category"] == "pallas-custom-call" and "layer_" in op["op"]
    ]
    meas_us = sum(layer_us) / len(layer_us)

    led = kernel_call_ledger(cfg, b=128, L=128)
    peak_flops, peak_bw = 197e12, 819e9  # v5e
    ai = led["flops_total"] / led["bytes_total"]
    ridge = peak_flops / peak_bw
    own_roof_flops = min(peak_flops, ai * peak_bw)
    att_flops = led["flops_total"] / (meas_us * 1e-6)
    att_bw = led["bytes_total"] / (meas_us * 1e-6)
    out = {
        "what": ("fused_ipa_layer per-call roofline at n=128 fan-out, "
                 "default model (d=128, h=8, ds=32, pq=pv=8, L=128)"),
        "measured_us_per_call": round(meas_us, 1),
        "measured_source": f"{args.trace}/sample_top_ops.json "
                           f"({len(layer_us)} layer ops)",
        "ledger": led,
        "arithmetic_intensity_flop_per_byte": round(ai, 1),
        "ridge_point_flop_per_byte": round(ridge, 1),
        "attained_tflops": round(att_flops / 1e12, 1),
        "attained_gbps": round(att_bw / 1e9, 1),
        "pct_of_peak_flops": round(100 * att_flops / peak_flops, 1),
        "pct_of_peak_bw": round(100 * att_bw / peak_bw, 1),
        "own_roofline_tflops": round(own_roof_flops / 1e12, 1),
        "pct_of_own_roofline": round(100 * att_flops / own_roof_flops, 1),
    }
    print(json.dumps(out, indent=1))

    if args.ab:
        import dataclasses

        import jax

        from diffab_pytorch_tpu.data.batch import synthetic_batch
        from diffab_pytorch_tpu.ops import ipa_pallas
        from diffab_pytorch_tpu.train import DiffAb

        bcfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           compute_dtype="bfloat16")
        )
        harness = DiffAb(bcfg)
        one = synthetic_batch(jax.random.key(0), 1, 128,
                              bcfg.model.n_atoms, n_generate=8)
        state = harness.init(jax.random.key(1), one)
        key = jax.random.key(2)
        T = bcfg.diffusion.T
        sweep = {}
        for db in (4, 8, 16):
            ipa_pallas.DESIGNS_PER_BLOCK = db
            try:
                fn = jax.jit(lambda p, b, k: harness.sample(
                    p, b, k, n_designs=512, n_steps=10, init="chord",
                    t_start=6 * T // 10, noise_scale=0.0))
                jax.block_until_ready(fn(state.params, one, key))
                t0 = time.time()
                for i in range(3):
                    res = fn(state.params, one,
                             jax.random.fold_in(key, i))
                jax.block_until_ready(res)
                sweep[f"chord10_n512_db{db}"] = round(
                    512 * 3 / (time.time() - t0), 1)
            except Exception as e:  # compile failure at big db: record it
                sweep[f"chord10_n512_db{db}"] = f"failed: {type(e).__name__}"
            finally:
                ipa_pallas.DESIGNS_PER_BLOCK = None
        out["ab_designs_per_block_n512"] = sweep
        print(json.dumps({"ab": sweep}))

    with open(os.path.join(args.out, args.name), "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {args.out}/{args.name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
