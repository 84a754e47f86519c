"""Trace-profile the two steady-state programs at the round-4 operating point.

Round-3 VERDICT weak #2: neither roofline residual was trace-proven — the
"per-op latency" theory rested on remat_pair's failure, not on a profile of
the current production train step (b32, dist_atoms=4, fused bias, d_pair=48)
or the fused-layer fan-out reverse scan.  This script captures jax.profiler
traces of both on the real chip, parses the xplane protos locally
(tensorflow.tsl.profiler.protobuf — the tunneled backend writes full
device-side op timelines, verified), and commits per-op tables to
runs/profile_r4/.

Per program it reports:
  * module executions (one per call / per scan) with mean device time,
  * the top-K ops by total device time per call, with category rollups
    (fusion / convolution / custom-call=Pallas / copy / ...),
  * the device-busy fraction of the module span (ops tile the TensorCore
    timeline; what they don't cover is sequencer/infeed overhead),
  * per-call dispatch gap (wall vs device) — through the remote tunnel
    this is the host-side latency share.

Usage (real TPU):
    python scripts/profile_steady_state.py --out runs/profile_r4
"""

from __future__ import annotations

import argparse
import collections
import dataclasses
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# ----------------------------------------------------------------- parsing


def parse_xplane(trace_dir: str) -> dict:
    """Aggregate the TPU device plane of the newest trace under trace_dir."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    planes = [p for p in xs.planes if p.name.startswith("/device:TPU")]
    if not planes:
        raise RuntimeError(
            f"no TPU plane in trace ({[p.name for p in xs.planes]})"
        )
    plane = planes[0]
    md = plane.event_metadata

    modules = []  # (start_ps, dur_ps, name)
    ops = collections.defaultdict(lambda: [0, 0.0, ""])  # name -> [n, ps, hlo]
    for line in plane.lines:
        if line.name == "XLA Modules":
            for ev in line.events:
                modules.append(
                    (ev.offset_ps, ev.duration_ps, md[ev.metadata_id].name)
                )
        elif line.name == "XLA Ops":
            for ev in line.events:
                m = md[ev.metadata_id]
                key = m.display_name or m.name
                rec = ops[key]
                rec[0] += 1
                rec[1] += ev.duration_ps
                if not rec[2]:
                    rec[2] = m.name[:300]
    modules.sort()
    return {"modules": modules, "ops": dict(ops)}


def _category(display_name: str, hlo: str) -> str:
    n = display_name
    if "custom-call" in hlo.split(" = ")[-1][:200] or n.startswith("tpu_custom_call"):
        return "pallas-custom-call"
    for pre in ("copy", "fusion", "convolution", "dot", "dynamic-slice",
                "dynamic-update-slice", "reduce", "transpose", "broadcast",
                "select", "iota", "convert", "bitcast", "all-reduce",
                "infeed", "outfeed", "rng"):
        if pre in n:
            return pre
    return "other"


def summarize(parsed: dict, n_calls: int, wall_s: float, label: str,
              top_k: int = 40) -> dict:
    mods = parsed["modules"]
    # module events per call (the train step is 1 module; the sampler is
    # 1 module containing the whole scan)
    mod_by_name = collections.defaultdict(list)
    for _, dur, name in mods:
        mod_by_name[name].append(dur)
    total_module_ps = sum(d for _, d, _ in mods)
    total_op_ps = sum(v[1] for v in parsed["ops"].values())

    rows = []
    for name, (cnt, ps, hlo) in parsed["ops"].items():
        rows.append({
            "op": name,
            "category": _category(name, hlo),
            "count_per_call": round(cnt / n_calls, 1),
            "us_per_call": round(ps / 1e6 / n_calls, 1),
            "pct_of_device": round(100.0 * ps / max(total_op_ps, 1), 2),
            "hlo": hlo[:240],
        })
    rows.sort(key=lambda r: -r["us_per_call"])

    cats = collections.defaultdict(float)
    for r in rows:
        cats[r["category"]] += r["pct_of_device"]

    device_s = total_module_ps / 1e12
    return {
        "label": label,
        "n_calls": n_calls,
        "wall_s": round(wall_s, 3),
        "device_s": round(device_s, 3),
        "device_us_per_call": round(total_module_ps / 1e6 / n_calls, 1),
        "dispatch_gap_us_per_call": round(
            (wall_s - device_s) * 1e6 / n_calls, 1
        ),
        "device_busy_fraction_of_module": round(
            total_op_ps / max(total_module_ps, 1), 4
        ),
        "n_distinct_ops": len(rows),
        "module_events": {
            k: {"n": len(v), "mean_us": round(sum(v) / len(v) / 1e6, 1)}
            for k, v in mod_by_name.items()
        },
        "category_pct_of_device": {
            k: round(v, 2) for k, v in sorted(cats.items(), key=lambda kv: -kv[1])
        },
        "top_ops": rows[:top_k],
    }


# ----------------------------------------------------------------- programs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/profile_r4")
    ap.add_argument("--train-calls", type=int, default=10)
    ap.add_argument("--sample-calls", type=int, default=2)
    ap.add_argument("--skip-sample", action="store_true")
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from diffab_pytorch_tpu.config import default_config, production_config
    from diffab_pytorch_tpu.data.batch import synthetic_batch
    from diffab_pytorch_tpu.train import DiffAb

    results = {}

    if not args.skip_train:
        # --- production train step: b32, dist_atoms=4, fused bias, d_pair 48
        pcfg = production_config()
        ph = DiffAb(pcfg)
        PB = pcfg.train.batch_size
        pbatch = synthetic_batch(jax.random.key(6), PB, 128, pcfg.model.n_atoms)
        pstate = ph.init(jax.random.key(7), pbatch)
        pstep = ph.make_train_step(donate=False)
        s2, _ = pstep(pstate, pbatch, jax.random.key(8))
        jax.block_until_ready(s2)
        tdir = os.path.join(args.out, "trace_train")
        jax.profiler.start_trace(tdir)
        t0 = time.time()
        for _ in range(args.train_calls):
            s2, _ = pstep(pstate, pbatch, jax.random.key(8))
        jax.block_until_ready(s2)
        wall = time.time() - t0
        jax.profiler.stop_trace()
        summ = summarize(parse_xplane(tdir), args.train_calls, wall,
                         f"production train step b{PB} dist4 fused-bias dp48")
        results["train"] = summ
        with open(os.path.join(args.out, "train_top_ops.json"), "w") as f:
            json.dump(summ, f, indent=1)
        print(json.dumps({k: v for k, v in summ.items() if k != "top_ops"}))

    if not args.skip_sample:
        # --- headline fan-out reverse scan: 128 designs, T=100, fused layer
        cfg = default_config()
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, compute_dtype="bfloat16")
        )
        h = DiffAb(cfg)
        one = synthetic_batch(jax.random.key(0), 1, 128, cfg.model.n_atoms,
                              n_generate=8)
        state = h.init(jax.random.key(1), one)
        sample_fn = jax.jit(lambda p, b, k: h.sample(p, b, k, n_designs=128))
        jax.block_until_ready(sample_fn(state.params, one, jax.random.key(2)))
        sdir = os.path.join(args.out, "trace_sample")
        jax.profiler.start_trace(sdir)
        t0 = time.time()
        for i in range(args.sample_calls):
            res = sample_fn(state.params, one, jax.random.key(3 + i))
        jax.block_until_ready(res)
        wall = time.time() - t0
        jax.profiler.stop_trace()
        summ = summarize(parse_xplane(sdir), args.sample_calls, wall,
                         "fan-out reverse scan n=128 T=100 fused layer")
        results["sample"] = summ
        with open(os.path.join(args.out, "sample_top_ops.json"), "w") as f:
            json.dump(summ, f, indent=1)
        print(json.dumps({k: v for k, v in summ.items() if k != "top_ops"}))

    return results


if __name__ == "__main__":
    main()
