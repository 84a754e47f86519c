"""A/B measurement: shared-context design fan-out vs replicate_batch.

Round-1 VERDICT #1: n designs of one target share identical pair tensors
and bias logits; the `n_designs` fan-out path (sampling/sampler.py,
models/ipa.py attended_pair_rows, the Pallas design-grid axis) reads them
once per target, where `replicate_batch` tiled them n-fold.  This script
measures both paths on the real chip across fan-out widths and prints one
JSON line per config:

  {"path": "fanout"|"replicate", "n": N, "samples_per_sec": S, ...}

Run: timeout 1500 python scripts/bench_fanout.py > /tmp/fanout.jsonl
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from diffab_pytorch_tpu.config import default_config
from diffab_pytorch_tpu.data.batch import synthetic_batch
from diffab_pytorch_tpu.parallel import replicate_batch
from diffab_pytorch_tpu.train import DiffAb


def time_fn(fn, args, n_iters=3):
    res = fn(*args)  # compile + warmup
    jax.block_until_ready(res)
    t0 = time.time()
    for _ in range(n_iters):
        res = fn(*args)
    jax.block_until_ready(res)
    return (time.time() - t0) / n_iters


def main():
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, compute_dtype="bfloat16")
    )
    harness = DiffAb(cfg)
    L = 128
    one = synthetic_batch(jax.random.key(0), 1, L, cfg.model.n_atoms,
                          n_generate=8)
    state = harness.init(jax.random.key(1), one)
    key = jax.random.key(2)

    widths = [int(w) for w in (sys.argv[1:] or [8, 32, 128, 256])]
    for n in widths:
        fan_fn = jax.jit(
            lambda p, b, k, n=n: harness.sample(p, b, k, n_designs=n)
        )
        dt = time_fn(fan_fn, (state.params, one, key))
        print(json.dumps({
            "path": "fanout", "n": n,
            "samples_per_sec": round(n / dt, 2),
            "sec_per_batch": round(dt, 4),
        }), flush=True)

        if n <= 128:  # replicate path OOMs / crawls at larger widths
            rep = replicate_batch(one, n)
            rep_fn = jax.jit(lambda p, b, k: harness.sample(p, b, k))
            dt = time_fn(rep_fn, (state.params, rep, key))
            print(json.dumps({
                "path": "replicate", "n": n,
                "samples_per_sec": round(n / dt, 2),
                "sec_per_batch": round(dt, 4),
            }), flush=True)


if __name__ == "__main__":
    main()
