"""A/B: fully fused IPA layer kernel vs attention-only kernel, on device.

Checks numerics (same key => same designs within bf16 accumulation
tolerance) and times the 128/256-design fan-out for both paths.
Run: timeout 1500 python scripts/bench_fused_layer.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from diffab_pytorch_tpu.config import default_config
from diffab_pytorch_tpu.data.batch import synthetic_batch
from diffab_pytorch_tpu.train import DiffAb


def time_fn(fn, args, n_iters=3):
    res = fn(*args)
    jax.block_until_ready(res)
    t0 = time.time()
    for _ in range(n_iters):
        res = fn(*args)
    jax.block_until_ready(res)
    return (time.time() - t0) / n_iters, res


def main():
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, compute_dtype="bfloat16")
    )
    harness = {
        "fused_layer": DiffAb(dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, fuse_ipa_layer=True)
        )),
        "attn_only": DiffAb(dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, fuse_ipa_layer=False)
        )),
    }
    L = 128
    one = synthetic_batch(jax.random.key(0), 1, L, cfg.model.n_atoms,
                          n_generate=8)
    state = harness["attn_only"].init(jax.random.key(1), one)
    key = jax.random.key(2)

    results = {}
    for n in (128, 256):
        for name, h in harness.items():
            fn = jax.jit(lambda p, b, k, h=h, n=n: h.sample(
                p, b, k, n_designs=n))
            dt, res = time_fn(fn, (state.params, one, key))
            results[(name, n)] = (n / dt, res)
            print(json.dumps({
                "path": name, "n": n, "samples_per_sec": round(n / dt, 2),
            }), flush=True)
        a = results[("fused_layer", n)][1]
        b_ = results[("attn_only", n)][1]
        seq_eq = float(np.mean(np.asarray(a.seq_idx == b_.seq_idx)))
        dx = float(np.max(np.abs(np.asarray(
            a.translations - b_.translations, dtype=np.float32))))
        print(json.dumps({
            "n": n, "seq_identity_vs_attn_only": round(seq_eq, 4),
            "max_abs_coord_diff": round(dx, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
