"""One process of a multi-host (multi-process) training/sampling check.

The reference is strictly single-GPU (train.py:99-100, devices=1); our
parallel layer claims the same code scales to multi-host pods by calling
jax.distributed.initialize() before mesh creation (parallel/mesh.py,
DESIGN.md §4).  This worker turns that claim into a measurement: N OS
processes, each owning a slice of the device mesh (CPU devices in the
test; TPU hosts in a pod), run the UNMODIFIED shard_map dp train step and
the sampling fan-out over the global mesh, and every process writes its
replicated metrics to a JSON file.  tests/test_multihost.py launches two
workers and pins their losses bit-level against the single-process run of
the same global mesh — per-device PRNG folds use the GLOBAL axis index,
so the draw streams are identical by construction.

Usage (the test sets XLA_FLAGS=--xla_force_host_platform_device_count=K):
  python scripts/multihost_worker.py --process-id 0 --num-processes 2 \
      --coordinator 127.0.0.1:12732 --steps 3 --out /tmp/mh0.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# Runnable from any cwd (the test launches workers as subprocesses).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--coordinator", default="127.0.0.1:12732")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--n-designs", type=int, default=8)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    # CPU backend must be selected before first backend use (the container
    # sitecustomize registers an axon TPU backend in every process).
    jax.config.update("jax_platforms", "cpu")
    if args.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    import numpy as np

    from diffab_pytorch_tpu.config import tiny_config
    from diffab_pytorch_tpu.data.batch import synthetic_batch
    from diffab_pytorch_tpu.parallel import (
        make_dp_train_step,
        make_mesh,
        make_sharded_train_step,
        put_global,
        replicate_batch,
        sample_fanout_sharded,
        shard_state,
    )
    from diffab_pytorch_tpu.parallel.mesh import batch_sharding
    from diffab_pytorch_tpu.train import DiffAb

    # Deterministic, identical on every process: the standard multi-host
    # pattern of building the same global host data everywhere and letting
    # device_put keep only each process's addressable shards.
    harness = DiffAb(tiny_config())
    batch = synthetic_batch(jax.random.key(0), 8, 24, 15, n_generate=6)
    state = harness.init(jax.random.key(1), batch)
    mesh = make_mesh()  # global mesh over all processes' devices

    step = make_dp_train_step(harness, mesh, donate=False)
    losses = []
    for i in range(args.steps):
        state, metrics = step(
            state, batch, jax.random.fold_in(jax.random.key(2), i)
        )
        # metrics are pmean'd and replicated: addressable on every process
        losses.append(float(metrics["train/loss"]))

    # GSPMD dp x tp arm: the pod production topology — params tp-sharded
    # across the process boundary via shard_state (put_global under the
    # hood), XLA inserting the collectives.  The step folds (key, step)
    # device-independently, so these losses are topology-invariant and the
    # test pins them against a plain single-device step.
    gspmd_mesh = make_mesh(tp=2)
    gstate = shard_state(harness.init(jax.random.key(1), batch), gspmd_mesh)
    gstep = make_sharded_train_step(harness, gspmd_mesh, donate=False)
    from diffab_pytorch_tpu.parallel import replicated

    gbatch = put_global(batch, batch_sharding(gspmd_mesh))
    gkey = put_global(jax.random.key(5), replicated(gspmd_mesh))
    gspmd_losses = []
    for i in range(2):
        gstate, gmetrics = gstep(gstate, gbatch, gkey)
        gspmd_losses.append(float(gmetrics["train/loss"]))

    # CROSS-PROCESS tp arm (round 5): make_mesh keeps tp as the MINOR
    # axis, so on a process-per-host topology every tp pair above lands
    # inside one process and the tp collectives never cross the process
    # boundary.  Here the device grid is transposed — tp pairs are
    # (device i of process 0, device i of process 1) — so the per-layer
    # GSPMD all-reduce of the Megatron-sharded projections genuinely
    # rides the inter-process link (DCN on a real pod).  Losses are
    # topology-invariant, pinned against single-process by the test.
    gspmd_xproc_losses = []
    if args.num_processes > 1 and jax.device_count() % args.num_processes == 0:
        import numpy as _np
        from jax.sharding import Mesh

        devs = sorted(
            jax.devices(), key=lambda d: (d.process_index, d.id)
        )
        grid = _np.asarray(devs).reshape(args.num_processes, -1).T
        xmesh = Mesh(grid, ("dp", "tp"))  # tp spans the process boundary
        xstate = shard_state(harness.init(jax.random.key(1), batch), xmesh)
        xstep = make_sharded_train_step(harness, xmesh, donate=False)
        xbatch = put_global(batch, batch_sharding(xmesh))
        xkey = put_global(jax.random.key(5), replicated(xmesh))
        for i in range(2):
            xstate, xmetrics = xstep(xstate, xbatch, xkey)
            gspmd_xproc_losses.append(float(xmetrics["train/loss"]))

    # Pod-scale fan-out: n designs of one target spread over the global dp
    # axis; each process sees its local rows only, so report a local digest
    # plus the global design count implied by the output shape.
    one = jax.tree.map(lambda x: x[:1], batch)
    res = sample_fanout_sharded(
        harness, state.params, one, jax.random.key(3), mesh,
        n_designs=args.n_designs, n_steps=3,
    )
    gen = np.asarray(one.generation_mask[0])
    local_rows = [
        np.asarray(s.data)[..., gen]
        for s in res.seq_idx.addressable_shards
    ]
    local_seqs = {tuple(int(v) for v in row)
                  for block in local_rows for row in block}

    out = {
        "process_id": args.process_id,
        "num_processes": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
        "losses": losses,
        "gspmd_losses": gspmd_losses,
        "gspmd_xproc_losses": gspmd_xproc_losses,
        "final_step": int(state.step),
        "fanout_rows_global": int(res.seq_idx.shape[0]),
        "fanout_local_unique": len(local_seqs),
    }
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
