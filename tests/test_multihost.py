"""Multi-HOST (multi-process) validation of the parallel layer.

DESIGN.md §4 claims the mesh/DP code runs unmodified under
jax.distributed.initialize() — this test measures it instead of asserting
it: two OS processes, each owning 4 CPU devices (the same
process-per-host topology as a TPU pod slice, gloo collectives standing
in for ICI/DCN), run scripts/multihost_worker.py — the UNMODIFIED
shard_map dp train step plus the sampling fan-out on the global 8-device
mesh — and their replicated losses must match a single-process run of the
same global mesh to fp tolerance.  Per-device PRNG folds use the GLOBAL
axis index (parallel/dp.py), so the two topologies draw identical noise
by construction; only the reduction topology differs.

The reference trains on exactly one device (train.py:99-100) and has no
distributed code to compare against (SURVEY.md §2.11/§5.8).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # two cold-start worker processes (~2 min)

_WORKER = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts", "multihost_worker.py",
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dp_matches_single_process(tmp_path):
    port = _free_port()
    env = dict(
        os.environ,
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        JAX_PLATFORMS="cpu",
    )
    outs = [tmp_path / f"mh{i}.json" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER,
             "--process-id", str(i), "--num-processes", "2",
             "--coordinator", f"127.0.0.1:{port}",
             "--steps", "3", "--out", str(outs[i])],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    r0, r1 = (json.loads(o.read_text()) for o in outs)

    # the distributed runtime really spanned two processes
    for r in (r0, r1):
        assert r["num_processes"] == 2
        assert r["local_devices"] == 4
        assert r["global_devices"] == 8
        assert r["final_step"] == 3
        assert r["fanout_rows_global"] == 8
    # replicated metrics agree across processes exactly
    np.testing.assert_array_equal(r0["losses"], r1["losses"])
    np.testing.assert_array_equal(r0["gspmd_losses"], r1["gspmd_losses"])
    # each process's 4 local designs are distinct (per-device key folds)
    assert r0["fanout_local_unique"] > 1 and r1["fanout_local_unique"] > 1

    # single-process reference on the SAME global mesh topology: this test
    # process already owns 8 CPU devices (conftest), and the dp step folds
    # the GLOBAL device index, so the losses must match bit-for-bit-ish.
    import jax
    from diffab_pytorch_tpu.config import tiny_config
    from diffab_pytorch_tpu.data.batch import synthetic_batch
    from diffab_pytorch_tpu.parallel import make_dp_train_step, make_mesh
    from diffab_pytorch_tpu.train import DiffAb

    harness = DiffAb(tiny_config())
    batch = synthetic_batch(jax.random.key(0), 8, 24, 15, n_generate=6)
    state = harness.init(jax.random.key(1), batch)
    step = make_dp_train_step(harness, make_mesh(), donate=False)
    ref = []
    for i in range(3):
        state, metrics = step(
            state, batch, jax.random.fold_in(jax.random.key(2), i)
        )
        ref.append(float(metrics["train/loss"]))
    np.testing.assert_allclose(r0["losses"], ref, rtol=1e-5)

    # GSPMD dp x tp arms: the step folds (key, step) device-independently,
    # so the two-process tp-sharded losses must equal a plain single-device
    # step sequence with the same key.  Two topologies are pinned:
    #   gspmd_losses        make_mesh(tp=2) — tp pairs inside one process;
    #   gspmd_xproc_losses  transposed grid — every tp pair SPANS the two
    #                       processes, so the per-layer Megatron all-reduce
    #                       crosses the process boundary (DCN on a pod).
    state = harness.init(jax.random.key(1), batch)
    single = harness.make_train_step(donate=False)
    gref = []
    for _ in range(2):
        state, metrics = single(state, batch, jax.random.key(5))
        gref.append(float(metrics["train/loss"]))
    np.testing.assert_allclose(r0["gspmd_losses"], gref, rtol=1e-5)
    np.testing.assert_allclose(r0["gspmd_xproc_losses"], gref, rtol=1e-5)
    np.testing.assert_array_equal(
        r0["gspmd_xproc_losses"], r1["gspmd_xproc_losses"]
    )
