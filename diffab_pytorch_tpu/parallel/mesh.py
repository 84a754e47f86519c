"""Device mesh construction and sharding specs.

The reference is strictly single-GPU (train.py:99-100, devices=1; no
distributed backend anywhere — SURVEY.md §2.11/§5.8).  This module is the
TPU-native scaling design: a (dp, tp) mesh over ICI, NamedShardings for
batches (dp over the leading axis), parameters (tp over attention-head
feature dims, Megatron-style, with XLA/GSPMD inserting the collectives),
and replication.  Multi-host pods extend the same mesh via
jax.distributed.initialize() before mesh creation.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
TP_AXIS = "tp"


def make_mesh(
    n_devices: Optional[int] = None, tp: int = 1, devices=None
) -> Mesh:
    """A (dp, tp) mesh over the local (or given) devices.

    tp=1 (default) is pure data parallelism; tp>1 shards attention heads.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = n_devices or devices.size
    if n % tp:
        raise ValueError(f"n_devices={n} not divisible by tp={tp}")
    grid = devices[:n].reshape(n // tp, tp)
    return Mesh(grid, (DP_AXIS, TP_AXIS))


def put_global(tree, sharding):
    """Place a pytree onto a (possibly multi-process) mesh sharding.

    On one process this is plain `jax.device_put`.  On a multi-host mesh a
    committed single-device jax.Array cannot be device_put onto a global
    sharding (that would need cross-host transfers); the supported pattern
    is to build global arrays from process-local HOST data, every process
    holding the same full-size value — which is exactly how our callers
    construct states/batches (deterministic init, same data each host).
    Leaves already on the target sharding pass through untouched, so
    steady-state training (state circulating through the jitted step)
    pays no host round-trip after the first call.
    """
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def put(x, s):
        if isinstance(x, jax.Array) and x.sharding == s:
            return x
        if isinstance(x, jax.Array) and jax.dtypes.issubdtype(
            x.dtype, jax.dtypes.prng_key
        ):
            # typed PRNG keys have no numpy form: go through the raw
            # uint32 key data (replicated, so the spec carries over)
            data = np.asarray(jax.random.key_data(x))
            g = jax.make_array_from_process_local_data(s, data, data.shape)
            return jax.random.wrap_key_data(g, impl=jax.random.key_impl(x))
        x = np.asarray(x)  # requires fully-addressable input: host data
        return jax.make_array_from_process_local_data(s, x, x.shape)

    if isinstance(sharding, NamedSharding):
        return jax.tree.map(lambda x: put(x, sharding), tree)
    return jax.tree.map(put, tree, sharding)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis of every leaf over dp, replicate over tp."""
    return NamedSharding(mesh, P(DP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# parameter-name patterns -> which kernel axis is sharded over tp.
# Megatron pattern for the IPA block: QKV/point/pair-bias projections are
# column-parallel (output features split by head), to_out is row-parallel
# (input features split), so only one all-reduce per layer is needed —
# inserted automatically by GSPMD from these annotations.
_COL_PARALLEL = re.compile(
    r"(to_q_scalar|to_k_scalar|to_v_scalar|to_q_point|to_k_point|to_v_point|"
    r"to_pair_bias)$"
)
_ROW_PARALLEL = re.compile(r"to_out$")


def param_sharding(params, mesh: Mesh):
    """NamedShardings for a DiffAb param pytree: attention projections
    sharded over tp, everything else replicated."""

    def spec_for(path, leaf) -> P:
        names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        is_kernel = bool(names) and names[-1] == "kernel"
        if is_kernel and leaf.ndim == 2:
            module = names[-2] if len(names) >= 2 else ""
            if _COL_PARALLEL.search(module):
                return P(None, TP_AXIS)  # kernel (in, out): split out
            if _ROW_PARALLEL.search(module):
                return P(TP_AXIS, None)  # kernel (in, out): split in
        return P()

    def to_sharding(path, leaf):
        spec = spec_for(path, leaf)
        for dim, axis in enumerate(spec):
            if axis is not None and leaf.shape[dim] % mesh.shape[TP_AXIS]:
                return NamedSharding(mesh, P())  # not divisible: replicate
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)
