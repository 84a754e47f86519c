"""Data-parallel training and pod-scale sampling over the mesh.

TPU-native replacement for the reference's absent distributed layer
(SURVEY.md §2.11: reference = 1 GPU, no collectives anywhere).  Two
mechanisms, by design:

  * `make_dp_train_step`: an explicit shard_map step — per-device forward/
    backward on the local batch shard with per-device PRNG folds, gradient
    and metric `pmean` over the dp axis riding ICI, then a replicated
    optimizer update.  Explicit collectives, no magic.
  * `make_sharded_train_step` / `sample_sharded`: the GSPMD path — jit with
    NamedShardings (batch over dp, params replicated or tp-sharded via
    `param_sharding`) and let XLA insert collectives.  Sampling fan-out
    (BASELINE config #5: 10k designs per target) is embarrassingly parallel
    over dp; each device works on its batch shard with a distinct key fold.

Both compose with multi-host pods: the same code runs under
jax.distributed.initialize() with a global mesh — measured by
tests/test_multihost.py (two processes, global 8-device mesh, losses
equal to the single-process run; host data enters through
mesh.put_global).
"""

from __future__ import annotations

import copy
import dataclasses
import jax
import jax.numpy as jnp

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from diffab_pytorch_tpu.data.batch import ProteinBatch
from diffab_pytorch_tpu.models import DiffAbModel
from diffab_pytorch_tpu.parallel.mesh import (
    DP_AXIS, batch_sharding, param_sharding, put_global, replicated,
)
from diffab_pytorch_tpu.train.harness import DiffAb, TrainState


def _xla_attention_harness(harness: DiffAb) -> DiffAb:
    """A functionally identical harness with the fused Pallas attention
    forced OFF, for the one remaining GSPMD code path
    (`make_sharded_train_step`).

    GSPMD partitions programs by propagating shardings through known HLO
    ops; a `pallas_call` is an opaque custom call it cannot split, so the
    kernel is only safe where tracing happens at per-device LOCAL shapes —
    which all shard_map paths (dp train step, `sample_sharded`,
    `sample_fanout_sharded`) do, keeping the kernel ON.  Only the plain-jit
    GSPMD train step traces at GLOBAL shapes and must use the pure-XLA
    attention path.  The flag only selects the computation; the parameter
    tree is identical, so states/checkpoints interchange freely.  Shallow
    copy: schedule/IGSO3 tables and the optimizer are shared, not rebuilt.
    """
    mcfg = harness.config.model
    if mcfg.use_pallas_attention is False:
        return harness
    clone = copy.copy(harness)
    clone.config = dataclasses.replace(
        harness.config,
        model=dataclasses.replace(mcfg, use_pallas_attention=False),
    )
    clone.model = DiffAbModel(clone.config.model)
    return clone


def make_dp_train_step(harness: DiffAb, mesh: Mesh, donate: bool = True):
    """Explicit shard_map data-parallel train step.

    state: replicated; batch: sharded over dp (leading axis); key: replicated
    (folded per-device).  Returns (state, metrics) replicated.
    """

    def per_device(state: TrainState, batch: ProteinBatch, key: jax.Array):
        # fold step + device index inside the jit (same base key every call
        # is fine — see harness.train_step_impl)
        key = jax.random.fold_in(key, state.step)
        key = jax.random.fold_in(key, jax.lax.axis_index(DP_AXIS))
        grad_fn = jax.value_and_grad(
            lambda p: harness.loss_fn(p, key, batch, step=state.step),
            has_aux=True,
        )
        (_, metrics), grads = grad_fn(state.params)
        # gradient all-reduce over ICI; shards weighted equally
        grads = jax.lax.pmean(grads, DP_AXIS)
        metrics = jax.lax.pmean(metrics, DP_AXIS)
        # identical pmean'd grads on every shard -> the update (+ EMA
        # blend) stays replicated
        new_state = harness.apply_gradients(state, grads)
        return new_state, {f"train/{k}": v for k, v in metrics.items()}

    mapped = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(DP_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    jitted = jax.jit(mapped, donate_argnums=(0,) if donate else ())
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)

    def step(state, batch, key):
        # accept any input placement: replicate state/key onto the mesh and
        # shard the batch (no-ops when already placed correctly; multi-host
        # safe — see put_global)
        state = put_global(state, rep)
        batch = put_global(batch, bsh)
        key = put_global(key, rep)
        return jitted(state, batch, key)

    return step


def make_sharded_train_step(harness: DiffAb, mesh: Mesh, donate: bool = True):
    """GSPMD train step: jit with sharding constraints; XLA partitions the
    whole loss+grad+update program over (dp, tp).  Uses the pure-XLA
    attention path (see _xla_attention_harness)."""
    harness = _xla_attention_harness(harness)
    bs = batch_sharding(mesh)

    def step(state, batch, key):
        batch = jax.lax.with_sharding_constraint(batch, bs)
        return harness.train_step_impl(state, batch, key)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def shard_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place a TrainState on the mesh: params (and matching opt-state
    leaves) tp-sharded per `param_sharding`, rest replicated."""
    p_shard = param_sharding(state.params, mesh)
    params = put_global(state.params, p_shard)

    # Adam moments inside optax state mirror the param tree EXACTLY, so the
    # param shardings transfer by tree alignment: any opt-state subtree
    # whose pytree structure equals the param tree (mu, nu, adamw's nu_hat,
    # ...) is mapped leaf-for-leaf against p_shard; everything else
    # (step counts, empty states) is replicated.
    p_treedef = jax.tree_util.tree_structure(state.params)
    rep = replicated(mesh)

    def is_param_shaped(sub) -> bool:
        return jax.tree_util.tree_structure(sub) == p_treedef

    def place_opt(opt_state):
        def place(sub):
            if is_param_shaped(sub):
                return put_global(sub, p_shard)
            if hasattr(sub, "shape"):
                return put_global(sub, rep)
            return sub

        return jax.tree.map(place, opt_state, is_leaf=is_param_shaped)

    return TrainState(
        step=put_global(state.step, replicated(mesh)),
        params=params,
        opt_state=place_opt(state.opt_state),
        ema_params=(None if state.ema_params is None
                    else put_global(state.ema_params, p_shard)),
    )


def _sample_out_specs(return_trajectory: bool):
    """shard_map out_specs for a SampleResult: outputs shard over dp on the
    batch axis — axis 0 for final fields, axis 1 for (T, b, ...) trajectory
    fields.  None fields are empty subtrees and need no spec."""
    from diffab_pytorch_tpu.sampling.sampler import SampleResult

    traj = P(None, DP_AXIS) if return_trajectory else None
    return SampleResult(
        seq_idx=P(DP_AXIS),
        translations=P(DP_AXIS),
        orientations=P(DP_AXIS),
        seq_trajectory=traj,
        translations_trajectory=traj,
        orientations_trajectory=traj,
    )


def sample_sharded(
    harness: DiffAb,
    params,
    batch: ProteinBatch,
    key: jax.Array,
    mesh: Mesh,
    **sample_kwargs,
):
    """Pod-scale sampling: shard the batch rows over dp, replicate params,
    run the reverse scan per device under shard_map (BASELINE config #5).

    shard_map traces at per-device LOCAL shapes, so the fused Pallas
    attention kernel stays ON (round-1 VERDICT #3: the previous GSPMD-jit
    version had to force the XLA path because GSPMD cannot partition an
    opaque pallas_call).  Each device folds its dp index into the key, so
    rows on different devices draw independent noise; the draw stream
    therefore differs from (but is statistically equivalent to) a
    single-device run over the global batch.  tests/test_parallel.py pins
    exact numerics against a per-device host loop with the same folds.

    For n designs of ONE target prefer `sample_fanout_sharded`, which also
    shares the pair tensors across each device's designs.
    """
    b = batch.batch_size
    ndp = mesh.shape[DP_AXIS]
    if b % ndp:
        raise ValueError(f"batch size {b} not divisible by dp={ndp}")

    def per_device(params, batch, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(DP_AXIS))
        return harness.sample(params, batch, key, **sample_kwargs)

    mapped = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(DP_AXIS), P()),
        out_specs=_sample_out_specs(sample_kwargs.get("return_trajectory", False)),
        check_vma=False,
    )
    params = put_global(params, replicated(mesh))
    batch = put_global(batch, batch_sharding(mesh))
    key = put_global(key, replicated(mesh))
    return jax.jit(mapped)(params, batch, key)


def sample_fanout_sharded(
    harness: DiffAb,
    params,
    batch: ProteinBatch,
    key: jax.Array,
    mesh: Mesh,
    n_designs: int,
    **sample_kwargs,
):
    """The flagship fan-out (BASELINE config #5: 8-10k designs per target):
    n_designs spread over the dp axis, n_designs/ndp per device, with the
    batch (the target complexes) REPLICATED — each device encodes the
    context once and its local designs share one copy of the pair tensor
    and bias logits (sampler n_designs path + Pallas design-grid axis).

    Output rows are device-major then design-major: with b targets, row
    ((d * b) + i) * n_local + j is design j of target i on device d; for
    the common b == 1 case that is simply n_designs rows of the one target.
    Per-device key folds make every design's draw stream independent.
    """
    ndp = mesh.shape[DP_AXIS]
    if n_designs % ndp:
        raise ValueError(f"n_designs={n_designs} not divisible by dp={ndp}")
    n_local = n_designs // ndp

    def per_device(params, batch, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(DP_AXIS))
        return harness.sample(
            params, batch, key, n_designs=n_local, **sample_kwargs
        )

    mapped = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=_sample_out_specs(sample_kwargs.get("return_trajectory", False)),
        check_vma=False,
    )
    rep = replicated(mesh)
    params = put_global(params, rep)
    batch = put_global(batch, rep)
    key = put_global(key, rep)
    return jax.jit(mapped)(params, batch, key)


def score_fanout_sharded(
    harness: DiffAb,
    params,
    batch: ProteinBatch,
    designs,
    key: jax.Array,
    mesh: Mesh,
    **score_kwargs,
):
    """Pod-scale design scoring (sampling/scoring.py): shard the design
    rows over dp, replicate the target batch and params, score each
    device's local designs under shard_map (the Pallas kernel stays ON,
    same as the samplers).

    Accepts exactly what `sample_fanout_sharded` returns: global rows in
    device-major blocks, each block design-major over the replicated
    targets — sharding axis 0 into ndp chunks recovers every device's
    local block, so scores line up row-for-row with the designs.  Each
    device folds its dp index into the key (independent scoring noise);
    numerics are pinned against a per-device host loop with the same
    folds (tests/test_parallel.py)."""
    from diffab_pytorch_tpu.sampling.scoring import DesignScores

    ndp = mesh.shape[DP_AXIS]
    bn = designs.seq_idx.shape[0]
    if bn % (batch.batch_size * ndp):
        raise ValueError(
            f"design rows {bn} not divisible by targets*dp = "
            f"{batch.batch_size * ndp}"
        )

    def per_device(params, batch, designs, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(DP_AXIS))
        return harness.score_designs(params, batch, designs, key,
                                     **score_kwargs)

    mapped = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(DP_AXIS), P()),
        out_specs=DesignScores(
            score=P(DP_AXIS), seq_score=P(DP_AXIS),
            translations_score=P(DP_AXIS), orientations_score=P(DP_AXIS),
        ),
        check_vma=False,
    )
    rep = replicated(mesh)
    params = put_global(params, rep)
    batch = put_global(batch, rep)
    key = put_global(key, rep)
    designs = put_global(designs, batch_sharding(mesh))
    return jax.jit(mapped)(params, batch, designs, key)


def replicate_batch(batch: ProteinBatch, n: int) -> ProteinBatch:
    """Tile a 1-complex batch into n rows (n independent designs)."""
    return jax.tree.map(lambda x: jnp.repeat(x, n, axis=0), batch)
