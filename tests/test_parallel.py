"""Multi-device tests on the faked 8-device CPU mesh (conftest.py).

The reference has no distributed layer to mirror (SURVEY.md §2.11); these
pin our mesh/DP/TP design: shard_map DP equals single-device training on
the same global batch modulo per-device RNG, GSPMD TP produces identical
numerics, and sampling fans out across the mesh.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from diffab_pytorch_tpu.config import tiny_config
from diffab_pytorch_tpu.data.batch import synthetic_batch
from diffab_pytorch_tpu.parallel import (
    batch_sharding,
    make_dp_train_step,
    make_mesh,
    make_sharded_train_step,
    param_sharding,
    replicate_batch,
    sample_sharded,
    shard_state,
)
from diffab_pytorch_tpu.train import DiffAb

L = 24


@pytest.fixture(scope="module")
def harness():
    return DiffAb(tiny_config())


@pytest.fixture(scope="module")
def batch():
    return synthetic_batch(jax.random.key(0), 8, L, 15, n_generate=6)


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {"dp": 8, "tp": 1}
    mesh2 = make_mesh(tp=2)
    assert mesh2.shape == {"dp": 4, "tp": 2}
    with pytest.raises(ValueError, match="divisible"):
        make_mesh(n_devices=8, tp=3)


def test_dp_train_step_runs_and_metrics_finite(harness, batch):
    mesh = make_mesh()
    state = harness.init(jax.random.key(1), batch)
    step = make_dp_train_step(harness, mesh, donate=False)
    sharded_batch = jax.device_put(batch, batch_sharding(mesh))
    state2, metrics = step(state, sharded_batch, jax.random.key(2))
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["train/loss"]))
    # params identical across devices (replicated output)
    leaf = jax.tree.leaves(state2.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_dp_loss_decreases(harness, batch):
    mesh = make_mesh()
    state = harness.init(jax.random.key(3), batch)
    step = make_dp_train_step(harness, mesh, donate=False)
    sb = jax.device_put(batch, batch_sharding(mesh))
    ev = harness.make_eval_step()
    before = float(ev(state.params, batch, jax.random.key(9))["val/loss"])
    for i in range(15):
        state, _ = step(state, sb, jax.random.fold_in(jax.random.key(4), i))
    after = float(ev(state.params, batch, jax.random.key(9))["val/loss"])
    assert after < before


def test_gspmd_tp_matches_single_device(harness, batch):
    """The tp=2 GSPMD step computes the same update as single-device (same
    key stream -> same randomness -> numerics match to fp tolerance)."""
    state = harness.init(jax.random.key(5), batch)
    single = harness.make_train_step(donate=False)
    s_ref, m_ref = single(state, batch, jax.random.key(6))

    mesh = make_mesh(tp=2)
    sharded = shard_state(state, mesh)
    step_tp = make_sharded_train_step(harness, mesh, donate=False)
    s_tp, m_tp = step_tp(sharded, jax.device_put(batch, batch_sharding(mesh)),
                         jax.random.key(6))
    assert abs(float(m_ref["train/loss"]) - float(m_tp["train/loss"])) < 1e-3
    # a tp-sharded attention kernel really is distributed
    qk = s_tp.params["params"]["denoiser"]["ipa"]["layer_0"]["to_q_scalar"]["kernel"]
    assert not qk.sharding.is_fully_replicated


def test_param_sharding_specs(harness, batch):
    mesh = make_mesh(tp=2)
    state = harness.init(jax.random.key(7), batch)
    shardings = param_sharding(state.params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    col = [s for p, s in flat if "to_q_scalar" in str(p) and "kernel" in str(p)]
    assert col and all(s.spec == P(None, "tp") for s in col)
    out = [s for p, s in flat if "to_out" in str(p) and "kernel" in str(p)]
    assert out and all(s.spec == P("tp", None) for s in out)
    emb = [s for p, s in flat if "chain_embedding" in str(p)]
    assert emb and all(s.spec == P() for s in emb)


def test_sample_sharded_fanout(harness, batch):
    """10k-designs-per-target pattern in miniature: 1 complex -> 8 designs
    across the mesh, all valid, not all identical."""
    mesh = make_mesh()
    one = jax.tree.map(lambda x: x[:1], batch)
    fan = replicate_batch(one, 8)
    state = harness.init(jax.random.key(8), fan)
    res = sample_sharded(harness, state.params, fan, jax.random.key(9), mesh)
    assert res.seq_idx.shape == (8, L)
    gen = np.asarray(fan.generation_mask[0])
    seqs = np.asarray(res.seq_idx)[:, gen]
    assert len({tuple(s) for s in seqs}) > 1  # distinct designs
    ctx = ~np.asarray(fan.generation_mask)
    np.testing.assert_array_equal(
        np.asarray(res.seq_idx)[ctx], np.asarray(fan.seq_idx)[ctx]
    )

    with pytest.raises(ValueError, match="divisible"):
        sample_sharded(harness, state.params, jax.tree.map(lambda x: x[:3], fan),
                       jax.random.key(10), mesh)


def test_gspmd_paths_force_xla_attention(harness, batch):
    """GSPMD cannot partition a pallas_call; the plain-jit sharded builders
    must clone the harness with the kernel off — same param tree, same
    loss, shared (not rebuilt) schedule tables."""
    from diffab_pytorch_tpu.parallel.dp import _xla_attention_harness

    cfg = dataclasses.replace(
        harness.config,
        model=dataclasses.replace(
            harness.config.model, use_pallas_attention=True
        ),
    )
    on = DiffAb(cfg)
    off = _xla_attention_harness(on)
    assert off.config.model.use_pallas_attention is False
    assert off.sched is on.sched  # shared tables, no rebuild
    assert off.optimizer is on.optimizer

    state = on.init(jax.random.key(0), batch)
    l_on = on.loss_fn(state.params, jax.random.key(1), batch)[1]["loss"]
    l_off = off.loss_fn(state.params, jax.random.key(1), batch)[1]["loss"]
    np.testing.assert_allclose(float(l_on), float(l_off), rtol=1e-5)

    # explicit False is a no-op (no clone)
    assert _xla_attention_harness(off) is off


def test_checkpoint_restore_sharded(harness, batch, tmp_path):
    """Mesh-aware restore: a checkpoint saved from a single-device state
    restores DIRECTLY into a tp-sharded template (orbax reshards at load),
    and one GSPMD step from the restored state equals the unsharded step."""
    from diffab_pytorch_tpu.train import checkpoint as ckpt_lib

    state = harness.init(jax.random.key(12), batch)
    single = harness.make_train_step(donate=False)
    state1, _ = single(state, batch, jax.random.key(13))
    ckpt_lib.save_checkpoint(str(tmp_path), state1)

    mesh = make_mesh(tp=2)
    template = shard_state(harness.init(jax.random.key(14), batch), mesh)
    restored = ckpt_lib.restore_checkpoint(str(tmp_path), template)

    # placement honored: the tp-sharded leaves come back tp-sharded
    qk = restored.params["params"]["denoiser"]["ipa"]["layer_0"]["to_q_scalar"]["kernel"]
    assert not qk.sharding.is_fully_replicated
    assert qk.sharding.spec == P(None, "tp")
    assert int(restored.step) == 1
    # values identical to what was saved
    np.testing.assert_array_equal(
        np.asarray(qk),
        np.asarray(state1.params["params"]["denoiser"]["ipa"]["layer_0"]["to_q_scalar"]["kernel"]),
    )

    # one step from the restored sharded state == one step unsharded
    s_ref, m_ref = single(state1, batch, jax.random.key(15))
    step_tp = make_sharded_train_step(harness, mesh, donate=False)
    s_tp, m_tp = step_tp(
        restored, jax.device_put(batch, batch_sharding(mesh)),
        jax.random.key(15),
    )
    assert abs(float(m_ref["train/loss"]) - float(m_tp["train/loss"])) < 1e-3

    # round trip: save the SHARDED state, restore single-device
    ckpt_lib.save_checkpoint(str(tmp_path), s_tp)
    back = ckpt_lib.restore_checkpoint(
        str(tmp_path), harness.init(jax.random.key(16), batch), step=2
    )
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(back.params)[0]),
        np.asarray(jax.tree.leaves(s_tp.params)[0]),
        rtol=1e-6,
    )


def test_score_fanout_sharded_matches_host_loop(harness, batch):
    """Pod-scale design scoring: rows shard over dp, scores line up
    row-for-row with the designs, and the numerics equal a per-device
    host loop with the same key folds."""
    from diffab_pytorch_tpu.parallel import sample_fanout_sharded, score_fanout_sharded

    mesh = make_mesh()
    ndp = mesh.shape["dp"]
    one = jax.tree.map(lambda x: x[:1], batch)
    state = harness.init(jax.random.key(8), one)
    designs = sample_fanout_sharded(
        harness, state.params, one, jax.random.key(9), mesh,
        n_designs=2 * ndp, n_steps=3,
    )
    kwargs = dict(t_grid=(1, 5), n_draws=1)
    sc = score_fanout_sharded(
        harness, state.params, one, designs, jax.random.key(11), mesh,
        **kwargs,
    )
    assert sc.score.shape == (2 * ndp,)
    assert np.isfinite(np.asarray(sc.score)).all()

    # per-device host loop with the same folds
    expect = []
    designs_host = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), designs)
    for d in range(ndp):
        local = jax.tree.map(lambda x: x[2 * d: 2 * d + 2], designs_host)
        k = jax.random.fold_in(jax.random.key(11), d)
        expect.append(np.asarray(
            harness.score_designs(state.params, one, local, k, **kwargs).score
        ))
    np.testing.assert_allclose(
        np.asarray(sc.score), np.concatenate(expect), rtol=2e-5, atol=1e-6
    )

    with pytest.raises(ValueError, match="not divisible"):
        score_fanout_sharded(
            harness, state.params, one,
            jax.tree.map(lambda x: x[: 2 * ndp - 1], designs),
            jax.random.key(11), mesh, **kwargs,
        )
