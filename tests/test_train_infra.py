"""Training-infrastructure tests: checkpoint round-trip, metric logging,
debug checking, trainer fit loop on synthetic patches."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffab_pytorch_tpu.config import tiny_config
from diffab_pytorch_tpu.data.batch import synthetic_batch
from diffab_pytorch_tpu.train import DiffAb
from diffab_pytorch_tpu.train import checkpoint as ckpt
from diffab_pytorch_tpu.utils.debug import assert_all_finite, checked_fn
from diffab_pytorch_tpu.utils.logging import MetricLogger


@pytest.fixture(scope="module")
def harness():
    return DiffAb(tiny_config())


@pytest.fixture(scope="module")
def batch():
    return synthetic_batch(jax.random.key(0), 2, 32, 15, n_generate=8)


def test_checkpoint_roundtrip(harness, batch, tmp_path):
    state = harness.init(jax.random.key(1), batch)
    step = harness.make_train_step(donate=False)
    state, _ = step(state, batch, jax.random.key(2))

    d = str(tmp_path / "ckpt")
    saved_step = ckpt.save_checkpoint(d, state)
    assert saved_step == 1
    assert ckpt.latest_step(d) == 1

    template = harness.init(jax.random.key(3), batch)  # different params
    restored = ckpt.restore_checkpoint(d, template)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # restoring from an empty dir raises cleanly
    with pytest.raises(FileNotFoundError):
        ckpt.restore_checkpoint(str(tmp_path / "nope"), template)


def test_restore_params_ignores_opt_state_shape(harness, batch, tmp_path):
    """Params-only restore (the cli.sample path) must work even when the
    restoring process would build a DIFFERENT opt_state tree than the one
    trained with (e.g. checkpoint from a run with an lr schedule /
    weight-decay chain).  Regression: restore_checkpoint used to require a
    full TrainState template, so inference broke on any optimizer-config
    mismatch."""
    import dataclasses

    from diffab_pytorch_tpu.config import TrainConfig

    cfg = dataclasses.replace(
        tiny_config(),
        train=TrainConfig(lr_decay_steps=50, weight_decay=0.01),
    )
    trainer = DiffAb(cfg)  # a longer optax chain than tiny_config's
    state = trainer.init(jax.random.key(1), batch)
    step = trainer.make_train_step(donate=False)
    state, _ = step(state, batch, jax.random.key(2))
    d = str(tmp_path / "ckpt_sched")
    ckpt.save_checkpoint(d, state)

    template = harness.init(jax.random.key(3), batch).params
    params, at_step = ckpt.restore_params(d, template)
    assert at_step == 1
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(FileNotFoundError):
        ckpt.restore_params(str(tmp_path / "nope"), template)


def test_checkpoint_retention(harness, batch, tmp_path):
    state = harness.init(jax.random.key(4), batch)
    step = harness.make_train_step(donate=False)
    d = str(tmp_path / "ckpt2")
    for i in range(5):
        state, _ = step(state, batch, jax.random.key(5 + i))
        ckpt.save_checkpoint(d, state)
    assert ckpt.latest_step(d) == 5
    kept = sorted(int(x) for x in os.listdir(d) if x.isdigit())
    assert len(kept) <= 3  # max_to_keep


def test_metric_logger_csv(tmp_path):
    import io

    path = str(tmp_path / "m.csv")
    buf = io.StringIO()
    logger = MetricLogger(csv_path=path, print_every=2, file=buf)
    logger.log(1, {"train/loss": jnp.float32(2.5)})
    logger.log(2, {"train/loss": jnp.float32(2.0)})
    logger.close()

    lines = open(path).read().strip().splitlines()
    assert lines[0].startswith("step,wall_time")
    assert len(lines) == 3
    assert "2.0" in lines[2]
    assert "[step 2]" in buf.getvalue()
    assert "[step 1]" not in buf.getvalue()  # print_every=2


def test_checked_fn_catches_nan():
    f = checked_fn(lambda x: jnp.log(x).sum())
    assert np.isfinite(float(f(jnp.ones(3))))
    with pytest.raises(Exception, match="nan"):
        f(jnp.array([-1.0, 1.0, 2.0]))


def test_assert_all_finite():
    assert_all_finite({"a": jnp.ones(3)})
    with pytest.raises(FloatingPointError, match="bad"):
        assert_all_finite({"bad": jnp.array([jnp.nan])}, name="bad")


def test_fit_loop_smoke(tmp_path):
    """trainer.fit over real .npz patches: runs, checkpoints, logs."""
    import dataclasses

    from diffab_pytorch_tpu.config import TrainConfig
    from diffab_pytorch_tpu.data.dataset import PatchDataset
    from diffab_pytorch_tpu.structure import antibody, featurize_patch, parse_pdb, save_patch
    from diffab_pytorch_tpu.structure.testing import make_synthetic_antibody_pdb
    from diffab_pytorch_tpu.train.trainer import fit
    from diffab_pytorch_tpu.utils.logging import MetricLogger

    pdir = tmp_path / "patches"
    pdir.mkdir()
    for i in range(4):
        c = antibody.from_chains(
            parse_pdb(make_synthetic_antibody_pdb(seed=i)), "H", "L", ["A"],
            keep_fv_only=True,
        )
        save_patch(str(pdir / f"s{i}.npz"), featurize_patch(c, patch_size=48))

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        train=TrainConfig(batch_size=2, log_every=2, checkpoint_every=3, seed=0),
    )
    harness = DiffAb(cfg)
    ds = PatchDataset.from_dir(str(pdir))
    csv = str(tmp_path / "metrics.csv")
    state = fit(
        harness, ds, None,
        epochs=4, max_steps=6,
        logger=MetricLogger(csv_path=csv, print_every=0),
        checkpoint_dir=str(tmp_path / "ck"),
    )
    assert int(state.step) >= 6
    assert ckpt.latest_step(str(tmp_path / "ck")) == int(state.step)
    assert os.path.exists(csv)

    # resume continues from the saved step
    state2 = fit(
        harness, ds, None,
        epochs=4, max_steps=8,
        logger=MetricLogger(print_every=0),
        checkpoint_dir=str(tmp_path / "ck"),
        resume=True,
    )
    assert int(state2.step) >= 8


def test_pool_step_matches_plain_step(tmp_path):
    """The device-pool gather step is numerically the plain step on the
    gathered batch: same rows + same key => identical params."""
    import dataclasses

    from diffab_pytorch_tpu.config import TrainConfig
    from diffab_pytorch_tpu.data.dataset import PatchDataset
    from diffab_pytorch_tpu.structure import (
        antibody, featurize_patch, parse_pdb, save_patch,
    )
    from diffab_pytorch_tpu.structure.testing import make_synthetic_antibody_pdb

    pdir = tmp_path / "patches"
    pdir.mkdir()
    for i in range(4):
        c = antibody.from_chains(
            parse_pdb(make_synthetic_antibody_pdb(seed=i)), "H", "L", ["A"],
            keep_fv_only=True,
        )
        save_patch(str(pdir / f"s{i}.npz"), featurize_patch(c, patch_size=48))

    cfg = dataclasses.replace(tiny_config(), train=TrainConfig(batch_size=2))
    harness = DiffAb(cfg)
    ds = PatchDataset.from_dir(str(pdir))
    pool, _ = ds.device_pool()
    assert pool.batch_size == 4

    idx = jnp.asarray([2, 1], jnp.int32)
    gathered = jax.tree.map(lambda x: x[np.asarray(idx)], pool)
    state = harness.init(jax.random.key(0), gathered)

    plain_step = harness.make_train_step(donate=False)
    pool_step = harness.make_pool_train_step(donate=False)
    key = jax.random.key(3)
    s_plain, m_plain = plain_step(state, gathered, key)
    s_pool, m_pool = pool_step(state, pool, idx, key)
    np.testing.assert_array_equal(
        np.asarray(m_plain["train/loss"]), np.asarray(m_pool["train/loss"])
    )
    for a, b in zip(jax.tree.leaves(s_plain.params),
                    jax.tree.leaves(s_pool.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # steps_per_call=k (round-4 dispatch-gap lever): the scanned k-step
    # program is EXACTLY the k=1 chain — the per-step key fold rides
    # state.step inside the jit, so the scan consumes the same key
    # sequence as sequential dispatches with the same base key
    idx2 = jnp.asarray([0, 3], jnp.int32)
    s_seq, _ = pool_step(state, pool, idx, key)
    s_seq, m_seq = pool_step(s_seq, pool, idx2, key)
    multi_step = harness.make_pool_train_step(donate=False, steps_per_call=2)
    s_multi, m_multi = multi_step(state, pool, jnp.stack([idx, idx2]), key)
    assert m_multi["train/loss"].shape == (2,)  # stacked per-step metrics
    np.testing.assert_array_equal(
        np.asarray(m_seq["train/loss"]), np.asarray(m_multi["train/loss"][1])
    )
    for a, b in zip(jax.tree.leaves(s_seq.params),
                    jax.tree.leaves(s_multi.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(s_multi.step) == int(state.step) + 2


def test_fit_device_pool(tmp_path):
    """fit(device_pool=True) trains, checkpoints, and refuses to combine
    with an injected step."""
    import dataclasses

    from diffab_pytorch_tpu.config import TrainConfig
    from diffab_pytorch_tpu.data.dataset import PatchDataset
    from diffab_pytorch_tpu.structure import (
        antibody, featurize_patch, parse_pdb, save_patch,
    )
    from diffab_pytorch_tpu.structure.testing import make_synthetic_antibody_pdb
    from diffab_pytorch_tpu.train.trainer import fit
    from diffab_pytorch_tpu.utils.logging import MetricLogger

    pdir = tmp_path / "patches"
    pdir.mkdir()
    for i in range(4):
        c = antibody.from_chains(
            parse_pdb(make_synthetic_antibody_pdb(seed=i)), "H", "L", ["A"],
            keep_fv_only=True,
        )
        save_patch(str(pdir / f"s{i}.npz"), featurize_patch(c, patch_size=48))

    cfg = dataclasses.replace(
        tiny_config(),
        train=TrainConfig(batch_size=2, log_every=2, checkpoint_every=3,
                          seed=0),
    )
    harness = DiffAb(cfg)
    ds = PatchDataset.from_dir(str(pdir))
    state = fit(
        harness, ds, None,
        epochs=4, max_steps=5,
        logger=MetricLogger(print_every=0),
        checkpoint_dir=str(tmp_path / "ck"),
        device_pool=True,
    )
    assert int(state.step) >= 5
    assert ckpt.latest_step(str(tmp_path / "ck")) == int(state.step)

    with pytest.raises(ValueError, match="device_pool"):
        fit(harness, ds, None, epochs=1, device_pool=True,
            train_step=lambda *a: None)


def test_model_config_save_load_roundtrip(tmp_path):
    import dataclasses as dc

    from diffab_pytorch_tpu.config import tiny_config
    from diffab_pytorch_tpu.train.checkpoint import (
        load_model_config, save_model_config,
    )

    cfg = dc.replace(tiny_config().model, self_conditioning=True,
                     compute_dtype="bfloat16")
    save_model_config(str(tmp_path), cfg)
    assert load_model_config(str(tmp_path)) == cfg
    # absent file -> None (pre-feature checkpoints)
    assert load_model_config(str(tmp_path / "nope")) is None
    # unknown keys from newer code are ignored
    import json, os
    p = os.path.join(str(tmp_path), "model_config.json")
    with open(p) as fh:
        raw = json.load(fh)
    raw["a_future_field"] = 42
    with open(p, "w") as fh:
        json.dump(raw, fh)
    assert load_model_config(str(tmp_path)) == cfg


def test_fit_divergence_guard(tmp_path):
    """A finite-but-exploded loss after convergence must not be shipped:
    fit falls back to the best-loss snapshot and refuses to overwrite the
    checkpoint with diverged parameters (QUALITY.md: measured spiral
    0.52 -> 33k between logging points).

    Uses the DEFAULT donated train step: the guard must snapshot to host
    (a device reference would be deleted by the next step's donation) —
    regression test for the round-2 advisor finding."""
    import dataclasses

    import jax.numpy as jnp

    from diffab_pytorch_tpu.config import TrainConfig
    from diffab_pytorch_tpu.data.dataset import PatchDataset
    from diffab_pytorch_tpu.structure import antibody, featurize_patch, parse_pdb, save_patch
    from diffab_pytorch_tpu.structure.testing import make_synthetic_antibody_pdb
    from diffab_pytorch_tpu.train.harness import TrainState
    from diffab_pytorch_tpu.train.trainer import fit
    from diffab_pytorch_tpu.utils.logging import MetricLogger

    pdir = tmp_path / "patches"
    pdir.mkdir()
    for i in range(2):
        c = antibody.from_chains(
            parse_pdb(make_synthetic_antibody_pdb(seed=i)), "H", "L", ["A"],
            keep_fv_only=True,
        )
        save_patch(str(pdir / f"s{i}.npz"), featurize_patch(c, patch_size=48))

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        train=TrainConfig(batch_size=2, log_every=2, checkpoint_every=5,
                          seed=0),
    )
    harness = DiffAb(cfg)
    real_step = harness.make_train_step()  # donate=True (the default)

    def spiral_step(state, batch, key):
        state, metrics = real_step(state, batch, key)
        if int(state.step) > 4:  # deterministic finite explosion
            state = TrainState(
                step=state.step,
                params=jax.tree.map(lambda x: x * 1e6, state.params),
                opt_state=state.opt_state,
            )
            metrics = dict(metrics, **{"train/loss": jnp.asarray(1e9)})
        return state, metrics

    state = fit(
        harness, PatchDataset.from_dir(str(pdir)), None,
        epochs=10, max_steps=10,
        logger=MetricLogger(print_every=0),
        checkpoint_dir=str(tmp_path / "ck"),
        train_step=spiral_step,
    )
    # The returned state is a VALIDATED pre-explosion snapshot, not the
    # 1e6 params.  The step-4 snapshot is pending-but-unvalidated (the
    # very next window exploded, and train/loss is computed on pre-update
    # params, so step 4's own update was never vouched for); the newest
    # snapshot a later good window validated is step 2.
    assert int(state.step) == 2
    assert max(float(jnp.abs(x).max()) for x in jax.tree.leaves(state.params)) < 1e3
    # the final checkpoint holds the good snapshot too (the exploded
    # step-5 periodic checkpoint was pruned)
    assert ckpt.latest_step(str(tmp_path / "ck")) == 2


# ---------------------------------------------------------------------------
# Robust-training knobs (round 3): update clipping + parameter EMA
# ---------------------------------------------------------------------------

def test_optimizer_decomposition_matches_optax_adam(harness, batch):
    """With update_clip_rms=0 the decomposed chain (scale_by_adam +
    scale_by_learning_rate) must produce bit-identical updates to
    optax.adam — the decomposition exists only to give the update clip a
    seat between the normalization and the lr."""
    import optax

    state = harness.init(jax.random.key(11), batch)
    (_, _), grads = jax.value_and_grad(
        lambda p: harness.loss_fn(p, jax.random.key(12), batch),
        has_aux=True,
    )(state.params)

    t = harness.config.train
    ref = optax.adam(t.lr, b1=t.betas[0], b2=t.betas[1], eps=t.adam_eps)
    ref_updates, _ = jax.jit(ref.update)(
        grads, jax.jit(ref.init)(state.params), state.params
    )
    ours_updates, _ = jax.jit(harness.optimizer.update)(
        grads, state.opt_state, state.params
    )
    for a, b in zip(jax.tree.leaves(ref_updates), jax.tree.leaves(ours_updates)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_update_clip_bounds_parameter_movement(batch):
    """update_clip_rms=c bounds every leaf's per-step movement at
    c * lr in RMS — even against adversarially scaled gradients (the
    tiny-nu burst regime grad clipping cannot bound)."""
    import dataclasses

    from diffab_pytorch_tpu.config import TrainConfig, tiny_config

    cap, lr = 1.0, 1e-2
    cfg = dataclasses.replace(
        tiny_config(),
        train=TrainConfig(lr=lr, update_clip_rms=cap),
    )
    h = DiffAb(cfg)
    state = h.init(jax.random.key(13), batch)
    step = h.make_train_step(donate=False)
    new_state, _ = step(state, batch, jax.random.key(14))
    for p0, p1 in zip(jax.tree.leaves(state.params),
                      jax.tree.leaves(new_state.params)):
        delta = np.asarray(p1) - np.asarray(p0)
        rms = float(np.sqrt(np.mean(delta**2)))
        assert rms <= cap * lr * (1 + 1e-5), rms


def test_ema_blend_and_checkpoint_preference(batch, tmp_path):
    """EMA params follow ema = d*ema + (1-d)*params each step, ride the
    checkpoint, and restore_params prefers them; checkpoints WITHOUT EMA
    keep returning the raw params."""
    import dataclasses

    from diffab_pytorch_tpu.config import TrainConfig, tiny_config

    d = 0.5  # aggressive decay so the blend is visibly mid-way
    cfg = dataclasses.replace(
        tiny_config(), train=TrainConfig(lr=1e-3, ema_decay=d)
    )
    h = DiffAb(cfg)
    state0 = h.init(jax.random.key(15), batch)
    assert state0.ema_params is not None
    step = h.make_train_step(donate=False)
    state1, _ = step(state0, batch, jax.random.key(16))

    # one step from ema == params0: expected ema1 = d*params0 + (1-d)*params1
    for e0, p1, e1 in zip(jax.tree.leaves(state0.params),
                          jax.tree.leaves(state1.params),
                          jax.tree.leaves(state1.ema_params)):
        want = d * np.asarray(e0, np.float64) + (1 - d) * np.asarray(p1, np.float64)
        np.testing.assert_allclose(np.asarray(e1), want, rtol=0, atol=1e-6)

    dd = str(tmp_path / "ema_ck")
    ckpt.save_checkpoint(dd, state1)
    got, at = ckpt.restore_params(dd, state0.params)
    assert at == 1
    for g, e in zip(jax.tree.leaves(got), jax.tree.leaves(state1.ema_params)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(e))
    raw, _ = ckpt.restore_params(dd, state0.params, prefer_ema=False)
    for g, p in zip(jax.tree.leaves(raw), jax.tree.leaves(state1.params)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(p))


def test_restore_params_without_ema_unchanged(harness, batch, tmp_path):
    """prefer_ema on a checkpoint from an ema_decay=0 run silently falls
    back to the raw params (backwards compatibility with every existing
    checkpoint)."""
    state = harness.init(jax.random.key(17), batch)
    assert state.ema_params is None
    d = str(tmp_path / "noema_ck")
    ckpt.save_checkpoint(d, state)
    got, at = ckpt.restore_params(d, state.params, prefer_ema=True)
    assert at == 0
    for g, p in zip(jax.tree.leaves(got), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(p))
