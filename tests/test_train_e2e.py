"""End-to-end training slice: tiny model on a synthetic K-patch.

The reference never had a green end-to-end path (its data/train seams are
broken, SURVEY.md §2.9#2-3, §4) — this is BASELINE config #1 territory:
2 IPA blocks, d=32, one patch, CPU-runnable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffab_pytorch_tpu.config import tiny_config
from diffab_pytorch_tpu.data.batch import synthetic_batch
from diffab_pytorch_tpu.train import DiffAb


@pytest.fixture(scope="module")
def harness():
    return DiffAb(tiny_config())


@pytest.fixture(scope="module")
def batch():
    return synthetic_batch(jax.random.key(0), 2, 48, 15, n_generate=12)


def test_init_and_single_step(harness, batch):
    state = harness.init(jax.random.key(1), batch)
    step = harness.make_train_step(donate=False)
    state2, metrics = step(state, batch, jax.random.key(2))
    assert int(state2.step) == 1
    for name in ["train/seq_loss", "train/translations_loss",
                 "train/orientations_loss", "train/loss"]:
        assert name in metrics
        assert np.isfinite(float(metrics[name]))
    # params actually moved
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        state.params, state2.params)
    assert max(jax.tree.leaves(diff)) > 0


def test_loss_decreases(harness, batch):
    """~60 steps on one batch must reduce the fixed-key eval loss (overfit
    smoke).  Eval uses the SAME key before/after so the comparison isn't
    polluted by the per-step random timestep draw."""
    state = harness.init(jax.random.key(3), batch)
    step = harness.make_train_step()
    ev = harness.make_eval_step()
    eval_key = jax.random.key(99)
    before = float(ev(state.params, batch, eval_key)["val/loss"])
    for i in range(60):
        state, _ = step(state, batch, jax.random.fold_in(jax.random.key(4), i))
    after = float(ev(state.params, batch, eval_key)["val/loss"])
    assert after < before, f"loss did not decrease: {before} -> {after}"


def test_eval_step(harness, batch):
    state = harness.init(jax.random.key(5), batch)
    ev = harness.make_eval_step()
    metrics = ev(state.params, batch, jax.random.key(6))
    assert "val/loss" in metrics and np.isfinite(float(metrics["val/loss"]))


def test_determinism(harness, batch):
    """Same key -> bit-identical metrics (seeded determinism, the
    reference's seed_everything contract, train.py:51)."""
    state = harness.init(jax.random.key(7), batch)
    step = harness.make_train_step(donate=False)
    _, m1 = step(state, batch, jax.random.key(8))
    _, m2 = step(state, batch, jax.random.key(8))
    assert float(m1["train/loss"]) == float(m2["train/loss"])
