"""The training loop: data -> jitted steps -> metrics -> checkpoints.

TPU-native equivalent of the reference's `pl.Trainer(...).fit(model, dm)`
(train.py:98-108) without the framework: an explicit loop over prefetched
device batches, periodic validation (check_val_every_n_epoch=1 semantics),
CSV/stdout metrics with the reference's names, orbax checkpointing with
resume.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import numpy as np

from diffab_pytorch_tpu.data.dataset import PatchDataset
from diffab_pytorch_tpu.data.loader import PrefetchLoader
from diffab_pytorch_tpu.train import checkpoint as ckpt_lib
from diffab_pytorch_tpu.train.harness import DiffAb, TrainState
from diffab_pytorch_tpu.utils.logging import MetricLogger


def fit(
    harness: DiffAb,
    train_ds: PatchDataset,
    val_ds: Optional[PatchDataset] = None,
    *,
    epochs: Optional[int] = None,
    max_steps: Optional[int] = None,
    seed: Optional[int] = None,
    logger: Optional[MetricLogger] = None,
    checkpoint_dir: Optional[str] = None,
    resume: bool = True,
    sharding: Optional[jax.sharding.Sharding] = None,
    train_step=None,
    device_pool: bool = False,
) -> TrainState:
    """Run training; returns the final TrainState.

    `train_step` may be injected (e.g. the shard_map data-parallel step from
    `parallel/`); defaults to the single-device jitted step.

    `device_pool=True` uploads the whole (normalized) dataset to the device
    once and gathers per-step batches on device (`make_pool_train_step`) —
    the per-step host->device transfer drops from megabytes of features to
    4*batch bytes of indices.  On tunneled backends that transfer is the
    binding cost once the host cache is warm (measured 384 -> ~790
    samples/s at batch 32, DESIGN.md §3).  Single-device step only.
    """
    cfg = harness.config.train
    seed = cfg.seed if seed is None else seed
    epochs = cfg.epochs if epochs is None else epochs
    logger = logger or MetricLogger(print_every=cfg.log_every)

    key = jax.random.key(seed)
    loader = None
    if device_pool:
        if train_step is not None or sharding is not None:
            raise ValueError(
                "device_pool uses the single-device pool step; it cannot "
                "be combined with an injected train_step or sharding"
            )
        pool, _ = train_ds.device_pool()
        n_rows = pool.batch_size
        if n_rows < cfg.batch_size:
            raise ValueError(
                f"dataset ({n_rows} usable samples) smaller than "
                f"batch_size={cfg.batch_size}"
            )
        pool = jax.device_put(pool)
        first_batch = jax.tree.map(lambda x: x[: cfg.batch_size], pool)
    else:
        batches = train_ds.batches(
            batch_size=cfg.batch_size, shuffle=True, seed=seed, epochs=epochs
        )
        loader = PrefetchLoader(batches, sharding=sharding)
        first_batch, _ = next(iter(loader))
    k_init, key = jax.random.split(key)
    state = harness.init(k_init, first_batch)
    if checkpoint_dir and resume and ckpt_lib.latest_step(checkpoint_dir) is not None:
        state = ckpt_lib.restore_checkpoint(checkpoint_dir, state)
        print(f"[trainer] resumed from step {int(state.step)}")

    if device_pool:
        pool_step = harness.make_pool_train_step()
        step_fn = lambda state, idx, key: pool_step(state, pool, idx, key)
    else:
        step_fn = train_step or harness.make_train_step()
    eval_fn = harness.make_eval_step()

    steps_per_epoch = max(1, len(train_ds) // cfg.batch_size)
    t_last = time.time()
    # Divergence guard (evaluated at logging points only, so no extra
    # per-step device syncs).  A late-training spiral can leave the loss
    # finite-but-exploded (measured 0.52 -> 33k between logging points,
    # QUALITY.md); tracking only "last finite" would checkpoint the
    # exploded parameters.  A loss is "good" while it stays within 3x of
    # the best seen (+1 absolute, for near-zero losses).
    #
    # Two constraints shape the snapshot mechanics:
    #  * the default train step DONATES its input state, so holding a
    #    device reference across the next step would hold deleted buffers
    #    — snapshots are pulled to host with device_get;
    #  * train/loss is computed on the PRE-update params (harness
    #    train_step_impl), so the loss logged at step N says nothing about
    #    update N itself.  A snapshot taken at step N is therefore only
    #    PENDING until the NEXT logging window's loss (computed on params
    #    that include update N) also passes — a gradient burst landing
    #    exactly on a logging step can never be promoted to "good".
    state_good, step_good = jax.device_get(state), int(state.step)
    best_loss, last_ok_step = float("inf"), step_good
    pending = None  # (host_state, step) awaiting next-window validation
    near_best = lambda v: np.isfinite(v) and v <= 3.0 * best_loss + 1.0

    def run_eval(params, key):
        if val_ds is None:
            return
        ms = []
        for vb, _ in val_ds.batches(
            batch_size=cfg.batch_size, shuffle=False, epochs=1, drop_last=False
        ):
            key, k = jax.random.split(key)
            if sharding is not None:
                from diffab_pytorch_tpu.parallel.mesh import put_global

                vb = put_global(vb, sharding)
            ms.append(eval_fn(params, vb, k))
        if ms:
            agg = {
                k2: float(np.mean([float(m[k2]) for m in ms])) for k2 in ms[0]
            }
            logger.log(int(state.step), agg)

    def handle(batch, key):
        nonlocal state, t_last, state_good, step_good, best_loss
        nonlocal last_ok_step, pending
        # the step folds (key, state.step) internally; passing the same base
        # key avoids per-step host key ops (expensive on remote backends)
        state, metrics = step_fn(state, batch, key)
        step = int(state.step)
        if step % cfg.log_every == 0:
            now = time.time()
            metrics = dict(metrics)
            metrics["steps_per_sec"] = cfg.log_every / max(now - t_last, 1e-9)
            t_last = now
            logger.log(step, metrics)
            loss = float(metrics.get("train/loss", np.nan))
            if near_best(loss):
                best_loss = min(best_loss, loss)
                last_ok_step = step
                if pending is not None:
                    # a later window validated the pending snapshot
                    state_good, step_good = pending
                pending = (jax.device_get(state), step)
            else:
                pending = None  # the window after the snapshot went bad
        if checkpoint_dir and step % cfg.checkpoint_every == 0:
            if last_ok_step >= step - cfg.log_every:
                ckpt_lib.save_checkpoint(checkpoint_dir, state)
            else:
                print(f"[trainer] step {step}: loss diverged from best "
                      f"{best_loss:.4g}; not overwriting the checkpoint")
        if step % steps_per_epoch == 0:
            run_eval(state.params, key)
        return key

    if device_pool:
        total = ((epochs or 10**9) * max(1, n_rows // cfg.batch_size)
                 - int(state.step))
        idx_iter = train_ds.epoch_indices(
            cfg.batch_size, n_rows=n_rows, shuffle=True, seed=seed
        )
        for _ in range(max(total, 0)):
            if max_steps is not None and int(state.step) >= max_steps:
                break
            key = handle(next(idx_iter), key)
    else:
        key = handle(first_batch, key)
        for batch, _ in loader:
            if max_steps is not None and int(state.step) >= max_steps:
                break
            key = handle(batch, key)

    if int(state.step) > last_ok_step + cfg.log_every:
        # the run ended away from the best-loss region: return (and save)
        # the last VALIDATED snapshot instead of the diverged parameters
        # (pending is intentionally not used here — its validating window
        # never arrived, so it may already hold the first spiraled update)
        print(f"[trainer] final state diverged (best {best_loss:.4g}, "
              f"validated snapshot at step {step_good}); falling back")
        state = jax.device_put(state_good)
        if checkpoint_dir:
            # a periodic checkpoint may have landed inside the blind
            # logging window right after the explosion; remove anything
            # newer than the snapshot so restore picks the good one
            ckpt_lib.prune_after(checkpoint_dir, step_good)
    if checkpoint_dir:
        ckpt_lib.save_checkpoint(checkpoint_dir, state)
    return state
