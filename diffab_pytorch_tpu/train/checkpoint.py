"""Checkpoint save/restore via orbax.

TPU-native equivalent of the reference's (implicit, Lightning-default)
checkpointing (SURVEY.md §5.4): explicit TrainState save/restore with
retention, resumable mid-run.  Diffusion schedule and IGSO(3) tables are
NOT checkpointed — they are recomputed deterministically at init (unlike
the reference's hash-keyed .pt cache, so3.py:18-50)."""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from diffab_pytorch_tpu.config import ModelConfig
from diffab_pytorch_tpu.train.harness import TrainState

_MODEL_CONFIG_FILE = "model_config.json"


def save_model_config(directory: str, model_cfg: ModelConfig) -> None:
    """Record the ARCHITECTURE next to the weights.  Inference entry points
    (cli.sample, cli.evaluate, probe scripts) must rebuild the exact
    parameter-tree shape; flags like self_conditioning or a non-default
    width change it, and a user should not have to remember them."""
    os.makedirs(os.path.abspath(directory), exist_ok=True)
    with open(os.path.join(os.path.abspath(directory),
                           _MODEL_CONFIG_FILE), "w") as fh:
        json.dump(dataclasses.asdict(model_cfg), fh, indent=2)


def load_model_config(directory: str) -> Optional[ModelConfig]:
    """The ModelConfig recorded by save_model_config, or None when the
    checkpoint predates it (callers fall back to flags/defaults).  Unknown
    keys are ignored so configs from newer code still load."""
    path = os.path.join(os.path.abspath(directory), _MODEL_CONFIG_FILE)
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        raw = json.load(fh)
    fields = {f.name for f in dataclasses.fields(ModelConfig)}
    known = {k: v for k, v in raw.items() if k in fields}
    known = {
        k: tuple(v) if isinstance(v, list) else v for k, v in known.items()
    }
    return ModelConfig(**known)


def _manager(directory: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        ),
    )


def save_checkpoint(directory: str, state: TrainState, *, wait: bool = True) -> int:
    step = int(state.step)
    mgr = _manager(directory)
    mgr.save(step, args=ocp.args.StandardSave(state))
    if wait:
        mgr.wait_until_finished()
    return step


def prune_after(directory: str, step: int) -> None:
    """Delete checkpoints NEWER than `step`.  Used by the trainer's
    divergence fallback: a periodic checkpoint written inside the one
    logging window where divergence is not yet visible would otherwise
    outrank (by step number) the good snapshot saved after fallback."""
    mgr = _manager(directory)
    for s in list(mgr.all_steps()):
        if s > step:
            mgr.delete(s)


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    return _manager(directory).latest_step()


def restore_checkpoint(
    directory: str, template: TrainState, step: Optional[int] = None
) -> TrainState:
    """Restore into the structure AND placement of `template`.

    The template's shardings are honored leaf-for-leaf: restoring into a
    mesh-sharded TrainState (e.g. `parallel.shard_state(state, mesh)`)
    yields arrays already laid out with those NamedShardings — orbax
    reshards at load time, so a checkpoint written replicated/single-device
    restores directly onto a (dp, tp) mesh and vice versa, with no
    gather-to-host round trip.  Pinned by
    tests/test_parallel.py::test_checkpoint_restore_sharded and exercised
    multi-device by __graft_entry__.dryrun_multichip."""
    mgr = _manager(directory)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoint found under {directory}")
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    return mgr.restore(step, args=ocp.args.StandardRestore(abstract))


def _checkpoint_has_ema(directory: str, step: int) -> bool:
    """Whether the saved TrainState carries a non-empty ema_params subtree.

    Read from the orbax item _METADATA (its tree_metadata maps stringified
    key paths to array specs) — CheckpointManager.item_metadata needs a
    handler registry this module does not keep."""
    path = os.path.join(
        os.path.abspath(directory), str(step), "default", "_METADATA"
    )
    if not os.path.exists(path):
        return False
    with open(path) as fh:
        meta = json.load(fh)
    tree = meta.get("tree_metadata", {})
    # ema_params=None is serialized as the single bare key "('ema_params',)"
    # — only NESTED paths ("('ema_params', 'params', ...)") mean weights
    return any(k.startswith("('ema_params', ") for k in tree)


def restore_params(
    directory: str, params_template, step: Optional[int] = None,
    prefer_ema: bool = True,
):
    """Restore ONLY the model params (+ step) from a TrainState checkpoint.

    Inference entry points (cli.sample, cli.evaluate) need the weights, not
    the optimizer state — and the opt_state tree shape depends on the
    TrainConfig the run used (lr schedule, weight decay), which a sampling
    CLI has no way to reconstruct.  A partial restore keeps checkpoints
    usable across optimizer-config changes.

    When the checkpoint carries EMA weights (TrainConfig.ema_decay > 0)
    and `prefer_ema`, those are returned instead of the raw params — EMA
    weights exist precisely to be the inference weights.  Returns
    (params, step)."""
    mgr = _manager(directory)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoint found under {directory}")
    params_key = "params"
    if prefer_ema and _checkpoint_has_ema(directory, step):
        params_key = "ema_params"
    item = {
        "step": jax.numpy.zeros((), jax.numpy.int32),
        params_key: params_template,
    }
    restored = mgr.restore(
        step,
        args=ocp.args.PyTreeRestore(
            item=item,
            restore_args=ocp.checkpoint_utils.construct_restore_args(item),
            partial_restore=True,
        ),
    )
    return restored[params_key], int(restored["step"])
