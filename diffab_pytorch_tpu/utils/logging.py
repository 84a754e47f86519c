"""Metric logging: stdout + CSV sinks, wandb-optional.

TPU-native equivalent of the reference's observability stack (WandbLogger +
Lightning log_dict, train.py:53-60, diffab_pytorch.py:889-922; SURVEY.md
§5.5): same metric names, pluggable sinks, host-side logging from
device_get'd scalars.  wandb is attempted only if importable AND explicitly
requested — never a hard dependency (and this environment has no egress).
"""

from __future__ import annotations

import csv
import os
import sys
import time
from typing import Dict, Optional

import jax


class MetricLogger:
    def __init__(
        self,
        csv_path: Optional[str] = None,
        use_wandb: bool = False,
        wandb_project: str = "diffab-pytorch-tpu",
        config: Optional[dict] = None,
        print_every: int = 1,
        file=sys.stdout,
    ):
        self.csv_path = csv_path
        self._csv_file = None
        self._csv_writer = None
        self._csv_fields = None
        self.print_every = print_every
        self._file = file
        self._t0 = time.time()
        self._wandb = None
        # Multi-host: every process runs the training loop (control flow
        # must stay identical for collective ops), but only process 0
        # owns the sinks — otherwise a pod prints/writes N copies of
        # every line (tests/test_multihost.py).
        self._primary = jax.process_index() == 0
        if use_wandb and self._primary:
            try:
                import wandb  # type: ignore

                self._wandb = wandb
                wandb.init(project=wandb_project, config=config or {})
            except Exception as e:  # no egress / not installed -> degrade
                print(f"[logging] wandb unavailable ({e}); continuing without",
                      file=file)

    def log(self, step: int, metrics: Dict[str, jax.Array | float]) -> None:
        if not self._primary:
            return
        scalars = {
            k: float(v) if not isinstance(v, float) else v
            for k, v in metrics.items()
        }
        if self.csv_path:
            if self._csv_writer is None:
                os.makedirs(os.path.dirname(self.csv_path) or ".", exist_ok=True)
                self._csv_fields = ["step", "wall_time"] + sorted(scalars)
                self._csv_file = open(self.csv_path, "a", newline="")
                self._csv_writer = csv.DictWriter(
                    self._csv_file, fieldnames=self._csv_fields, extrasaction="ignore"
                )
                if self._csv_file.tell() == 0:
                    self._csv_writer.writeheader()
            self._csv_writer.writerow(
                {"step": step, "wall_time": time.time() - self._t0, **scalars}
            )
            self._csv_file.flush()
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)
        if self.print_every and step % self.print_every == 0:
            msg = "  ".join(f"{k}={v:.4f}" for k, v in sorted(scalars.items()))
            print(f"[step {step}] {msg}", file=self._file, flush=True)

    def close(self):
        if self._csv_file:
            self._csv_file.close()
        if self._wandb is not None:
            self._wandb.finish()
