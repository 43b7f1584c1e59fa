"""Metric logging behind one interface; WandB optional.

The reference logs to WandB unconditionally (train.py:289-302, 357-382) with
metric keys ``train/{loss,position_loss,visible_loss,learning_rate}`` and
``eval/{...}``. This logger keeps those exact keys/cadence for curve parity,
degrades to absl logging + an in-memory history when wandb is missing, and
adds throughput counters.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from absl import logging

try:
    import wandb  # noqa: F401

    WANDB_AVAILABLE = True
except ImportError:
    WANDB_AVAILABLE = False


class MetricLogger:
    def __init__(
        self,
        project: str | None = None,
        entity: str | None = None,
        run_name: str | None = None,
        config: dict | None = None,
        use_wandb: bool = True,
        jsonl_path: str | None = None,
    ):
        self.history: list[dict[str, Any]] = []
        self._jsonl_path = jsonl_path
        self._wandb = None
        self._t0 = time.time()
        if use_wandb and WANDB_AVAILABLE and project:
            import wandb

            self._wandb = wandb.init(
                project=project, entity=entity, name=run_name, config=config or {}
            )
        elif use_wandb and project and not WANDB_AVAILABLE:
            logging.warning("wandb not installed; logging to absl/jsonl only")

    def log(self, metrics: dict[str, Any], step: int) -> None:
        record = {k: float(v) for k, v in metrics.items()}
        record["step"] = int(step)
        record["wall_s"] = time.time() - self._t0
        self.history.append(record)
        if self._wandb is not None:
            self._wandb.log({k: v for k, v in record.items() if k != "step"}, step=step)
        if self._jsonl_path:
            os.makedirs(os.path.dirname(os.path.abspath(self._jsonl_path)), exist_ok=True)
            with open(self._jsonl_path, "a") as f:
                f.write(json.dumps(record) + "\n")
        logging.info(
            "step %d: %s",
            step,
            ", ".join(f"{k}={v:.5g}" for k, v in record.items() if k != "step"),
        )

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()
