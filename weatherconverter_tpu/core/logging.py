"""Run logging: console + JSONL + optional wandb.

The reference logs through wandb inline in both train scripts
(reference: diffusion_model/train_ddpm.py:41-53,121-132 — project
'weather-converter-diffusion'; seg_model/train.py:45-60,250-254 — project
'weather-converter-seg'). This module provides the same call surface
(`init/log/finish`) with three sinks: stdout, an append-only metrics.jsonl
(always available, zero deps — the artifact of record in this environment),
and wandb when the package is importable and WCTPU_WANDB=1 (the image does
not bundle wandb; the hook is kept so the capability is wired).
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Optional


class MetricsLogger:
    def __init__(
        self,
        run_dir: str,
        project: str = "weather-converter",
        config: Optional[dict] = None,
        use_wandb: Optional[bool] = None,
    ):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._t0 = time.time()
        self._wandb = None
        if use_wandb is None:
            use_wandb = os.environ.get("WCTPU_WANDB") == "1"
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project=project, config=config or {})
            except Exception as e:  # wandb absent or offline
                print(f"[logging] wandb disabled: {e}", file=sys.stderr)
                self._wandb = None
        if config:
            with open(os.path.join(run_dir, "config.json"), "w") as f:
                json.dump(_jsonable(config), f, indent=2, default=str)

    def log(self, metrics: dict[str, Any], step: Optional[int] = None) -> None:
        rec = {k: _scalar(v) for k, v in metrics.items()}
        rec["_time"] = round(time.time() - self._t0, 3)
        if step is not None:
            rec["_step"] = int(step)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def print(self, msg: str) -> None:
        print(msg, flush=True)

    def finish(self) -> None:
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()


def _scalar(v):
    try:
        import numpy as np

        if hasattr(v, "item") and getattr(v, "size", 1) == 1:
            return v.item()
        if isinstance(v, (np.floating, np.integer)):
            return v.item()
    except Exception:
        pass
    return v


def _jsonable(obj):
    if hasattr(obj, "model_dump"):
        return obj.model_dump()
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    return obj
