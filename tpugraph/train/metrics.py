"""Step-scoped metrics sinks (SURVEY.md §5.5): JSONL always, TensorBoard
optionally.

Each JSONL line is one JSON record; the first line records the full config
for provenance.  ``path=None`` disables the sink (records are just dropped).
``tb_dir`` adds a TensorBoard event-file sink (torch.utils.tensorboard is in
the baked image): every numeric field of a record becomes a scalar, stepped
by the record's ``epoch``/``step`` field.
"""

from __future__ import annotations

import json
import time


class MetricsLogger:
    def __init__(self, path: str | None, config: dict | None = None,
                 tb_dir: str | None = None):
        self._f = open(path, "a") if path else None
        if self._f and config is not None:
            self._write({"_config": config, "_t": time.time()})
        self._tb = None
        if tb_dir:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=tb_dir)
            if config is not None:
                self._tb.add_text("config", json.dumps(config), 0)

    def _write(self, rec: dict):
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def log(self, rec: dict):
        if self._f:
            self._write({**rec, "_t": time.time()})
        if self._tb is not None:
            step = int(rec.get("epoch", rec.get("step", 0)))
            for k, v in rec.items():
                if k not in ("epoch", "step") and isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, step)

    def close(self):
        if self._f:
            self._f.close()
            self._f = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None
