"""Step-scoped JSONL metrics sink (SURVEY.md §5.5).

Each line is one JSON record; the first line records the full config for
provenance.  ``path=None`` disables the sink (records are just dropped)."""

from __future__ import annotations

import json
import time


class MetricsLogger:
    def __init__(self, path: str | None, config: dict | None = None):
        self._f = open(path, "a") if path else None
        if self._f and config is not None:
            self._write({"_config": config, "_t": time.time()})

    def _write(self, rec: dict):
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def log(self, rec: dict):
        if self._f:
            self._write({**rec, "_t": time.time()})

    def close(self):
        if self._f:
            self._f.close()
            self._f = None
