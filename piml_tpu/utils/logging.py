"""Structured metric logging: stdout + JSONL.

The reference logs by bare ``print`` (simulators.py:373-376,548-552); here the
same metric set flows through one logger that mirrors to a JSONL file for
machine consumption.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Optional


class MetricLogger:
    def __init__(self, jsonl_path: Optional[str] = None, stream=None):
        self.jsonl_path = jsonl_path
        self.stream = stream or sys.stdout
        self._fh = open(jsonl_path, "a") if jsonl_path else None

    def info(self, msg: str) -> None:
        print(msg, file=self.stream)

    def log(self, **metrics) -> None:
        parts = ", ".join(
            f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in metrics.items()
        )
        print(parts, file=self.stream)
        if self._fh:
            rec = {"ts": time.time(), **metrics}
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()

    def close(self) -> None:
        if self._fh:
            self._fh.close()
