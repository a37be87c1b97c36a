"""Structured observability (SURVEY.md section 5): per-iteration JSONL of
cost, gradient norm, trust-region radius, step quality, scene liveness —
replacing the reference's ad-hoc couts (src/sfm.cc:114-115,123-128)."""

from __future__ import annotations

import json
import time


class JsonlLogger:
    def __init__(self, path: str | None):
        self.path = path
        self._fh = open(path, "a") if path else None
        self.t0 = time.time()

    def log(self, event: str, **fields) -> None:
        if self._fh is None:
            return
        rec = {"t": round(time.time() - self.t0, 3), "event": event, **fields}
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
