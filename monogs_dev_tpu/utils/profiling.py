"""Phase timers + metrics logging.

The reference's observability is CUDA-event wall-clock FPS plus wandb
(SURVEY.md §5). Here: named phase timers with summary stats, a JSONL
metrics log in the run directory (wandb-equivalent, no network), and an
optional `jax.profiler` trace context for TPU-level inspection.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional


class PhaseTimers:
    """Accumulating host-side wall-clock timers keyed by phase name."""

    def __init__(self):
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.total[name] += time.time() - t0
            self.count[name] += 1

    def summary(self) -> Dict[str, dict]:
        return {
            name: {
                "total_s": round(self.total[name], 4),
                "count": self.count[name],
                "mean_ms": round(1000.0 * self.total[name] / max(self.count[name], 1), 3),
            }
            for name in sorted(self.total)
        }


class MetricsLogger:
    """JSONL metrics stream (the wandb stand-in; one object per log call)."""

    def __init__(self, save_dir: Optional[str], filename: str = "metrics.jsonl"):
        self.path = (
            os.path.join(save_dir, filename) if save_dir is not None else None
        )
        if self.path is not None:
            os.makedirs(save_dir, exist_ok=True)

    def log(self, metrics: dict, step: Optional[int] = None) -> None:
        if self.path is None:
            return
        record = dict(metrics)
        if step is not None:
            record["step"] = step
        record["ts"] = time.time()
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(json.dumps(record) + "\n")


class CompileCounter:
    """Counts XLA compilations (including persistent-cache loads) by
    listening to the pxla 'Compiling <name> ...' log records.

    Used by bench.py to ASSERT that the measured steady-state window runs
    zero compiles — the round-1 driver bench lost ~20x to compiles landing
    inside the timed segment (VERDICT r1)."""

    def __init__(self):
        import logging

        self.count = 0
        self.names = []

        class _H(logging.Handler):
            def emit(_self, record):
                msg = record.getMessage()
                if msg.startswith("Compiling "):
                    self.count += 1
                    self.names.append(msg.split(" ")[1])

        self._handler = _H(level=logging.DEBUG)
        self._logger = logging.getLogger("jax._src.interpreters.pxla")

    def __enter__(self):
        self._prev_level = self._logger.level
        self._logger.setLevel(1)  # pxla logs compiles at DEBUG by default
        self._logger.addHandler(self._handler)
        return self

    def __exit__(self, *exc):
        self._logger.removeHandler(self._handler)
        self._logger.setLevel(self._prev_level)
        return False


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
