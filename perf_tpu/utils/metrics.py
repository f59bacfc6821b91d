"""Observability: TensorBoard-compatible scalar/image logging + profiling.

The reference logs scalars via torch's SummaryWriter (``nerf.py:37,213-295``)
and has no profiling at all (SURVEY §5). Here: tensorboardX when available,
always mirrored to a JSONL stream (greppable, CI-friendly), plus wall-clock
phase timers and a rays/sec counter, and jax.profiler trace hooks.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager

try:
    from tensorboardX import SummaryWriter as _TBWriter
except Exception:  # pragma: no cover
    _TBWriter = None


class MetricsWriter:
    def __init__(self, log_dir: str | None):
        self.log_dir = log_dir
        self._tb = None
        self._jsonl = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            if _TBWriter is not None:
                self._tb = _TBWriter(log_dir=log_dir)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def add_scalar(self, tag: str, value, step: int):
        value = float(value)
        if self._tb:
            self._tb.add_scalar(tag, value, step)
        if self._jsonl:
            self._jsonl.write(json.dumps(
                {"tag": tag, "value": value, "step": int(step),
                 "t": time.time()}) + "\n")

    def add_scalars(self, scalars: dict, step: int):
        for tag, v in scalars.items():
            self.add_scalar(tag, v, step)

    def add_image(self, tag: str, img, step: int):
        # img: [H, W, C] float in [0,1]
        if self._tb is not None:
            import numpy as np
            self._tb.add_image(tag, np.asarray(img).transpose(2, 0, 1), step)

    def flush(self):
        if self._tb:
            self._tb.flush()
        if self._jsonl:
            self._jsonl.flush()

    def close(self):
        if self._tb:
            self._tb.close()
        if self._jsonl:
            self._jsonl.close()


@contextmanager
def phase_timer(writer: MetricsWriter | None, tag: str, step: int = 0,
                n_items: int | None = None, item_name: str = "items"):
    """Times a phase; logs seconds and optional items/sec throughput."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if writer is not None:
        writer.add_scalar(f"time/{tag}_sec", dt, step)
        if n_items:
            writer.add_scalar(f"throughput/{tag}_{item_name}_per_sec",
                              n_items / max(dt, 1e-9), step)


@contextmanager
def profiler_trace(log_dir: str | None):
    """jax.profiler trace around a block (view in TensorBoard / xprof)."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
