"""Training observability: TensorBoard summaries + JAX profiler traces.

The reference wires a ``SummaryWriter`` per split (ref ``main.py:139-143``)
but most summary calls are commented out (e.g. ``dla.py:205-261``); here a
single :class:`MetricLogger` writes train/valid/test scalars when a
TensorBoard backend is importable (torch's writer; optional) and always
keeps an in-memory history + JSONL log. ``profile_ctx`` wraps a step range
in a ``jax.profiler`` trace (the reference has no tracing at all,
SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, log_dir: Optional[str], enable_tensorboard: bool = True):
        self.log_dir = log_dir
        self.history = []
        self._writers = {}
        self._jsonl = None
        self._tb_cls = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            if enable_tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter
                    self._tb_cls = SummaryWriter
                except Exception:
                    self._tb_cls = None

    def _writer(self, split: str):
        if self._tb_cls is None or self.log_dir is None:
            return None
        if split not in self._writers:
            self._writers[split] = self._tb_cls(
                log_dir=os.path.join(self.log_dir, split))
        return self._writers[split]

    def log(self, split: str, step: int, metrics: Dict[str, float]) -> None:
        record = {"split": split, "step": int(step), "time": time.time()}
        record.update({k: float(v) for k, v in metrics.items()})
        self.history.append(record)
        if self._jsonl:
            self._jsonl.write(json.dumps(record) + "\n")
            self._jsonl.flush()
        writer = self._writer(split)
        if writer is not None:
            for k, v in metrics.items():
                writer.add_scalar(k, float(v), int(step))

    def close(self) -> None:
        if self._jsonl:
            self._jsonl.close()
        for w in self._writers.values():
            w.close()


@contextlib.contextmanager
def profile_ctx(log_dir: Optional[str]):
    """Trace the enclosed steps with jax.profiler when log_dir is set."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
