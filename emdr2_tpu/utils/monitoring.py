"""Observability: device memory reporting, TensorBoard scalars, profiler.

Parity targets:
- ``report_memory`` (``/root/reference/megatron/utils.py:50-61``) — CUDA
  allocator stats become jax ``device.memory_stats()``;
- the TensorBoard writer (``global_vars.py:120-134``, ``training.py:276-320``)
  — optional, via torch's SummaryWriter when importable;
- the named timers + ``torch.cuda.synchronize`` tracing (``global_vars.py:
  172-250``) are in ``utils/timers.py``; deeper traces use ``jax.profiler``
  (:func:`profile_steps` context).
"""

from __future__ import annotations

import contextlib
from typing import Dict, Optional

import jax


def report_memory(prefix: str = "", printer=print) -> Dict[str, float]:
    """Per-device HBM usage in GB (utils.py:50-61 equivalent)."""
    out: Dict[str, float] = {}
    for dev in jax.local_devices():
        stats = dev.memory_stats() or {}
        used = stats.get("bytes_in_use", 0) / 1e9
        limit = stats.get("bytes_limit", 0) / 1e9
        peak = stats.get("peak_bytes_in_use", 0) / 1e9
        out[str(dev)] = used
        printer(f"{prefix}[{dev}] memory used {used:.2f} GB "
                f"| peak {peak:.2f} GB | limit {limit:.2f} GB")
    return out


class MetricsWriter:
    """TensorBoard scalar writer; no-op when tensorboard is unavailable."""

    def __init__(self, log_dir: Optional[str]):
        self._writer = None
        if log_dir is not None:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._writer = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._writer = None

    def scalars(self, metrics: Dict[str, float], step: int) -> None:
        if self._writer is None:
            return
        for k, v in metrics.items():
            try:
                self._writer.add_scalar(k, float(v), step)
            except Exception:
                pass

    def text(self, tag: str, value: str, step: int = 0) -> None:
        if self._writer is not None:
            self._writer.add_text(tag, value, step)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()


@contextlib.contextmanager
def profile_steps(log_dir: Optional[str]):
    """jax.profiler trace around a block of steps (view with TensorBoard or
    xprof). No-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
