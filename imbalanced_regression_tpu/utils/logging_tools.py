"""Observability: scalar metrics writer (TensorBoard + JSONL), JAX profiler
traces, and numerics-debug toggles.

The reference logs scalars to TensorBoard per epoch
(``imdb-wiki-dir/train.py:219-222``, ``nyud2-dir/train.py:209``) and measures
only wall-clock meters (SURVEY.md §5.1). The rebuild adds:

- a :class:`MetricsWriter` that mirrors every scalar to a ``metrics.jsonl``
  file (machine-readable run history) and to TensorBoard when available;
- :func:`profile_trace` — a context manager around ``jax.profiler`` for
  on-demand TPU traces (view with TensorBoard's profile plugin or xprof);
- :func:`enable_nan_debug` — flips ``jax_debug_nans`` so the first NaN in any
  jitted computation raises with a traceback (the functional analogue of the
  reference's runtime loss asserts).
"""

from __future__ import annotations

import contextlib
import json
import os
import time


class MetricsWriter:
    """Append-only scalar logger: JSONL always, TensorBoard when importable.

    Set ``DIR_TPU_TENSORBOARD=0`` to skip the TensorBoard backend — importing
    it drags in the full torch stack (~850 MB RSS measured on this host),
    which matters for RAM-budgeted runs; the JSONL mirror carries the same
    scalars either way."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a", buffering=1)
        self._tb = None
        if os.environ.get("DIR_TPU_TENSORBOARD", "1") != "0":
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir, flush_secs=2)
            except Exception:
                pass

    def log_scalar(self, tag: str, value: float, step: int) -> None:
        self._jsonl.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step), "time": time.time()}
        ) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def log_dict(self, scalars: dict, step: int, prefix: str = "") -> None:
        for key, value in scalars.items():
            if isinstance(value, (int, float)):
                self.log_scalar(f"{prefix}{key}", value, step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def host_memory_gb() -> tuple[float, float]:
    """(current RSS, peak RSS) of this process in GB (Linux ``/proc``).

    Production observability for the bounded-memory input modes
    (``data/streaming.py``): the stream/mmap paths promise host RSS stays at
    a few batches; the epoch log records whether that holds at 191k-image
    scale. Returns (0, 0) where /proc is unavailable."""
    cur = peak = 0.0
    try:
        with open("/proc/self/status") as fh:
            for line in fh:
                if line.startswith("VmRSS:"):
                    cur = int(line.split()[1]) / 1e6  # kB -> GB
                elif line.startswith("VmHWM:"):
                    peak = int(line.split()[1]) / 1e6
    except OSError:
        pass
    return cur, peak


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a JAX/TPU profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debug(enable: bool = True) -> None:
    import jax

    jax.config.update("jax_debug_nans", enable)
