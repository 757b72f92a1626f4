"""Tracing / profiling helpers.

Counterpart of the reference's ad-hoc instrumentation (SURVEY.md §5):
``@print_time`` on every prune (pruners/utils.py:6-18), per-phase
wall-clock + peak CUDA memory dumped to ``training_statistics/{job}.yaml``
(train.py:584-585,695-707).  TPU equivalents: ``jax.profiler`` trace
annotations around phases + live-array HBM accounting (device
``memory_stats()`` is unavailable on some backends)."""

from __future__ import annotations

import contextlib
import functools
import logging
import os
import time
from typing import Dict, Optional


def device_live_bytes() -> int:
    """Sum of live jax array bytes (HBM lower bound)."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_in_use" in stats:
            return int(stats["bytes_in_use"])
    except Exception:  # noqa: BLE001 — backend-dependent
        pass
    return sum(x.nbytes for x in jax.live_arrays())


def print_time(func):
    """Reference pruners/utils.py:6-18 parity: log wall-clock per call."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        out = func(*args, **kwargs)
        logging.info("%s took %.2fs", func.__qualname__,
                     time.perf_counter() - t0)
        return out

    return wrapper


class PhaseTimer:
    """Collects {phase: seconds, phase_peak_gb} and writes the reference's
    training-statistics artifact."""

    def __init__(self):
        self.stats: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, trace: bool = False):
        import jax

        ctx = (jax.profiler.TraceAnnotation(name) if trace
               else contextlib.nullcontext())
        t0 = time.perf_counter()
        with ctx:
            yield
        self.stats[f"{name}_seconds"] = round(time.perf_counter() - t0, 3)
        self.stats[f"{name}_live_gb"] = round(
            device_live_bytes() / 2 ** 30, 3)

    def dump(self, output_dir: str, job_id: str,
             extra: Optional[Dict] = None) -> str:
        import yaml

        os.makedirs(os.path.join(output_dir, "training_statistics"),
                    exist_ok=True)
        path = os.path.join(output_dir, "training_statistics",
                            f"{job_id}.yaml")
        payload = dict(self.stats)
        if extra:
            payload.update(extra)
        with open(path, "w") as f:
            yaml.safe_dump(payload, f)
        return path


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler capture around a region when log_dir is set."""
    import jax

    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
