"""Metrics/observability: tensorboard scalars, fenced timers, profiling.

SURVEY.md §5.1/§5.5: ``jax.profiler`` traces for per-kernel timelines
(tensorboard profile plugin is installed in-env), ``block_until_ready``-fenced
timers for RTF, structured per-host stdout logs.
"""
from __future__ import annotations

import contextlib
import json
import sys
import time
from typing import Optional

import jax


class MetricsWriter:
    """Tensorboard scalar writer with a stdout JSON fallback."""

    def __init__(self, logdir: Optional[str] = None):
        self._tb = None
        if logdir:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(logdir)
            except Exception:
                self._tb = None

    def scalars(self, step: int, values: dict, prefix: str = ""):
        clean = {f"{prefix}{k}": float(v) for k, v in values.items()}
        if self._tb is not None:
            for k, v in clean.items():
                self._tb.add_scalar(k, v, step)
        line = {"step": int(step), **{k: round(v, 6) for k, v in clean.items()}}
        print(json.dumps(line), file=sys.stdout, flush=True)

    def audio(self, step: int, tag: str, wav, sample_rate: int):
        if self._tb is not None:
            self._tb.add_audio(tag, wav[None, :], step, sample_rate)

    def close(self):
        if self._tb is not None:
            self._tb.close()


@contextlib.contextmanager
def fenced_timer(result: dict, key: str = "seconds"):
    """Wall-time a device computation correctly: fence before and after."""
    jax.effects_barrier()
    t0 = time.perf_counter()
    holder = {}
    yield holder
    if "value" in holder:
        jax.block_until_ready(holder["value"])
    result[key] = time.perf_counter() - t0


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/jax_trace"):
    """jax.profiler trace context (view in tensorboard's profile plugin)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def rtf(audio_seconds: float, wall_seconds: float) -> float:
    """Real-time factor: >1 means faster than real time."""
    return audio_seconds / max(wall_seconds, 1e-9)
