"""Metrics/observability: tensorboard scalars, device timers, profiling.

SURVEY.md §5.1/§5.5: ``jax.profiler`` traces for per-kernel timelines
(tensorboard profile plugin is installed in-env), slope-method device timers
for RTF, structured per-host stdout logs.

Timing methodology (the ONE valid way to time on this runtime): the remote
TPU runtime pipelines executions and its ``jax.block_until_ready`` is a
no-op, so fenced wall-clock timing measures dispatch, not execution.
``slope_time`` instead measures the SLOPE of wall time vs number of chained
dispatches, with a scalar fetch of the final output forcing completion —
RPC latency, transfer, and fetch constants cancel out.  Validated at 98% of
bf16 MXU peak on a pure matmul chain (docs/STATUS.md).
"""
from __future__ import annotations

import contextlib
import json
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp


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


def force_fetch(out) -> float:
    """Force device completion by fetching a scalar reduction of every array
    leaf.  ``block_until_ready`` is a no-op on the remote TPU runtime; a data
    fetch is the only reliable execution fence (docs/STATUS.md timing note).
    """
    total = 0.0
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "dtype") and getattr(leaf, "size", 0):
            total += float(jnp.sum(leaf.astype(jnp.float32)))
    return total


def slope_time(fn, args, *, k_lo: int = 2, k_hi: int = 12) -> float:
    """Per-call device time of ``fn(*args)`` via the slope method (see module
    docstring).  ``args`` is a tuple, or a callable ``i -> tuple`` to vary
    arguments per dispatch.  Warms up (compiles) first; returns seconds/call.

    CAUTION: the remote runtime memoizes dispatches by input VALUE (observed:
    a 43-GFLOP kernel "measured" at 1.9 us under repeated identical args).
    The index ``i`` passed to ``args_for`` is GLOBALLY monotonic across the
    warmup and both timing runs, so a caller whose args genuinely vary with
    ``i`` (e.g. ``jax.random.PRNGKey(i)``) never replays a value.  Passing a
    fixed args tuple still under-measures — use ``slope_time_jittered``.
    """
    args_for = args if callable(args) else (lambda i: args)
    seq = iter(range(1 << 30))

    def run(k: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn(*args_for(next(seq)))
        force_fetch(out)
        return time.perf_counter() - t0

    force_fetch(fn(*args_for(next(seq))))  # warm fn and the fetch program
    t_lo = run(k_lo)
    t_hi = run(k_hi)
    return max((t_hi - t_lo) / (k_hi - k_lo), 1e-9)


def slope_time_chained(step, carry, static_args=(), *, k_lo: int = 2,
                       k_hi: int = 12) -> float:
    """Slope-method timing with a data-dependency chain: ``step`` maps
    ``(carry, *static_args) -> carry`` and dispatch i consumes dispatch
    i-1's output.  This defeats the runtime's coalescing of identical
    dispatches (see ``slope_time`` caution) — the robust way to time a
    single kernel.  ``step`` should be jitted; carry is any pytree.

    The chain CONTINUES across the two timing runs (run 2 starts from run
    1's final carry), so no (executable, input-value) pair ever repeats —
    replaying the same chain prefix gets served from the runtime's
    value-memoization and fakes a shallower slope.
    """
    c = step(carry, *static_args)
    force_fetch(c)

    def run(c, k: int):
        t0 = time.perf_counter()
        for _ in range(k):
            c = step(c, *static_args)
        force_fetch(c)
        return c, time.perf_counter() - t0

    c, t_lo = run(c, k_lo)
    _, t_hi = run(c, k_hi)
    return max((t_hi - t_lo) / (k_hi - k_lo), 1e-9)


def slope_time_jittered(op, x0, static_args=(), *, k_lo: int = 2,
                        k_hi: int = 12) -> float:
    """Chained slope timing of ``op(x0, *static_args)`` with a jittered,
    never-repeating carry — the robust way to time one kernel on this
    runtime (see ``slope_time`` caution; discovered via a 43-GFLOP kernel
    "measuring" 1.9 us under identical repeated dispatches).

    The carry is ``(x0_f32 * jitter(i) + 1e-30 * sum(op(x)), i)`` held in
    FP32 regardless of ``x0.dtype`` (cast to the op's dtype inside the
    step): in bf16 the whole jitter range is below one ulp at 1.0 and the
    1e-30 coupling underflows in the add, so a bf16 carry would be bitwise
    x0 every dispatch — the fp32 carry plus the monotonic counter ``i``
    guarantee the dispatched input values never repeat.  The coupling sums
    EVERY output leaf's full contents — a single-element couple lets XLA
    slice-fuse / dead-code-eliminate the op (observed: an XLA transposed
    conv "measured" 0 us that way).
    """
    x0f = x0.astype(jnp.float32)

    def step(carry, *static):
        x, i = carry                       # x: fp32, never value-repeats
        y = op(x.astype(x0.dtype), *static)
        total = jnp.float32(0.0)
        for leaf in jax.tree.leaves(y):
            total += jnp.sum(leaf.astype(jnp.float32))
        j = ((i * 48271) % 2048).astype(jnp.float32) / 2048.0
        jm = 0.999 + 0.002 * j
        return (x0f * jm + total * jnp.float32(1e-30), i + 1)

    return slope_time_chained(jax.jit(step), (x0f, jnp.int32(0)),
                              static_args, k_lo=k_lo, k_hi=k_hi)


@contextlib.contextmanager
def fenced_timer(result: dict, key: str = "seconds"):
    """Wall-time a device computation, fencing completion with a data fetch
    (NOT ``block_until_ready`` — see module docstring).  Measures one
    dispatch including queue/RPC overhead; prefer ``slope_time`` for
    per-call device time on TPU.
    """
    t0 = time.perf_counter()
    holder = {}
    yield holder
    if "value" in holder:
        force_fetch(holder["value"])
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
