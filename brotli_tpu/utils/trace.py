"""Per-stage timing seam (role parity: the reference's BROTLI_LOG /
BROTLI_REPORTING debug hooks, c/common/platform.h:464-486, plus the
jax.profiler affordance for device stages).

Disabled by default (one dict lookup per stage); enable with
BROTLI_TPU_TRACE=1 or `enable()`. Stages nest; every
`with stage("name")` accumulates wall time and call count. `report()`
returns {name: (calls, seconds)}; the CLI prints it under -v when
tracing is on. `device_profile(path)` wraps a block in a
jax.profiler trace for TPU timeline capture.
"""

import contextlib
import os
import threading
import time

_enabled = os.environ.get("BROTLI_TPU_TRACE", "") not in ("", "0")
_lock = threading.Lock()
_acc = {}


def enable(on: bool = True) -> None:
    global _enabled
    _enabled = on


def enabled() -> bool:
    return _enabled


def reset() -> None:
    with _lock:
        _acc.clear()


@contextlib.contextmanager
def stage(name: str):
    if not _enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _lock:
            calls, total = _acc.get(name, (0, 0.0))
            _acc[name] = (calls + 1, total + dt)


def report() -> dict:
    with _lock:
        return dict(_acc)


def format_report() -> str:
    rows = sorted(report().items(), key=lambda kv: -kv[1][1])
    width = max((len(k) for k, _ in rows), default=4)
    lines = [f"{k.ljust(width)}  {c:6d} calls  {s * 1000:9.1f} ms"
             for k, (c, s) in rows]
    return "\n".join(lines)


@contextlib.contextmanager
def device_profile(path: str):
    """jax.profiler trace around a block (TPU timeline capture)."""
    import jax
    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
