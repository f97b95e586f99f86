"""Hierarchical scope timers — the analog of the reference's forked ark-std
`start_timer!/end_timer!` print-trace machinery (ref utils/src/perf_trace.rs,
enabled by the `print-trace` feature; the bench harness greps for the
"End: timed section" line, ref scripts/bench.zsh:19,57)."""

from __future__ import annotations

import contextlib
import os
import time

_ENABLED = os.environ.get("CZTPU_PRINT_TRACE", "1") != "0"
_DEPTH = 0


@contextlib.contextmanager
def timed(label: str):
    """Prints `Start:`/`End:` lines with indentation and elapsed seconds."""
    global _DEPTH
    if _ENABLED:
        print(f"{'·' * (2 * _DEPTH)}Start: {label}", flush=True)
    _DEPTH += 1
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _DEPTH -= 1
        if _ENABLED:
            print(f"{'·' * (2 * _DEPTH)}End: {label} {dt:.6f}s", flush=True)


class Timer:
    def __init__(self, label: str):
        self.label = label
        self.t0 = time.perf_counter()

    def stop(self) -> float:
        return time.perf_counter() - self.t0
