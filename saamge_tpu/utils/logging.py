"""Leveled logging + phase timers.

Replaces the reference's SA_PRINTF/SA_RPRINTF macro family (common.hpp:365-455)
and StopWatch phase instrumentation (mltest.cpp:624-625, tg.cpp:436-460).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

from saamge_tpu.config import CONFIG


def sa_print(level: int, msg: str, *args) -> None:
    """Print when CONFIG.output_level >= level (SA_PRINTF_L analog)."""
    if CONFIG.output_level >= level:
        print("[saamge_tpu] " + (msg % args if args else msg),
              file=CONFIG.stream, flush=True)


class PhaseTimers:
    """Accumulating named wall-clock timers (SA_*TIMER analog)."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1
            sa_print(4, "TIMING: %s %f seconds.", name, dt)

    def report(self) -> str:
        lines = ["TIMING report:"]
        for name in sorted(self.totals):
            lines.append("  %-40s %10.4f s  (%d calls)"
                         % (name, self.totals[name], self.counts[name]))
        return "\n".join(lines)


TIMERS = PhaseTimers()
