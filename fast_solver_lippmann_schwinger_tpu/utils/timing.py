"""Phase timing and structured logging.

Replaces the reference's ad-hoc ``@time`` / ``tic()``/``toc()`` /
``println`` progress markers (SURVEY.md section 5) with a structured
per-phase timing registry; for deep kernel profiles use
``jax.profiler.trace`` around any phase.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from collections import OrderedDict
from typing import Optional


class PhaseTimer:
    """Collects wall-clock per named phase; prints a JSON summary."""

    def __init__(self, stream=sys.stderr):
        self.durations = OrderedDict()
        self.stream = stream

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                try:
                    import jax

                    jax.block_until_ready(block_on)
                except Exception:  # noqa: BLE001
                    pass
            dt = time.perf_counter() - t0
            self.durations[name] = self.durations.get(name, 0.0) + dt

    def log(self, **extra) -> None:
        print(
            json.dumps({"phases_s": dict(self.durations), **extra}),
            file=self.stream,
        )


@contextlib.contextmanager
def profiled(logdir: Optional[str] = None):
    """Wrap a region in a JAX profiler trace when ``logdir`` is given."""
    if logdir is None:
        yield
        return
    import jax

    with jax.profiler.trace(logdir):
        yield
