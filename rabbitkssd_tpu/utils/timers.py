"""Per-phase wall-clock tracing, reference-style.

The reference compiles Timer/Timer_inner spans in by default and prints
phase durations to stderr (/root/reference/CMakeLists.txt:6-8,
dist.cpp:132-135,271-274, sketch.cpp:583-588).  Same model here: spans
are on by default, keep the reference's phase boundaries (read / sketch
/ index / dist / merge), and write to stderr.  ``KSSD_TIMER=0``
disables; ``KSSD_PROFILE_DIR=<dir>`` additionally captures a
``jax.profiler`` trace of the span for TensorBoard.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

ENABLED = os.environ.get("KSSD_TIMER", "1") != "0"
PROFILE_DIR = os.environ.get("KSSD_PROFILE_DIR", "")


@contextlib.contextmanager
def phase(name: str):
    """Time a pipeline phase; print `===...time of <name> is: <s>`."""
    ctx = contextlib.nullcontext()
    if PROFILE_DIR:
        import jax

        ctx = jax.profiler.trace(PROFILE_DIR)
    t0 = time.time()
    with ctx:
        yield
    if ENABLED:
        print(
            f"===================time of {name} is: {time.time() - t0:.6g}",
            file=sys.stderr,
        )


def progress_bar_size(total: int) -> int:
    """Adaptive progress step, exactly get_progress_bar_size
    (reference common.cpp:23-32)."""
    coarse = total // 20
    step = 10
    while coarse // step:
        step *= 10
    step //= 10
    return (coarse // step + 1) * step
