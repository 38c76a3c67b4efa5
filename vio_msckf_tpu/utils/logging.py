"""Logging + profiling helpers (the reference has only commented-out prints,
SURVEY.md section 5 — here observability is a real subsystem)."""

import contextlib
import logging
import sys
import time


def get_logger(name="vio"):
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s", "%H:%M:%S"
        ))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
    return logger


@contextlib.contextmanager
def maybe_profile(trace_dir=None):
    """jax.profiler trace when a directory is given, no-op otherwise."""
    if not trace_dir:
        yield
        return
    import jax
    with jax.profiler.trace(trace_dir):
        yield


class StageTimer:
    """Wall-clock per-stage accumulator (revives the reference's vestigial
    time.time() instrumentation, image.py:99-131 / msckf.py:186-226, as a
    working subsystem)."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def stage(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self):
        lines = []
        for name, tot in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(
                f"{name:>24s}: total {tot:8.3f}s  n={n:<6d} "
                f"avg {1e3 * tot / max(n, 1):8.3f}ms"
            )
        return "\n".join(lines)
