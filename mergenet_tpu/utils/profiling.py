"""Profiling / tracing helpers.

The reference's only instrumentation is wall-clock AverageMeter prints
(`train_utils.py:34,91-97`).  TPU-native additions:

  * `trace(logdir)` — context manager around `jax.profiler` emitting a
    TensorBoard-loadable trace of device execution.
  * `annotate(name)` — names a region so it shows up in the trace.
  * `Stopwatch` — named wall-clock spans with summary printing (covers the
    reference's per-stage timing idiom).
"""

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(logdir):
    """Capture a device trace under `logdir` (view in TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named trace region: `with annotate('decode'): ...`"""
    return jax.profiler.TraceAnnotation(name)


class Stopwatch:
    """Accumulating named wall-clock spans.

    sw = Stopwatch()
    with sw.span("net"): ...
    with sw.span("decode"): ...
    sw.summary()
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name, sync=None):
        t0 = time.time()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.time() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self):
        lines = []
        for name in sorted(self.totals):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append("{:<20} total {:8.3f}s  n {:5d}  avg {:8.1f}ms"
                         .format(name, tot, n, tot / n * 1000))
        out = "\n".join(lines)
        print(out)
        return out
