"""Profiling and tracing helpers.

The reference's observability is compile-time-only wall-clock sections
(TIME_SECTIONS blocks, csrc/rasterise_egl.cpp:284-405) printed to stdout.
The TPU-native equivalents are first-class runtime tools: `jax.profiler`
device traces viewable in XProf/TensorBoard, named trace annotations around
pipeline stages, and simple wall-clock section timers for host-side work.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir):
    """Captures a device trace (XProf) for the enclosed computation.

    Example:
        with profiling.trace('/tmp/dirt_trace'):
            pixels = dirt_tpu.rasterise(...)
            jax.block_until_ready(pixels)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named annotation that shows up on the device timeline."""
    return jax.profiler.TraceAnnotation(name)


class SectionTimer:
    """Host-side wall-clock section timing (the TIME_SECTIONS analogue).

    Synchronises on the device (block_until_ready) at section boundaries so
    the numbers mean what they say.  Usage:

        timer = SectionTimer()
        with timer.section('setup'):
            packed = ...
        with timer.section('render'):
            out = kernel(...); jax.block_until_ready(out)
        print(timer.report())
    """

    def __init__(self):
        self.sections = {}

    @contextlib.contextmanager
    def section(self, name):
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            self.sections[name] = self.sections.get(name, 0.0) + elapsed

    def report(self):
        total = sum(self.sections.values())
        lines = [f"{name}: {secs * 1e3:.2f} ms"
                 for name, secs in self.sections.items()]
        lines.append(f"total: {total * 1e3:.2f} ms")
        return "\n".join(lines)
