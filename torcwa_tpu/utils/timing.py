"""Per-stage timing breakdown for the solve pipeline.

The reference's only instrumentation is ad-hoc ``time.time()`` prints in
notebooks (e.g. Example3 cell 1).  ``StageTimer`` blocks on device
completion per stage so the numbers mean device time, and prints a
conv-matrix / eig / smatrix / fold style breakdown — the tuning loop for
the Pallas kernels.  For deeper traces use ``jax.profiler`` directly.
"""

import time
from contextlib import contextmanager

import jax

__all__ = ['StageTimer']


class StageTimer:
    """Accumulates wall-clock per named stage, device-synchronized.

    Usage:
        t = StageTimer()
        with t('conv'):
            conv = build_conv(...)
        with t('eig'):
            w, v = eig(...)
        print(t.report())
    """

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextmanager
    def __call__(self, name):
        """Context manager; the caller must block on the stage's outputs
        inside the block (or use :meth:`wrap`), since independent device
        buffers are not ordered."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def wrap(self, name, fn):
        """Timed wrapper: blocks on fn's outputs before stopping the
        clock, so the measurement is device time."""
        def timed(*args, **kwargs):
            with self(name):
                out = fn(*args, **kwargs)
                jax.block_until_ready(out)
            return out
        return timed

    def report(self):
        total = sum(self.totals.values()) or 1.0
        lines = ['stage              total_s   calls   share']
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            lines.append(f'{name:18s} {t:7.3f}  {self.counts[name]:6d}'
                         f'  {100 * t / total:5.1f}%')
        return '\n'.join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()
