"""Tracing / profiling helpers.

The reference only has ad-hoc ``time.time()`` deltas sprinkled through
the hot loops (SURVEY §5); here the same per-stage timing is a reusable
``StageTimer`` plus first-class ``jax.profiler`` trace capture for
XLA-level analysis (TensorBoard / Perfetto).
"""

import contextlib
import logging
import time

log = logging.getLogger("pycusdr_tpu." + __name__)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed block.

    View with TensorBoard (``tensorboard --logdir <dir>``) or load the
    .trace.json.gz into Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("device trace written to %s", log_dir)


class StageTimer:
    """Named-stage wall-clock accounting with running averages.

    ``with timer("doppler"): ...`` — read ``timer.report()`` anytime.
    """

    def __init__(self):
        self.totals = {}
        self.counts = {}
        self._stack = []

    @contextlib.contextmanager
    def __call__(self, stage: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[stage] = self.totals.get(stage, 0.0) + dt
            self.counts[stage] = self.counts.get(stage, 0) + 1

    def mean(self, stage: str) -> float:
        return self.totals.get(stage, 0.0) / max(self.counts.get(stage, 0), 1)

    def report(self) -> str:
        lines = [
            f"{k:>20}: {self.mean(k) * 1e3:8.3f} ms avg x{self.counts[k]}"
            for k in sorted(self.totals, key=self.totals.get, reverse=True)
        ]
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()
