"""Wall-clock timers and meters (reference util/timer.py:12-54).

These are the pipeline's profiling layer (feat_timer/reg_timer at
deep_global_registration.py:81-82; trainer meters at trainer.py:177-181).
``Timer.toc`` is used around jitted stages — callers must block on device
results (jax.block_until_ready) for meaningful numbers; the pipeline does.
"""

from __future__ import annotations

import time


class AverageMeter:
    """Running average of a scalar series."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.sq_sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count
        self.sq_sum += val ** 2 * n
        self.var = self.sq_sum / self.count - self.avg ** 2


class Timer:
    """tic/toc stopwatch with call averaging."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.total_time = 0.0
        self.calls = 0
        self.start_time = 0.0
        self.diff = 0.0
        self.avg = 0.0

    def tic(self):
        self.start_time = time.time()

    def toc(self, average: bool = True) -> float:
        self.diff = time.time() - self.start_time
        self.total_time += self.diff
        self.calls += 1
        self.avg = self.total_time / self.calls
        return self.avg if average else self.diff
