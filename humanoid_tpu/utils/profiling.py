"""Profiling: XLA device traces + host-side phase timing.

The reference's tracing story is wall-clock only (collection/learn time +
fps via time.time(), on_policy_runner.py:126-170, 204-208). The TPU
equivalent (SURVEY.md §5.1):

  * `device_trace(log_dir)` — jax.profiler trace context; produces a
    TensorBoard-loadable trace of every XLA kernel (HLO names, durations,
    HBM traffic) under <log_dir>/plugins/profile. View with
    `tensorboard --logdir <log_dir>`.
  * `PhaseTimer` — cheap named host-side phases with per-phase totals,
    for the collection/learn split the reference logs.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Named wall-clock phases: `with timer("rollout"): ...`; totals in
    `timer.totals`, reference-style fps via `timer.fps(steps)`."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str) -> Iterator[None]:
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def fps(self, steps: int) -> float:
        """steps / total wall-clock across all phases
        (on_policy_runner.py:204-208 formula)."""
        tot = sum(self.totals.values())
        return steps / tot if tot > 0 else 0.0

    def report(self) -> str:
        lines = []
        for k in sorted(self.totals):
            n = max(1, self.counts[k])
            lines.append(
                f"{k:>16}: {self.totals[k]:8.3f}s total, "
                f"{1e3 * self.totals[k] / n:7.2f} ms/call x{self.counts[k]}"
            )
        return "\n".join(lines)
