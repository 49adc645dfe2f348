"""Lightweight per-stage timers (reference ``utils/__init__.py:260-281``) and
RTF accounting — RTF (wall seconds per second of audio) is the framework's
north-star serving metric."""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Dict


class Timer:
    """Context-manager accumulating wall time by name; printing gated on
    ``enable`` (the reference gates on ``profile_infer``)."""

    totals: Dict[str, float] = defaultdict(float)
    counts: Dict[str, int] = defaultdict(int)

    def __init__(self, name: str, enable: bool = False):
        self.name = name
        self.enable = enable

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        dt = time.time() - self.t0
        Timer.totals[self.name] += dt
        Timer.counts[self.name] += 1
        if self.enable:
            print(f"| {self.name}: {dt * 1000:.1f} ms "
                  f"(total {Timer.totals[self.name]:.3f}s / {Timer.counts[self.name]}x)")

    @classmethod
    def report(cls) -> Dict[str, float]:
        return dict(cls.totals)

    @classmethod
    def reset(cls):
        cls.totals.clear()
        cls.counts.clear()


def rtf(wall_seconds: float, n_samples: int, sample_rate: int) -> float:
    return wall_seconds / (n_samples / sample_rate)
