"""Shared benchmark timing protocol (the single home for the rules in
BASELINE.md's timing-protocol note).

Used by bench.py, scripts/bench_cyclegan.py and scripts/bench_zoo.py so a
protocol fix lands everywhere at once. The rules:

- ``dispatch(n)`` runs n device dispatches and MUST end with a hard
  scalar sync (``float(out[...])``) — on the axon remote backend,
  ``block_until_ready`` under-waits on short bursts, so only a D2H scalar
  fetch bounds the measurement.
- Warmup is one dispatch (holds the compile + first burst).
- Difference method over two run lengths: rate = extra_work / (t2 - t1),
  valid only when the long run took meaningfully longer (t2 - t1 >
  0.2*t2); otherwise a load transition corrupted the pair.
- Best of 3 pairs (the shared compile/tunnel service adds multi-second
  variance); if no pair is valid, fall back to the most conservative
  direct rate n2*work/t2.
"""

from __future__ import annotations

from typing import Callable


def measure_images_per_sec(
    dispatch: Callable[[int], float],
    images_per_dispatch: float,
    n1: int,
    n2: int,
) -> float:
    """Difference-method throughput. ``dispatch(n)`` runs n hard-synced
    device dispatches and returns the elapsed wall-clock seconds."""
    dispatch(1)  # warmup: compile + one burst
    candidates, fallback = [], 0.0
    for _ in range(3):
        t1 = dispatch(n1)
        t2 = dispatch(n2)
        fallback = max(fallback, n2 * images_per_dispatch / t2)
        if t2 - t1 > 0.2 * t2:
            candidates.append((n2 - n1) * images_per_dispatch / (t2 - t1))
    return max(candidates) if candidates else fallback
