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
- Each length is timed 3 times and the MINIMUM is differenced. External
  interference (tunnel latency spikes, host CPU contention stalling the
  dispatch loop) only ever ADDS wall-clock, so the min per length
  converges to the true burst time, and differencing the minima removes
  the remaining fixed per-burst latency. The earlier protocol took the
  max over per-pair difference rates, which assumed corruption only
  deflates readings — but a stall inside the SHORT burst inflates the
  pair's rate (measured: a loaded host produced 27.5 and 47.4 img/s for
  a CycleGAN step whose device trace pins 62.00 ms = 16.1 img/s; the
  min-differenced protocol reproduces the trace number).
- If the pair is invalid (long run not meaningfully longer), fall back
  to the conservative direct rate n2*work/t2.
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
    t1 = min(dispatch(n1) for _ in range(3))
    t2 = min(dispatch(n2) for _ in range(3))
    if t2 - t1 > 0.2 * t2:
        return (n2 - n1) * images_per_dispatch / (t2 - t1)
    return n2 * images_per_dispatch / t2
