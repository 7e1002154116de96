"""The shared benchmark timing protocol (tpugan/utils/benchtime.py) used
by bench.py and the scripts/bench_*.py family — pure-function pinned so a
protocol regression can't silently skew the recorded anchors."""

from tpugan.utils.benchtime import measure_images_per_sec


def test_difference_method_removes_fixed_overhead():
    # dispatch(n) = 0.1 s fixed burst overhead + 0.01 s per dispatch; the
    # difference method must recover the marginal rate exactly.
    calls = []

    def dispatch(n):
        calls.append(n)
        return 0.1 + 0.01 * n

    ips = measure_images_per_sec(dispatch, 100, 1, 4)
    # 1 warmup + 3x short then 3x long (min per length is differenced).
    assert calls == [1, 1, 1, 1, 4, 4, 4]
    expected = (4 - 1) * 100 / (0.04 - 0.01)
    assert abs(ips - expected) < 1e-9


def test_invalid_delta_falls_back_to_conservative_direct_rate():
    # Long run not meaningfully longer than the short one (load transition
    # or timer floor): the protocol must not divide by the junk delta.
    ips = measure_images_per_sec(lambda n: 1.0, 100, 1, 4)
    assert ips == 4 * 100 / 1.0


def test_min_per_length_rejects_stall_in_either_burst():
    # True cost: 0.1 s/dispatch, no fixed overhead. One short burst and
    # one long burst are stalled by external load (host contention /
    # tunnel spike). Interference only ADDS time, so the min per length
    # recovers the clean pair. The old max-over-pair-rates protocol
    # latched the pair whose SHORT burst was stalled, inflating the rate
    # (measured on hardware: 47.4 img/s reported for a step whose device
    # trace pins 16.1 — BASELINE.md timing note).
    # First n=1 entry is consumed by the warmup dispatch.
    times = {1: iter([0.1, 0.1, 0.75, 0.1]), 4: iter([0.4, 0.4, 1.9])}

    def dispatch(n):
        return next(times[n])

    ips = measure_images_per_sec(dispatch, 10, 1, 4)
    assert ips == (4 - 1) * 10 / (0.4 - 0.1)
