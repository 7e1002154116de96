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
    # 1 warmup + 3x (short, long) pairs.
    assert calls == [1, 1, 4, 1, 4, 1, 4]
    expected = (4 - 1) * 100 / (0.04 - 0.01)
    assert abs(ips - expected) < 1e-9


def test_invalid_delta_falls_back_to_conservative_direct_rate():
    # Long run not meaningfully longer than the short one (load transition
    # or timer floor): the protocol must not divide by the junk delta.
    ips = measure_images_per_sec(lambda n: 1.0, 100, 1, 4)
    assert ips == 4 * 100 / 1.0


def test_best_of_three_takes_the_cleanest_pair():
    # First two pairs inflated by transient load; third is clean.
    times = iter([1.0, 0.5, 2.6, 0.5, 2.8, 0.5, 2.0])

    def dispatch(n):
        return next(times)

    ips = measure_images_per_sec(dispatch, 10, 1, 4)
    assert ips == max(
        (4 - 1) * 10 / (2.6 - 0.5),
        (4 - 1) * 10 / (2.8 - 0.5),
        (4 - 1) * 10 / (2.0 - 0.5),
    )
