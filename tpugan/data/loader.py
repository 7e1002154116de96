"""Device-prefetching batch loader.

Replaces torch DataLoader(num_workers=N) (pix2pix/pix2pix.py:89-94) with a
TPU-appropriate pipeline: host-side batch assembly on a background thread and
an async ``jax.device_put`` queue so the accelerator never waits on input.
Batches ship as uint8 (4x less H2D traffic than fp32); normalization happens
on-device inside the jitted train step.

Shape policy: fixed batch shape (``drop_last=True`` default) so the step
compiles once. The reference runs a ragged final batch instead
(gan/gan.py:122-125 uses ``imgs.shape[0]`` everywhere); pass
``--ragged_last_batch`` (wires ``set_drop_last(False)``) to reproduce those
epoch semantics exactly — every recipe's step already sizes its noise and
targets from the batch's leading dim, so the tail batch trains with
identical numerics at the cost of ONE extra XLA compile for the tail shape
(the shape is the same every epoch, so it compiles once per run).
Ragged tails are incompatible with a sharded (data-parallel) batch; the
loader warns and drops the tail in that case.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional, Sequence

import jax
import numpy as np

# Debug mode (--debug_numerics): run every loader synchronously on the
# calling thread — no producer thread, no prefetch queue. The input
# pipeline is the only concurrency in the framework (SURVEY.md §5 race
# surface); this removes it entirely for bisecting host-side races.
_SYNCHRONOUS = False

# Process-wide drop_last default (--ragged_last_batch wires this to False;
# see module docstring). Loaders constructed with an explicit drop_last
# ignore it.
_DROP_LAST_DEFAULT = [True]


def set_synchronous(on: bool) -> None:
    global _SYNCHRONOUS
    _SYNCHRONOUS = on


def set_drop_last(on: bool) -> None:
    _DROP_LAST_DEFAULT[0] = on


class DeviceLoader:
    """Iterates device-resident batches over one or more aligned arrays.

    arrays: sequence of np arrays with equal leading dim (e.g. images,
    labels). Each epoch yields tuples of jax arrays.
    """

    def __init__(
        self,
        arrays: Sequence[np.ndarray],
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: Optional[bool] = None,
        prefetch: int = 2,
        sharding: Optional[jax.sharding.Sharding] = None,
        host_transform: Optional[Callable] = None,
    ):
        self.arrays = list(arrays)
        n = len(self.arrays[0])
        assert all(len(a) == n for a in self.arrays)
        self.n = n
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        if drop_last is None:
            drop_last = _DROP_LAST_DEFAULT[0]
        if not drop_last and sharding is not None and n % batch_size != 0:
            import warnings

            warnings.warn(
                "[tpugan] --ragged_last_batch is incompatible with a "
                "sharded (data-parallel) batch; dropping the tail batch",
                stacklevel=2,
            )
            drop_last = True
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.sharding = sharding
        self.host_transform = host_transform
        self._epoch = 0

    def __len__(self) -> int:
        if self.drop_last:
            return self.n // self.batch_size
        return -(-self.n // self.batch_size)

    def _host_batches(self, epoch: int) -> Iterator[tuple]:
        rng = np.random.default_rng(self.seed * 1000003 + epoch)
        idx = rng.permutation(self.n) if self.shuffle else np.arange(self.n)
        nb = len(self)
        from tpugan import native

        for b in range(nb):
            sel = idx[b * self.batch_size : (b + 1) * self.batch_size]
            # uint8 image arrays go through the native batch assembler
            # (csrc/host_pipeline.cpp tg_gather_u8); identical result to
            # numpy fancy indexing, which remains the fallback.
            batch = tuple(
                native.gather(a, sel) if a.dtype == np.uint8 else a[sel]
                for a in self.arrays
            )
            if self.host_transform is not None:
                batch = self.host_transform(batch, epoch, b)
            yield batch

    def epoch(self, epoch: Optional[int] = None) -> Iterator[tuple]:
        """Yield device-resident batches for one epoch, with async prefetch."""
        if epoch is None:
            epoch = self._epoch
            self._epoch += 1

        if _SYNCHRONOUS or self.prefetch <= 0:
            for batch in self._host_batches(epoch):
                yield tuple(jax.device_put(a, self.sharding) for a in batch)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            # Exceptions (host_transform, native gather, device_put) ship
            # to the consumer and re-raise there — a bare end-of-queue
            # sentinel would silently truncate every epoch instead.
            try:
                for batch in self._host_batches(epoch):
                    if stop.is_set():
                        return
                    dev = tuple(
                        jax.device_put(a, self.sharding) for a in batch
                    )
                    q.put(dev)
                q.put(None)
            except BaseException as e:  # noqa: BLE001 — relayed, not dropped
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # Drain so the producer can exit.
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break

    def __iter__(self):
        return self.epoch()


class UnpairedLoader(DeviceLoader):
    """Unaligned two-domain loader (cyclegan/datasets.py:24-41 semantics):
    epoch length = max(len(A), len(B)) batches of A cycled+shuffled, with B
    drawn UNIFORMLY AT RANDOM from the FULL B set every item — no
    truncation to min length and no fixed pairing."""

    def __init__(self, a: np.ndarray, b: np.ndarray, batch_size: int,
                 seed: int = 0, prefetch: int = 2, sharding=None,
                 host_transform=None):
        n = max(len(a), len(b))
        super().__init__(
            [a], batch_size, shuffle=True, seed=seed, prefetch=prefetch,
            sharding=sharding, host_transform=host_transform,
        )
        self.n = n  # reference: len = max(len A, len B)
        self._a = a
        self._b = b

    def _host_batches(self, epoch: int):
        rng = np.random.default_rng(self.seed * 1000003 + epoch)
        # A cycled to n then shuffled (index % len(A), datasets.py:26).
        idx_a = rng.permutation(self.n) % len(self._a)
        nb = len(self)
        from tpugan import native

        for bi in range(nb):
            sel = idx_a[bi * self.batch_size : (bi + 1) * self.batch_size]
            b_sel = rng.integers(0, len(self._b), size=len(sel))
            batch = (native.gather(self._a, sel), native.gather(self._b, b_sel))
            if self.host_transform is not None:
                batch = self.host_transform(batch, epoch, bi)
            yield batch


class ZipLoader:
    """Zip of independently-shuffled loaders (the two-domain pattern:
    ``zip(dataloader1, dataloader2)`` in cogan/cogan.py:184 and
    pixelda/pixelda.py:221). Each epoch yields the concatenation of the
    member loaders' batch tuples; length is the shortest member (zip
    semantics)."""

    def __init__(self, *loaders: DeviceLoader):
        self.loaders = loaders

    def __len__(self) -> int:
        return min(len(l) for l in self.loaders)

    def epoch(self, epoch: Optional[int] = None) -> Iterator[tuple]:
        its = [l.epoch(epoch) for l in self.loaders]
        n = len(self)
        try:
            for _ in range(n):
                out: tuple = ()
                for it in its:
                    out = out + next(it)
                yield out
        finally:
            # Unwind every member's prefetch thread even on early exit or
            # a relayed producer exception — otherwise the other members
            # keep device_put-ing until GC happens to collect them.
            for it in its:
                it.close()

    def __iter__(self):
        return self.epoch()
