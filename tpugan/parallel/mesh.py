"""Device mesh + data-parallel sharding.

The reference is single-process single-device (SURVEY.md §2.4 — no
torch.distributed anywhere), so every parallelism strategy here is net-new
TPU design. Primary strategy: data parallelism over the ICI mesh axis
``data`` via GSPMD — the batch is sharded over devices, params replicated,
and ``jax.jit`` sharding propagation inserts the gradient all-reduce.

A deliberate parity win: with the batch sharded and losses written as global
means, XLA computes *global* batch statistics for BatchNorm — identical to
the reference's single-device semantics at the same global batch size
(per-device-stats DP would diverge; see SURVEY.md §7 hard-part 2).

TP/PP/EP/SP seams are documented non-goals (no workload in the zoo needs
them — max ~30M params, no sequence axis); the mesh helper still accepts
extra axes so recipes can annotate channel-dim shardings if ever scaled.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_state(state, mesh: Mesh):
    """Replicate the full TrainState over the mesh."""
    return jax.device_put(state, replicated_sharding(mesh))



def auto_sharding(batch_size: int):
    """Batch sharding over the full mesh when CLI auto-DP applies, else
    None (single device, or batch not divisible by the device count —
    warned loudly, since silently dropping to one chip of N wastes the
    mesh; raise the global batch to a multiple of the device count to
    scale, see scripts/bench_dp.py)."""
    n = jax.device_count()
    if n <= 1:
        return None
    if batch_size % n != 0:
        import warnings

        warnings.warn(
            f"[tpugan] batch_size={batch_size} is not divisible by the "
            f"{n}-device mesh — running SINGLE-DEVICE. Use a global batch "
            f"that is a multiple of {n} to enable data parallelism.",
            stacklevel=2,
        )
        return None
    return batch_sharding(data_mesh())


def replicate_for(sharding, state):
    """Replicate a TrainState over the mesh the batch sharding lives on."""
    if sharding is None:
        return state
    print("[tpugan] data-parallel over %d devices" % jax.device_count())
    return jax.device_put(state, replicated_sharding(sharding.mesh))
