"""tpugan — a TPU-native GAN training and sampling framework in JAX.

A ground-up reimplementation of the capabilities of
eriklindernoren/PyTorch-GAN (33 adversarial training algorithms) as an
idiomatic JAX/XLA/Pallas framework:

- ``tpugan.nn``       flax building blocks with PyTorch-parity init/semantics
- ``tpugan.ops``      initializers, image ops, gradient penalties, Pallas kernels
- ``tpugan.losses``   pure adversarial / reconstruction loss functions
- ``tpugan.data``     host-decode + device-prefetch input pipeline
- ``tpugan.train``    functional TrainState + jitted step builders + loop runner
- ``tpugan.parallel`` device mesh + data-parallel sharding (GSPMD / shard_map)
- ``tpugan.models``   one recipe module per GAN variant (CLI/flag parity)
- ``tpugan.io``       sample-grid PNG writer, checkpointing, logging

The reference layout is documented in /root/repo/SURVEY.md; each recipe
docstring cites the reference script it reproduces.
"""

__version__ = "0.1.0"

from tpugan.models import registry  # noqa: F401
