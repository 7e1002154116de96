"""Test harness config: run on a virtual 8-device CPU mesh.

This is the "multi-node without a cluster" mechanism (SURVEY.md §4): the real
GSPMD data-parallel path executes on 8 fake CPU devices and is asserted equal
to the single-device path.

Note: this environment's sitecustomize pins JAX_PLATFORMS=axon (the TPU
tunnel), so plain env vars are overridden — force CPU through jax.config
before any backend initializes. Benchmarks (bench.py) run on the real chip;
tests run CPU for determinism and fp32 matmul parity.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
