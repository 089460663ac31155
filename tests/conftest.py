"""Test harness config: run everything on the CPU backend with 8 virtual
devices so multi-chip `shard_map` code paths run unmodified without a TPU pod
(SURVEY.md §4 "Multi-chip without a cluster"). Must run before jax imports."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

# fp64 paths (reference validates at fp64) need x64 enabled.
jax.config.update("jax_enable_x64", True)
