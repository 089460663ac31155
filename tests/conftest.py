"""Test harness config: run everything on the CPU backend with 8 virtual
devices so multi-chip `shard_map` code paths run unmodified without a TPU pod
(SURVEY.md §4 "Multi-chip without a cluster").

Note: this environment pre-imports jax at interpreter startup (axon
sitecustomize), so XLA_FLAGS must be set before the *backend* initializes
(lazy), and the platform is switched via jax.config, not JAX_PLATFORMS.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (already imported by sitecustomize; config still settable)

jax.config.update("jax_platforms", "cpu")
# fp64 paths (reference validates at fp64) need x64 enabled.
jax.config.update("jax_enable_x64", True)
