"""Test configuration.

Tests run hostless on CPU: Pallas kernels execute in interpret mode (the
TPU analogue of the race/indexing sanitizer the reference lacks — SURVEY.md
§5), and sharding tests run on a virtual 8-device CPU mesh via
``xla_force_host_platform_device_count`` (SURVEY.md §4.6).

Set FAT_TEST_BACKEND=tpu to run the same suite compiled on real hardware.
"""

import os

_backend = os.environ.get("FAT_TEST_BACKEND", "cpu")
if _backend == "cpu":
    # NOTE: the env may preinstall a TPU plugin that ignores JAX_PLATFORMS;
    # jax.config.update is authoritative.
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if _backend == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# On TPU, f32 matmuls default to fast bf16 MXU passes; the parity suites
# compare f32-grade oracles and model paths, so pin full f32. (The kernels
# pin their own dots via _precision(); this covers test-side jnp/model math.)
jax.config.update("jax_default_matmul_precision", "highest")
