"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the multi-chip test strategy the reference lacks (SURVEY.md §4):
sharding paths are validated on `--xla_force_host_platform_device_count=8`
without real TPU hardware.
"""

import os

# NOTE: this image preloads jax and registers the remote "axon" TPU backend
# via sitecustomize with JAX_PLATFORMS=axon preset; a plain setdefault would
# silently run the whole test suite over the TPU tunnel. Force-override —
# except when explicitly running the TPU-hardware test subset.
# DEXHAND_TPU_TESTS=1 opts into the TPU-gated subset; combined with an
# explicit JAX_PLATFORMS=cpu it still runs on CPU (kernel interpret mode) —
# never contend with a live TPU job for the single tunnel.
_TPU_TESTS = (
    os.environ.get("DEXHAND_TPU_TESTS") == "1"
    and os.environ.get("JAX_PLATFORMS", "axon") != "cpu"
)
if not _TPU_TESTS:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not _TPU_TESTS:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

from dexrobot_isaac_tpu.utils.compilation_cache import (  # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()
