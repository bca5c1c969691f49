"""Test harness: force an 8-virtual-device CPU backend.

This is the TPU-world fake backend the reference lacks (SURVEY.md §4): all
sharding/collective tests run on a virtual 8-device mesh so they validate the
multi-chip layout without hardware.

NOTE: the environment's sitecustomize pre-imports jax with the `axon` TPU
platform, so JAX_PLATFORMS env vars are read too late — we must override via
jax.config before the backend is initialized (it is initialized lazily, so
this works as long as no test module touches devices at import time).
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite re-jits many tiny models; this cuts
# repeat runs from ~11min to a fraction
jax.config.update("jax_compilation_cache_dir", "/tmp/mdrt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_enable_xla_caches",
                  "xla_gpu_per_fusion_autotune_cache_dir")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
