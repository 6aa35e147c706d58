"""Test harness configuration.

Tests always run on CPU with 8 virtual devices (SURVEY.md §4 item 4): this is
the TPU-native equivalent of a fake backend — every shard_map / collective
path executes for real on one host, and all integer kernel semantics (uint32
wraparound, uint8 dot_general with int32 accumulation) are identical to TPU,
so element-exact assertions transfer.

Note: the environment preloads jax (PYTHONPATH sitecustomize) with
JAX_PLATFORMS=axon (the real tunneled TPU chip), so the env var is already
captured by the time this file runs; jax.config.update is the reliable
override. XLA_FLAGS is still read at backend init, so setting it here works.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

# persistent XLA compilation cache: the suite's cost is dominated by CPU jit
# compiles of per-level pipeline stages; repeat runs hit the disk cache
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
# cache EVERY compile: the deep-circuit tests dispatch hundreds of small
# per-level programs each compiling in 0.1-0.5 s — below the old 0.5 s
# threshold they recompiled every run and dominated the warm fast tier
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
