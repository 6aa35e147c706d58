"""Test harness configuration.

Tests always run on CPU with 8 virtual devices (SURVEY.md §4 item 4): this is
the TPU-native equivalent of a fake backend — every shard_map / collective
path executes for real on one host, and all integer kernel semantics (uint32
wraparound, uint8 dot_general with int32 accumulation) are identical to TPU,
so element-exact assertions transfer.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
