"""Test configuration: run all tests on an 8-device virtual CPU mesh.

This exercises the multi-chip sharding path (pjit over a `data` mesh)
without TPU hardware, per SURVEY.md §4's test plan. Must run before any
JAX backend initialization, hence conftest.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
