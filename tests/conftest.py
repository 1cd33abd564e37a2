"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
tests run anywhere (mirrors how JAX code tests multi-host without a cluster,
see SURVEY.md §4).

Note: the interpreter's sitecustomize may have already imported jax and
registered an accelerator plugin, so plain os.environ["JAX_PLATFORMS"] is too
late — use jax.config.update, and set XLA_FLAGS before the CPU backend is
first initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# HUMANOID_TPU_TEST_TPU=1 keeps the real backend so the @needs_tpu kernel
# tests (tests/test_physics_kernel.py) actually execute on hardware.
if not os.environ.get("HUMANOID_TPU_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
