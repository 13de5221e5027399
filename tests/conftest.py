"""Test harness: CPU backend with 8 virtual devices.

This is the TPU-native analog of a fake distributed backend (SURVEY.md §4.2):
the real mesh/pjit/psum code paths run single-process against
``xla_force_host_platform_device_count=8`` virtual CPU devices, and Pallas
kernels run in interpret mode.  Must run before jax import.
"""
import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the TPU tunnel,
# which is slow and single-chip; the suite is defined to run on virtual CPU
# devices.  Set STYLETTS_TEST_TPU=1 to run the suite on real TPU instead.
if not os.environ.get("STYLETTS_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
