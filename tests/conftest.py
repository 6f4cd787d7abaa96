"""Test configuration: run everything on a virtual 8-device CPU mesh.

The driver's multi-chip dry-run uses the same mechanism
(xla_force_host_platform_device_count); real-TPU benchmarking happens in
bench.py, not here.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# Belt and braces: if a pytest plugin imported jax before this conftest ran,
# the env vars above were too late — set the config directly (works any time
# before backend initialization).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_DIR, "data", "test_set"))
