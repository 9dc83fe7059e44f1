"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding is exercised
without TPU hardware (the driver separately dry-runs the multichip path).
float64 is enabled so solver tests can compare against the float64 golden
reference (`biped_pympc_tpu/ops/reference_pdipm.py`) at tight tolerance; TPU
production paths use float32 and are tested separately for looser tolerances.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: never run tests on a live TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# jax may already be imported by the interpreter's sitecustomize with the
# TPU platform baked in — override the live config, not just the env var.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound in-process compile-cache growth across the suite.

    jaxlib 0.9.0's CPU backend segfaults deterministically inside
    backend_compile_and_load once a single pytest process has accumulated
    roughly the full suite's compilations (reproduced twice at the same
    position with different victim tests; each victim passes standalone).
    Dropping the executables between modules keeps the process under the
    threshold. Costs recompiles for cross-module duplicate shapes — the
    suite has few, so the overhead is small relative to a crash.
    """
    yield
    jax.clear_caches()
