"""Test config: run everything on an 8-device virtual CPU mesh.

The axon sitecustomize pins jax_platforms to 'axon,cpu'; tests re-pin to pure
CPU (fast, deterministic, and lets Mesh tests exercise 8 virtual devices via
xla_force_host_platform_device_count).  Benchmarks (bench.py) run on the real
TPU chip instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_MODELS = "/root/reference/models"
FIXTURES = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="session")
def lenet_oracle():
    """Torch-oracle activations for the shipped MNIST checkpoints.

    The .npz fixtures are gitignored (binary); regenerate on demand in a
    subprocess (torch + jax in one process can wedge, see CLAUDE.md)."""
    path = os.path.join(FIXTURES, "lenet_oracle.npz")
    if not os.path.exists(path):
        import subprocess, sys
        os.makedirs(FIXTURES, exist_ok=True)
        script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                              "make_test_fixtures.py")
        subprocess.run([sys.executable, script], check=True, timeout=600)
    return np.load(path)


@pytest.fixture(scope="session")
def mnist_lenet_avgpool_pth():
    return os.path.join(REFERENCE_MODELS, "mnist_lenet_avgpool.pth")
