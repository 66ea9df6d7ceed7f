"""Test configuration: emulate an 8-device TPU-like mesh on CPU.

Multi-chip sharding logic is validated on a virtual CPU mesh via
``--xla_force_host_platform_device_count`` (the standard JAX fake-backend
technique) so the suite runs identically on any machine.

Note: in some environments a site-level plugin pre-sets
``jax_platforms`` to a hardware backend; ``jax.config.update`` below takes
effect as long as no JAX backend has initialized yet, which is why this must
happen at conftest import time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# No network in CI: never attempt the upstream checkpoint download (tests
# that exercise the download path re-enable it with a file:// URL).
os.environ.setdefault("FCPT_NO_DOWNLOAD", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def demo_dir():
    """Directory with the 8 demo images bundled with the reference."""
    path = "/root/reference/demo/input_images"
    if not os.path.isdir(path):
        pytest.skip("demo images not available")
    return path
