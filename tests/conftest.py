"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the multichip
path, and benchmarks run on the real chip). These env vars must be set before
jax is imported anywhere.

Note: this image's sitecustomize registers the ``axon`` TPU plugin at
interpreter startup, which overrides ``JAX_PLATFORMS`` — so in addition to
the env vars we pin ``jax_default_device`` to a host CPU device, keeping the
suite off the (single, tunnel-attached) TPU chip.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# FORCE cpu via the config (not just the env var): sitecustomize imports
# jax at interpreter start with the ambient ``JAX_PLATFORMS=axon``, so the
# setdefault above is too late when the suite runs with the axon site on
# PYTHONPATH — and a wedged TPU tunnel then blocks backend discovery for
# ~25 min (measured: the suite sat idle exactly that long). The config
# update works even after the plugin registered; trivial CPU ops complete
# in <1 s with the tunnel fully down.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:  # pragma: no cover - older jax without the option
    pass

try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:  # pragma: no cover - cpu backend always exists
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def cpu_devices():
    """The 8 virtual host devices used for sharding tests."""
    return jax.devices("cpu")
