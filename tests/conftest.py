"""Test configuration: force a virtual 8-device CPU platform so sharding
tests run without multi-chip TPU hardware (the same trick the driver's
dryrun_multichip uses).

Note: the axon TPU plugin's sitecustomize sets jax_platforms="axon,cpu"
via jax.config at interpreter start, which overrides the JAX_PLATFORMS env
var — so the config must be updated again here, before any backend
initialization."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert devs[0].platform == "cpu" and len(devs) >= 8
    return devs
