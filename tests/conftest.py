"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set the environment before jax is imported anywhere.
"""

import os
import pathlib

# Force CPU even when the environment presets an accelerator platform
# (e.g. JAX_PLATFORMS=axon on TPU test hosts, whose sitecustomize calls
# jax.config.update with the plugin platform -- overriding the env var,
# so we must override via jax.config as well).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

GOLDEN = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden_dir() -> pathlib.Path:
    return GOLDEN


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: runs on the REAL TPU chip (subprocess-watchdogged); "
        "skipped unless QVZ_TPU_ONCHIP=1 (make test-tpu)")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("QVZ_TPU_ONCHIP") == "1":
        return
    skip = pytest.mark.skip(
        reason="on-chip test: set QVZ_TPU_ONCHIP=1 (or `make test-tpu`) "
               "to run on the real TPU")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)
