"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the way the reference validates "distributed"
training without a cluster (SURVEY.md §4): N virtual devices on one host.

NOTE: this machine's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (TPU tunnel), so setting the env var here is too late —
we must override via jax.config before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_root() -> pathlib.Path:
    if not REFERENCE.exists():
        pytest.skip("reference repo not mounted")
    return REFERENCE
