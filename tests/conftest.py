"""Test harness: run everything on a virtual 8-device CPU mesh.

This image pre-imports jax at interpreter startup (PYTHONPATH sitecustomize
registers the axon TPU backend), so env vars are too late — we must override
the platform via jax.config before any backend is initialized. The 8 virtual
CPU devices let sharding tests exercise a real Mesh without TPU hardware.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
