"""Test configuration: run everything on a virtual 8-device CPU mesh.

The sandbox may pre-select a TPU platform through an early-loaded plugin
that overrides ``JAX_PLATFORMS``, so the platform is forced programmatically
before any backend initialisation.  Tests exercise the multi-chip sharding
paths on 8 virtual CPU devices (SURVEY.md §4 implication); set
``MYRIAD_TEST_TPU=1`` to opt into real hardware.
"""

import os

if os.environ.get("MYRIAD_TEST_TPU", "0") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
