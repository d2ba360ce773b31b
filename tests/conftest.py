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

# Two-tier suite (TESTING.md): these modules subprocess-drive CLIs /
# real multi-process runs, AOT-compile full-arch programs, or build torch
# reference stacks — the compile-heavy tail of the pyramid.  The inner
# loop is `pytest -m "not slow"`; CI runs everything.
SLOW_MODULES = {
    "test_multihost",          # 2 real processes, jax.distributed
    "test_multihost_runner",   # 2-process RunnerBase drive
    "test_aot_compile",        # full-arch GSPMD lower+compile
    "test_train_cli",          # subprocess train.py drive
    "test_eval_harness",       # subprocess evaluation_aqa_dataset.py
    "test_convert_all_cli",    # subprocess convert_weights.py all
    "test_analysis_scripts",   # subprocess analysis CLI drives
    "test_composed_transcript",  # tiny-torch composed Myriad + HF generate
    "test_torch_parity",       # torch tower builds + activation parity
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.fspath.purebasename in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
