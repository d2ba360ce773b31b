"""Single-controller distributed helpers.

TPU-native replacement for the reference's torchrun/NCCL process-group setup
(reference minigpt4/common/dist_utils.py:17-137).  JAX is single-controller
per host: ``jax.distributed.initialize`` joins the multi-host job and all
collectives run through XLA over ICI/DCN, so most of the reference's rank
plumbing reduces to ``jax.process_index``.
"""

from __future__ import annotations

import functools
import logging
import os
from typing import Optional, Tuple

import jax
import numpy as np


_initialized = False


def configure_platform(device: Optional[str], host_devices: Optional[int] = None) -> None:
    """Select the JAX platform from the run config's ``device`` knob.

    The sandbox may pin a TPU platform via an early plugin that overrides
    the JAX_PLATFORMS env var, so 'cpu' must be forced through jax.config
    (before any backend initialisation).  ``host_devices`` creates a
    virtual N-device CPU mesh (multi-chip emulation for tests/dev).
    """
    if not device:
        return
    device = str(device).lower()
    if device in ("cpu",):
        jax.config.update("jax_platforms", "cpu")
        if host_devices:
            jax.config.update("jax_num_cpu_devices", int(host_devices))
    # 'tpu'/'cuda' keep the environment default


def init_distributed_mode(run_cfg=None) -> None:
    """Join a multi-host JAX job when coordinator env vars are present.

    The reference reads torchrun/SLURM env vars and calls
    ``init_process_group`` (dist_utils.py:57-90); here the equivalent is
    ``jax.distributed.initialize``, which JAX auto-configures on TPU pods.
    A single-process run (no coordinator configured) is a silent no-op.
    """
    global _initialized
    if _initialized:
        return
    coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if coordinator or os.environ.get("MYRIAD_AUTO_DIST", "0") == "1":
        jax.distributed.initialize()
        _initialized = True
        logging.info(
            "initialized jax.distributed: process %d/%d",
            jax.process_index(),
            jax.process_count(),
        )


def _host_isa_tag() -> str:
    """Fingerprint of this host's CPU feature set.  XLA:CPU AOT cache
    entries encode the compile machine's vector ISA; loading them on a
    host with different features logs 'could lead to ... SIGILL' and has
    crashed a full-arch execute (r5 find: sandbox rounds migrate between
    heterogeneous hosts).  CPU cache dirs are therefore scoped per-ISA;
    TPU entries are keyed by the TPU target and stay shared."""
    import hashlib

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = line
                    break
    except OSError:
        import platform

        flags = platform.processor() or platform.machine()
    return hashlib.sha1(flags.encode()).hexdigest()[:10]


def enable_compilation_cache(path: Optional[str] = None) -> None:
    """Persistent XLA compilation cache: multi-minute whole-pipeline
    compiles (prefill + 90-step decode) become one-time per machine."""
    path = path or os.environ.get(
        "MYRIAD_COMPILATION_CACHE", os.path.expanduser("~/.cache/myriad_tpu/xla")
    )
    try:
        if jax.default_backend() == "cpu":
            path = os.path.join(path, f"cpu-{_host_isa_tag()}")
    except Exception:  # pragma: no cover - backend init failure
        pass
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return get_rank() == 0


def is_dist_avail_and_initialized() -> bool:
    return get_world_size() > 1


def main_process(func):
    """Run ``func`` only on the main process (reference dist_utils.py:107-114)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        if is_main_process():
            return func(*args, **kwargs)
        return None

    return wrapper


def all_sum_scalars(*values: float) -> Tuple[float, ...]:
    """Sum python scalars across hosts (replaces metric all_reduce)."""
    if get_world_size() <= 1:
        return values
    from jax.experimental import multihost_utils

    arr = np.asarray(values, dtype=np.float64)
    gathered = multihost_utils.process_allgather(arr)
    return tuple(np.sum(gathered, axis=0).tolist())


def barrier(name: str = "barrier") -> None:
    if get_world_size() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
