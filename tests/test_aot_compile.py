"""AOT lower+compile of sharded programs on the virtual mesh.

Shard-shape arithmetic (test_fit_proof.py) proves the 7B plan fits;
these tests prove the programs LOWER AND COMPILE under GSPMD — the SPMD
partitioner (which surfaces uneven-dim and custom-partitioning failures)
runs at ``.compile()`` time (VERDICT r2 next #2).

The suite runs the tiny-arch mechanics (seconds); the FULL d32 compile is
exercised by ``__graft_entry__.dryrun_multichip`` (the driver's multichip
check) and on demand via ``MYRIAD_FULL_AOT=1 pytest tests/test_aot_compile.py``.
"""

import os

import pytest

from myriad_tpu.models.llama import LlamaConfig
from myriad_tpu.models.myriad import MyriadArch
from myriad_tpu.parallel import aot
from myriad_tpu.parallel import mesh as mesh_lib


@pytest.fixture(scope="module")
def mesh():
    return mesh_lib.make_mesh(n_model=2)


def test_aot_serving_compiles_tiny(mesh):
    arch = MyriadArch.tiny(
        llama=LlamaConfig.tiny(weight_dtype="int8", kv_cache_dtype="int8")
    )
    compiled = aot.compile_full_serving(
        mesh, batch=8, max_new_tokens=4, prompt_before=3, prompt_after=4,
        arch=arch,
    )
    # the compiled executable exists and reports per-device shards
    assert compiled is not None
    # the shipping levers (chunked prefill scan + staged sliced-cache
    # decode) must also lower under the SPMD partitioner
    assert aot.compile_full_serving(
        mesh, batch=8, max_new_tokens=4, prompt_before=3, prompt_after=4,
        arch=arch, prefill_chunks=3, staged_decode=True, cache_granularity=4,
    ) is not None


def test_aot_train_compiles_tiny(mesh):
    arch = MyriadArch.tiny(
        llama=LlamaConfig.tiny(weight_dtype="int8", use_lora=True, remat=True)
    )
    compiled = aot.compile_full_train(
        mesh, batch=8, txt_len=8, prompt_before=3, prompt_after=4, arch=arch,
    )
    assert compiled is not None


@pytest.mark.skipif(os.environ.get("MYRIAD_FULL_AOT", "0") != "1",
                    reason="full d32 compile takes minutes; driver runs it "
                           "via dryrun_multichip (MYRIAD_FULL_AOT=1 to force)")
def test_aot_full_arch_compiles(mesh):
    aot.compile_full_serving(mesh, batch=8)
    aot.compile_full_train(mesh, batch=8)
