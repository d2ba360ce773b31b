"""Serving engine under GSPMD: multichip serving parity on the CPU mesh.

Params shard Megatron-style over the 'model' axis (LLAMA_RULES) and the
engine's KV cache shards over heads on the same axis — attention runs
shard-local per head, the o_proj psum is the only collective, and there
is no cache gather.  Transcripts must match the single-device engine and
the solo greedy_generate reference exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myriad_tpu.generation import GenerationConfig, greedy_generate, trim_stop_ids
from myriad_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from myriad_tpu.parallel import mesh as mesh_lib
from myriad_tpu.parallel import partition
from myriad_tpu.serving import ServingEngine

CFG = GenerationConfig(max_new_tokens=8, eos_token_id=-1, stop_single=-1,
                       stop_pair=(-1, -1))


def _run(model, params, prompts, cache_dtype, mesh=None, spec_k=0,
         block_size=0):
    eng = ServingEngine(model, params, slots=2, bucket=64, config=CFG,
                        cache_dtype=cache_dtype, segment=4,
                        admit_widths=(8, 16), mesh=mesh, spec_k=spec_k,
                        block_size=block_size)
    for i, p in enumerate(prompts):
        eng.submit(p, request_id=i)
    out = {f.request_id: f.tokens for f in eng.drain()}
    return [out[i] for i in range(len(prompts))], eng


@pytest.mark.parametrize("cache_dtype,spec_k,block_size",
                         [(jnp.float32, 0, 0), ("int8", 0, 0),
                          (jnp.float32, 2, 0), ("int8", 0, 2)])
def test_sharded_engine_matches_unsharded(cache_dtype, spec_k, block_size):
    cfg = LlamaConfig.tiny()
    model = LlamaForCausalLM(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(3))
    rng = np.random.default_rng(2)
    prompts = [
        jnp.asarray(rng.normal(size=(t, cfg.hidden_size)).astype(np.float32) * 0.15)
        for t in (11, 5, 9)
    ]
    ref, _ = _run(model, params, prompts, cache_dtype, spec_k=spec_k,
                  block_size=block_size)
    for tokens, p in zip(ref, prompts):
        solo = np.asarray(greedy_generate(
            model, params, p[None], config=CFG, cache_dtype=cache_dtype))[0]
        np.testing.assert_array_equal(tokens, trim_stop_ids(solo, CFG))

    mesh = mesh_lib.make_mesh(n_model=2)
    sharded_params = jax.device_put(
        params, partition.tree_shardings(params, mesh, partition.LLAMA_RULES))
    got, eng = _run(model, sharded_params, prompts, cache_dtype, mesh=mesh,
                    spec_k=spec_k, block_size=block_size)
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(a, b)

    # the cache really is head-sharded on the model axis (no silent gather
    # back to replicated through the segment program)
    from jax.sharding import PartitionSpec as P

    k_leaf = eng._state["cache"][0]["k"]
    assert k_leaf.sharding.spec == P(None, "model")
