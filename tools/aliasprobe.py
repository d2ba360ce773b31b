"""Chipless-AOT donation/aliasing probe for the layout-coordinated block
segment (r4e burst_block8 runtime OOM).

Hypothesis: `_coordinate_state_layouts` compiles the segment with AUTO
layouts on BOTH sides; if XLA assigns the donated state argument and the
state result DIFFERENT layouts, input/output aliasing is impossible and
the executable holds TWO copies of the 5.2G KV pool at runtime — compile
succeeds (temps stay tiny, which is all the r4b layoutprobe checked),
execution OOMs on the first tick (params 8.4G + 2x pool 10.4G > 15.75G).

Prints memory_analysis alias/output/temp sizes and diffs the chosen
input-vs-output pool layouts, for (a) the shipped AUTO/AUTO coordination
and (b) the candidate fix: out_shardings pinned to the AUTO-chosen input
formats.  Nothing executes (eval_shape structs, chipless compile) — safe
while the chip is busy.

Usage: python tools/aliasprobe.py [--slots 48] [--block 8] [--segment 32]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GIB = 1024**3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--slots", type=int, default=48)
    p.add_argument("--block", type=int, default=8)
    p.add_argument("--segment", type=int, default=32)
    p.add_argument("--bucket", type=int, default=416)
    p.add_argument("--max-new", type=int, default=90)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental.layout import Format, Layout

    from myriad_tpu.common.dist import enable_compilation_cache

    enable_compilation_cache()

    from myriad_tpu.generation import GenerationConfig
    from myriad_tpu.models.llama import LlamaConfig, LlamaForCausalLM
    from myriad_tpu.serving.engine import ServingEngine

    cfg = dataclasses.replace(
        LlamaConfig(vocab_size=32000, hidden_size=4096,
                    intermediate_size=11008, num_layers=32, num_heads=32,
                    max_position_embeddings=2048),
        weight_dtype="int8", kv_cache_dtype="int8")
    model = LlamaForCausalLM(cfg, jnp.bfloat16, jnp.bfloat16)
    params = jax.eval_shape(model.init_params, jax.random.PRNGKey(0))
    gen = GenerationConfig(max_new_tokens=args.max_new, eos_token_id=-1,
                           stop_single=-1, stop_pair=(-1, -1))

    # abstract engine, coordination OFF for the whole probe (we drive the
    # compiles ourselves; with it on, _make_segment_block would EXECUTE
    # the init program and materialize the 5.2G pool on the chip)
    os.environ["MYRIAD_ENGINE_LAYOUT"] = "0"
    orig_init = ServingEngine._init_state
    ServingEngine._init_state = lambda self: jax.eval_shape(
        lambda: orig_init(self))
    try:
        eng = ServingEngine(
            model, params, slots=args.slots, bucket=args.bucket,
            config=gen, cache_dtype="int8", segment=args.segment,
            block_size=args.block)
    finally:
        ServingEngine._init_state = orig_init
    # with coordination off this is a plain jit fn; grab the underlying
    # python callable to re-jit with our shardings
    run = eng._make_segment_block().__wrapped__

    auto = Format(Layout.AUTO)
    state_struct = jax.eval_shape(lambda: orig_init(eng))

    def report(tag, in_sh, out_sh):
        jfn = jax.jit(run, donate_argnums=(1,),
                      in_shardings=(None, in_sh), out_shardings=out_sh)
        compiled = jfn.lower(params, state_struct).compile()
        m = compiled.memory_analysis()
        print(f"[{tag}] args={m.argument_size_in_bytes/GIB:.2f}G "
              f"out={m.output_size_in_bytes/GIB:.2f}G "
              f"temp={m.temp_size_in_bytes/GIB:.2f}G "
              f"alias={m.alias_size_in_bytes/GIB:.2f}G")
        return compiled

    c1 = report("AUTO/AUTO (shipped)", auto, auto)
    in_f = c1.input_formats[0][1]
    # one pool leaf's chosen layouts, in vs out
    k_in = in_f["cache"][0]["k"]
    k_out = c1.output_formats[0]["cache"][0]["k"]
    print("pool k[0] input layout :", k_in, flush=True)
    print("pool k[0] output layout:", k_out, flush=True)

    # candidate fix: donated in/out must carry the SAME concrete formats
    # (jax rejects AUTO-in with pinned-out for donated args)
    report("pinned-in/pinned-out (fix)", in_f,
           (in_f, None, None, None, None))


if __name__ == "__main__":
    main()
