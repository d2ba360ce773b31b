"""AOT memory probe for the serving ENGINE segment program.

The block-KV-layout segment at 48 slots OOM'd at compile (16.71G/15.75G,
r4 sweep burst_block8): the compiler report shows 64 x 78M `copy(...)`
HLO temps — one per K/V pool buffer — i.e. a layout round-trip of the
whole 5.2G cache pool inside the program.  This probe compiles the
segment program STANDALONE with abstract arguments (XLA free to pick
argument layouts, memprobe-style) to separate two hypotheses:

  * cross-program layout disagreement: the admission/insert programs emit
    the pool in a layout the segment's while-carry dislikes -> standalone
    compile (unconstrained layouts) shows NO copies;
  * intrinsic to the block write pattern -> copies persist standalone.

Nothing executes and no buffers allocate: params/state are eval_shape
structs, `.compile()` happens on the chipless axon helper — safe to run
while the chip is busy.

Usage: python tools/layoutprobe.py [--slots 48] [--block 8] [--segment 32]
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

    # abstract params: eval_shape over init (no 7B materialization)
    params = jax.eval_shape(model.init_params, jax.random.PRNGKey(0))

    gen = GenerationConfig(max_new_tokens=args.max_new, eos_token_id=-1,
                           stop_single=-1, stop_pair=(-1, -1))

    def build(block):
        # abstract engine: _init_state via eval_shape so construction
        # allocates nothing on the (busy) chip
        orig_init = ServingEngine._init_state
        ServingEngine._init_state = lambda self: jax.eval_shape(
            lambda: orig_init(self))
        try:
            eng = ServingEngine(
                model, params, slots=args.slots, bucket=args.bucket,
                config=gen, cache_dtype="int8", segment=args.segment,
                block_size=block)
        finally:
            ServingEngine._init_state = orig_init
        run = (eng._make_segment_block() if block else eng._make_segment())
        return eng, run

    for block in (args.block, 0):
        eng, run = build(block)
        name = f"block{block}" if block else "per-row(vmap)"
        lowered = run.lower(params, eng._state)
        compiled = lowered.compile()
        m = compiled.memory_analysis()
        print(f"[{name}] args={m.argument_size_in_bytes/GIB:.2f}G "
              f"out={m.output_size_in_bytes/GIB:.2f}G "
              f"temp={m.temp_size_in_bytes/GIB:.2f}G "
              f"alias={m.alias_size_in_bytes/GIB:.2f}G "
              f"peak~={(m.argument_size_in_bytes + m.temp_size_in_bytes)/GIB:.2f}G")


if __name__ == "__main__":
    main()
