"""AOT memory probe for the serving program (batch-28/32 temp surgery).

Compiles the bench eval step (VE maps + encode_img + prefill + 90-token
greedy decode) for the attached TPU WITHOUT executing it and prints the
compiler's memory analysis (argument/output/temp/peak bytes).  The axon
runtime scrubs xla_dump_to, so this is the only buffer-level attribution
available (BENCH_NOTES r2b "measured but rejected: batch 32").

Usage: python tools/memprobe.py [--batch 28] [--phases] [--kv-bucket 400]
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
    p.add_argument("--batch", type=int, default=28)
    p.add_argument("--phases", action="store_true",
                   help="also compile maps/prefill/decode pieces separately")
    p.add_argument("--profile", default="bench")
    p.add_argument("--no-quant-towers", action="store_true")
    p.add_argument("--decode-tokens", type=int, default=90)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from myriad_tpu.common.dist import enable_compilation_cache

    enable_compilation_cache()

    from bench import build_profile
    from myriad_tpu.generation import GenerationConfig, greedy_generate
    from myriad_tpu.models.llama import LlamaForCausalLM
    from myriad_tpu.models.myriad import MyriadModule
    from myriad_tpu.models.vision_expert import AnomalyExpertModule
    from myriad_tpu.parallel import aot, mesh as mesh_lib, partition

    arch = build_profile(args.profile)
    arch = dataclasses.replace(
        arch,
        llama=dataclasses.replace(arch.llama, weight_dtype="int8",
                                  kv_cache_dtype="int8"),
        vit_weight_dtype="bf16" if args.no_quant_towers else "int8",
        qformer_weight_dtype="bf16" if args.no_quant_towers else "int8",
        imagebind=dataclasses.replace(
            arch.imagebind,
            weight_dtype="bf16" if args.no_quant_towers else "int8"),
    )
    module = MyriadModule(arch, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    ve_module = AnomalyExpertModule(arch.imagebind, map_size=arch.map_size,
                                    dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    a = arch
    b = args.batch

    img = jnp.zeros((1, a.img_size, a.img_size, 3), jnp.float32)
    maps0 = jnp.zeros((1, a.map_size, a.map_size, 1), jnp.float32)
    ids = jnp.zeros((2,), jnp.int32)
    text = jnp.zeros((1, 2), jnp.int32)
    params_struct = jax.eval_shape(
        lambda r: module.init(r, img, maps0, ids, ids, text, text, 1,
                              method=MyriadModule.forward_train),
        jax.random.PRNGKey(0),
    )["params"]
    vimg = jnp.zeros((1, a.imagebind.img_size, a.imagebind.img_size, 3), jnp.float32)
    vz = jax.eval_shape(
        lambda r: ve_module.init(
            r, vimg, jnp.zeros((1, 2, a.imagebind.out_embed_dim)),
            method=AnomalyExpertModule.zero_shot),
        jax.random.PRNGKey(1),
    )

    llama = LlamaForCausalLM(a.llama, jnp.bfloat16, jnp.bfloat16)
    gen_cfg = GenerationConfig(max_new_tokens=args.decode_tokens,
                               eos_token_id=-1, stop_single=-1,
                               stop_pair=(-1, -1))
    # the real AQA bench prompt lengths (bench.py question2)
    n_before, n_after = 8, 190

    def eval_step(params, ve_params, text_feats, images):
        maps, _ = ve_module.apply(ve_params, images, text_feats,
                                  method=AnomalyExpertModule.zero_shot)
        embeds = module.apply(
            {"params": params}, images, maps,
            jnp.zeros((n_before,), jnp.int32), jnp.zeros((n_after,), jnp.int32),
            1, add_bos=False, method=MyriadModule.prefill_embeds,
        )
        return greedy_generate(llama, {"params": params["llama"]}, embeds,
                               config=gen_cfg, cache_dtype="int8")

    abs_args = (
        aot._abstract(params_struct),
        aot._abstract(vz),
        jax.ShapeDtypeStruct((b, 2, a.imagebind.out_embed_dim), jnp.float32),
        jax.ShapeDtypeStruct((b, a.img_size, a.img_size, 3), jnp.float32),
    )

    def report(name, fn, *fargs):
        import time

        t0 = time.time()
        compiled = jax.jit(fn).lower(*fargs).compile()
        ma = compiled.memory_analysis()
        print(f"[{name}] compile {time.time()-t0:.0f}s  "
              f"args {ma.argument_size_in_bytes/GIB:.2f}G  "
              f"out {ma.output_size_in_bytes/GIB:.2f}G  "
              f"temp {ma.temp_size_in_bytes/GIB:.2f}G  "
              f"alias {ma.alias_size_in_bytes/GIB:.2f}G  "
              f"peak(args+out+temp-alias) "
              f"{(ma.argument_size_in_bytes + ma.output_size_in_bytes + ma.temp_size_in_bytes - ma.alias_size_in_bytes)/GIB:.2f}G")
        return compiled

    print(f"batch={b} profile={args.profile} towers="
          f"{'bf16' if args.no_quant_towers else 'int8'}")
    report("full-eval-step", eval_step, *abs_args)

    if args.phases:
        def maps_only(ve_params, text_feats, images):
            return ve_module.apply(ve_params, images, text_feats,
                                   method=AnomalyExpertModule.zero_shot)[0]

        report("ve-maps", maps_only, *abs_args[1:])

        def prefill_embeds(params, images, maps):
            return module.apply(
                {"params": params}, images, maps,
                jnp.zeros((n_before,), jnp.int32),
                jnp.zeros((n_after,), jnp.int32), 1, add_bos=False,
                method=MyriadModule.prefill_embeds,
            )

        report("encode+prefill-embeds", prefill_embeds, abs_args[0],
               abs_args[3],
               jax.ShapeDtypeStruct((b, a.map_size, a.map_size, 1), jnp.float32))

        def llm_only(params, embeds):
            return greedy_generate(llama, {"params": params["llama"]}, embeds,
                                   config=gen_cfg, cache_dtype="int8")

        seq = 1 + n_before + 99 + n_after - 1  # [before][img 99][after], no bos
        report("llm-prefill+decode", llm_only, abs_args[0],
               jax.ShapeDtypeStruct((b, seq, a.llama.hidden_size), jnp.bfloat16))


if __name__ == "__main__":
    main()
