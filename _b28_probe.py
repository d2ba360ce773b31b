import dataclasses, re, numpy as np
from myriad_tpu.common.dist import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from myriad_tpu.generation import GenerationConfig, greedy_generate
from myriad_tpu.models.layers import Policy
from myriad_tpu.models.llama import LlamaForCausalLM
from myriad_tpu.models.myriad import Myriad, MyriadModule
from myriad_tpu.models.vision_expert import AnomalyExpertModule
from bench import build_profile, DECODE_TOKENS

for qf in ("bf16", "int8"):
    arch = build_profile("bench")
    arch = dataclasses.replace(
        arch,
        llama=dataclasses.replace(arch.llama, weight_dtype="int8", kv_cache_dtype="int8"),
        vit_weight_dtype="int8", qformer_weight_dtype=qf,
        imagebind=dataclasses.replace(arch.imagebind, weight_dtype="int8"))
    model = Myriad(arch=arch, use_ve=True, policy=Policy.bf16_params(),
                   max_txt_len=160, end_sym="###", seed=0)
    ve = model.vision_expert
    ve.class_names = ["bottle"]; ve.class_index = {"bottle": 0}
    ve.build_text_features()
    b = 28
    images = jnp.zeros((b, arch.img_size, arch.img_size, 3), jnp.float32)
    from myriad_tpu.datasets.anomaly_detection import QUESTION_PROMPTS
    question = "<Img><ImageHere></Img>" + QUESTION_PROMPTS[1]
    before, after = model.split_prompt(question)
    before_j, after_j = jnp.asarray(before), jnp.asarray(after)
    llama = LlamaForCausalLM(arch.llama, model.policy.compute_dtype, model.policy.param_dtype)
    gen_cfg = GenerationConfig(max_new_tokens=DECODE_TOKENS, eos_token_id=-1,
                               stop_single=-1, stop_pair=(-1, -1))
    params, ve_params = model.params, ve.params
    text_feats = ve._text_feats[jnp.zeros((b,), jnp.int32)]
    ve_module = ve.module
    rng_key = jax.random.PRNGKey(0)

    def full(params, ve_params, text_feats, images):
        maps, _ = ve_module.apply(ve_params, images, text_feats, method=AnomalyExpertModule.zero_shot)
        e = model.module.apply({"params": params}, images, maps, before_j, after_j, 1,
                               method=MyriadModule.prefill_embeds)
        return greedy_generate(llama, {"params": params["llama"]}, e, config=gen_cfg,
                               cache_dtype="int8", rng=rng_key)
    try:
        c = jax.jit(full).lower(params, ve_params, text_feats, images).compile()
        ma = c.memory_analysis()
        print(f"b28 qformer={qf}: OK temp {ma.temp_size_in_bytes/2**30:.3f} args {ma.argument_size_in_bytes/2**30:.3f}")
    except Exception as e:
        m = re.search(r"Used ([\d.]+[GM]) of", str(e))
        print(f"b28 qformer={qf}: OOM used {m.group(1) if m else '?'}")
    del model, params, ve_params
