import dataclasses, time, functools, numpy as np
from myriad_tpu.common.dist import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from myriad_tpu.generation import GenerationConfig, greedy_generate
from myriad_tpu.models.layers import Policy
from myriad_tpu.models.llama import LlamaForCausalLM, init_cache
from myriad_tpu.models.myriad import Myriad, MyriadModule
from myriad_tpu.models.vision_expert import AnomalyExpertModule
from bench import build_profile

b = 16
arch = build_profile("bench")
arch = dataclasses.replace(arch, llama=dataclasses.replace(
    arch.llama, weight_dtype="int8", kv_cache_dtype="int8"))
model = Myriad(arch=arch, use_ve=True, policy=Policy.bf16_params(),
               max_txt_len=160, end_sym="###", seed=0)
ve = model.vision_expert
ve.class_names = ["bottle"]; ve.class_index = {"bottle": 0}
ve.build_text_features()
rng = np.random.default_rng(0)
images = jnp.asarray(rng.normal(size=(b, arch.img_size, arch.img_size, 3)).astype(np.float32))
from myriad_tpu.datasets.anomaly_detection import QUESTION_PROMPTS
question = "<Img><ImageHere></Img>" + QUESTION_PROMPTS[1]
before, after = model.split_prompt(question)
before_j, after_j = jnp.asarray(before), jnp.asarray(after)
llama = LlamaForCausalLM(arch.llama, model.policy.compute_dtype, model.policy.param_dtype)
params, ve_params = model.params, ve.params
text_feats = ve._text_feats[jnp.zeros((b,), jnp.int32)]
ve_module = ve.module

@jax.jit
def maps_only(ve_params, text_feats, images):
    return ve_module.apply(ve_params, images, text_feats, method=AnomalyExpertModule.zero_shot)[0].sum()

@jax.jit
def embeds_only(params, ve_params, text_feats, images):
    maps, _ = ve_module.apply(ve_params, images, text_feats, method=AnomalyExpertModule.zero_shot)
    embeds = model.module.apply({"params": params}, images, maps, before_j, after_j, 1,
                                method=MyriadModule.prefill_embeds)
    return embeds.sum()

@jax.jit
def prefill_only(params, ve_params, text_feats, images):
    maps, _ = ve_module.apply(ve_params, images, text_feats, method=AnomalyExpertModule.zero_shot)
    embeds = model.module.apply({"params": params}, images, maps, before_j, after_j, 1,
                                method=MyriadModule.prefill_embeds)
    p = embeds.shape[1]
    max_len = ((p + 90 + 127) // 128) * 128
    cache = init_cache(llama.config, b, max_len, "int8")
    logits, cache = llama.apply({"params": params["llama"]}, embeds, cache=cache)
    return logits[:, -1].astype(jnp.float32).argmax(-1).sum()

def timeit(name, fn, *a):
    t0 = time.time(); float(fn(*a)); print(f"{name} compile {time.time()-t0:.1f}s")
    ts = []
    for _ in range(4):
        t0 = time.perf_counter(); float(fn(*a)); ts.append(time.perf_counter()-t0)
    print(f"{name}: med {float(np.median(ts)):.4f}s")

timeit("maps_only", maps_only, ve_params, text_feats, images)
timeit("embeds_only(maps+encode)", embeds_only, params, ve_params, text_feats, images)
timeit("prefill_full(maps+encode+prefill+argmax)", prefill_only, params, ve_params, text_feats, images)
