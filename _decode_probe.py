import dataclasses, time, numpy as np
from myriad_tpu.common.dist import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from myriad_tpu.generation import GenerationConfig, greedy_generate
from myriad_tpu.models.layers import Policy
from myriad_tpu.models.llama import LlamaForCausalLM
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
rng_key = jax.random.PRNGKey(0)

import functools
@functools.partial(jax.jit, static_argnames=("ntok",))
def eval_step_fn(params, ve_params, text_feats, images, ntok):
    cfg = GenerationConfig(max_new_tokens=ntok, eos_token_id=-1,
                           stop_single=-1, stop_pair=(-1, -1))
    maps, _ = ve_module.apply(ve_params, images, text_feats, method=AnomalyExpertModule.zero_shot)
    embeds = model.module.apply({"params": params}, images, maps, before_j, after_j, 1,
                                method=MyriadModule.prefill_embeds)
    return greedy_generate(llama, {"params": params["llama"]}, embeds, config=cfg,
                           cache_dtype="int8", rng=rng_key)

for ntok in (2, 30, 90):
    t0 = time.time()
    np.asarray(eval_step_fn(params, ve_params, text_feats, images, ntok))
    print(f"ntok={ntok} compile+run {time.time()-t0:.1f}s")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(eval_step_fn(params, ve_params, text_feats, images, ntok))
        times.append(time.perf_counter() - t0)
    print(f"ntok={ntok} med {float(np.median(times)):.3f}s")
