import dataclasses, time, functools, numpy as np
from myriad_tpu.common.dist import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from myriad_tpu.generation import GenerationConfig, greedy_generate
from myriad_tpu.models.llama import LlamaConfig, LlamaForCausalLM, init_cache

cfg = LlamaConfig.vicuna_7b(weight_dtype="int8")
model = LlamaForCausalLM(cfg, jnp.bfloat16, jnp.bfloat16)
rng = np.random.default_rng(0)
params = jax.eval_shape(lambda r: model.init_params(r), jax.random.PRNGKey(0))
# materialize random params cheaply on device (jit init)
params = jax.jit(model.init_params)(jax.random.PRNGKey(0))

@functools.partial(jax.jit, static_argnames=("b", "ntok", "kv"))
def gen(params, embeds, b, ntok, kv):
    c = GenerationConfig(max_new_tokens=ntok, eos_token_id=-1, stop_single=-1, stop_pair=(-1, -1))
    return greedy_generate(model, params, embeds, config=c,
                           cache_dtype=("int8" if kv == "int8" else jnp.bfloat16))

for b, kv in ((16, "int8"), (16, "bf16"), (8, "int8"), (24, "int8")):
    embeds = jnp.asarray(rng.normal(size=(b, 120, 4096)).astype(np.float32) * 0.02).astype(jnp.bfloat16)
    try:
        for ntok in (2, 58):
            t0 = time.time(); np.asarray(gen(params, embeds, b, ntok, kv)); c1 = time.time()-t0
            ts = []
            for _ in range(3):
                t0 = time.perf_counter(); np.asarray(gen(params, embeds, b, ntok, kv)); ts.append(time.perf_counter()-t0)
            med = float(np.median(ts))
            if ntok == 2: base = med
            else: print(f"b={b} kv={kv}: per-step {(med-base)/56*1e3:.2f} ms  (base {base:.3f}s)")
    except Exception as e:
        print(f"b={b} kv={kv}: FAIL {str(e)[:120]}")
