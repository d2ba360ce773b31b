"""AOT lowering/compilation of the FULL-SCALE programs on a virtual mesh.

Shard-shape arithmetic (parallel/memory.py + test_fit_proof) proves the
7B-scale programs FIT v5e-8; this module proves they actually LOWER AND
COMPILE under GSPMD — uneven-dim sharding, custom_partitioning edge cases
and collective layouts only surface in the SPMD partitioner, which runs at
``.compile()`` time (VERDICT r2 next #2; SURVEY §7.2 step 6).

Everything is abstract: parameter trees come from ``jax.eval_shape`` over
``module.init`` (no 7B materialization — a CPU init would need 28 GiB) and
``Lowered.compile()`` allocates no buffers.  Runs on the 8-device CPU mesh
in tests and in ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from myriad_tpu.parallel import mesh as mesh_lib
from myriad_tpu.parallel import partition


def _abstract(tree, shardings=None):
    """ShapeDtypeStruct tree (optionally with shardings attached)."""
    if shardings is None:
        return jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree
        )
    return jax.tree_util.tree_map(
        lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
        tree, shardings,
    )


def _serving_arch():
    from myriad_tpu.models.myriad import MyriadArch

    arch = MyriadArch.full()
    return dataclasses.replace(
        arch,
        vit_weight_dtype="int8",
        qformer_weight_dtype="int8",
        llama=dataclasses.replace(arch.llama, weight_dtype="int8",
                                  kv_cache_dtype="int8"),
        imagebind=dataclasses.replace(arch.imagebind, weight_dtype="int8"),
    )


def _train_arch():
    from myriad_tpu.models.myriad import MyriadArch

    arch = MyriadArch.full()
    return dataclasses.replace(
        arch,
        llama=dataclasses.replace(arch.llama, weight_dtype="int8",
                                  use_lora=True, remat=True),
    )


def _module_param_struct(module, init_args, method):
    """Abstract {params: ...} via eval_shape (no weights materialized)."""
    rng = jax.random.PRNGKey(0)
    out = jax.eval_shape(
        lambda r: module.init(r, *init_args, method=method), rng
    )
    return out["params"]


def _sharded_struct(params_struct, mesh, rules):
    shardings = partition.tree_shardings(params_struct, mesh, rules)
    return _abstract(params_struct, shardings)


def compile_full_serving(mesh=None, batch: int = 8, max_new_tokens: int = 90,
                         prompt_before: int = 8, prompt_after: int = 180,
                         arch=None, prefill_chunks: int = 1,
                         staged_decode: bool = False,
                         cache_granularity: int = 32,
                         with_args: bool = False):
    """AOT-compile the d32 int8+int8KV serving program (prefill_embeds +
    90-token greedy decode) with production GSPMD rules.  Returns the
    jax Compiled object (its existence IS the proof).  ``prefill_chunks``/
    ``staged_decode`` prove the chunked-prefill scan and the sliced-cache
    staged-decode spans also lower under the SPMD partitioner."""
    from myriad_tpu.generation import GenerationConfig, greedy_generate
    from myriad_tpu.models.llama import LlamaForCausalLM
    from myriad_tpu.models.myriad import MyriadModule

    mesh = mesh or mesh_lib.make_mesh(n_model=1)
    arch = arch or _serving_arch()
    module = MyriadModule(arch, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    a = arch

    img = jnp.zeros((1, a.img_size, a.img_size, 3), jnp.float32)
    maps = jnp.zeros((1, a.map_size, a.map_size, 1), jnp.float32)
    ids = jnp.zeros((2,), jnp.int32)
    text = jnp.zeros((1, 2), jnp.int32)
    # init through forward_train so the WHOLE tree (llama stack included)
    # exists; prefill_embeds alone never traverses the decoder layers
    params_struct = _module_param_struct(
        module, (img, maps, ids, ids, text, text, 1), MyriadModule.forward_train
    )
    params_abs = _sharded_struct(params_struct, mesh, partition.myriad_rules())

    llama = LlamaForCausalLM(a.llama, jnp.bfloat16, jnp.bfloat16)
    gen_cfg = GenerationConfig(max_new_tokens=max_new_tokens, eos_token_id=-1,
                               stop_single=-1, stop_pair=(-1, -1),
                               prefill_chunks=prefill_chunks,
                               staged_decode=staged_decode,
                               cache_granularity=cache_granularity)

    def serve(params, image, maps, before, after):
        embeds = module.apply(
            {"params": params}, image, maps, before, after, 1, add_bos=False,
            method=MyriadModule.prefill_embeds,
        )
        return greedy_generate(llama, {"params": params["llama"]}, embeds,
                               config=gen_cfg, cache_dtype="int8")

    ds = lambda nd: NamedSharding(mesh, P("data", *([None] * (nd - 1))))
    rep = NamedSharding(mesh, P())
    args = (
        params_abs,
        jax.ShapeDtypeStruct((batch, a.img_size, a.img_size, 3), jnp.float32,
                             sharding=ds(4)),
        jax.ShapeDtypeStruct((batch, a.map_size, a.map_size, 1), jnp.float32,
                             sharding=ds(4)),
        jax.ShapeDtypeStruct((prompt_before,), jnp.int32, sharding=rep),
        jax.ShapeDtypeStruct((prompt_after,), jnp.int32, sharding=rep),
    )
    with mesh:
        compiled = jax.jit(serve).lower(*args).compile()
    return (compiled, args) if with_args else compiled


def compile_full_train(mesh=None, batch: int = 8, txt_len: int = 32,
                       prompt_before: int = 8, prompt_after: int = 60,
                       arch=None, with_args: bool = False):
    """AOT-compile the stage-2 LoRA finetune step (loss + grads over the
    trainable subtree + optax update) at full d32 scale under the
    production rules (BASELINE config 4 envelope,
    reference train_configs/loraadapter_simple_myriad_finetune.yaml)."""
    import optax

    from myriad_tpu import checkpoint as ckpt_lib
    from myriad_tpu.common.optim import build_schedule, make_optimizer
    from myriad_tpu.models.myriad import MyriadModule

    mesh = mesh or mesh_lib.make_mesh(n_model=1)
    arch = arch or _train_arch()
    module = MyriadModule(arch, use_grad_checkpoint=True, dtype=jnp.bfloat16,
                          param_dtype=jnp.float32)
    a = arch

    img = jnp.zeros((1, a.img_size, a.img_size, 3), jnp.float32)
    maps = jnp.zeros((1, a.map_size, a.map_size, 1), jnp.float32)
    ids = jnp.zeros((2,), jnp.int32)
    text = jnp.zeros((1, 2), jnp.int32)
    params_struct = _module_param_struct(
        module, (img, maps, ids, ids, text, text, 1), MyriadModule.forward_train
    )

    # trainable/frozen split exactly as Myriad does (LoRA + adaptors)
    import re

    def trainable_pred(path: str) -> bool:
        return (path.startswith(("expert_adaptor", "ve_instructor", "ve_tokenizer"))
                or bool(re.search(r"lora_[ab]", path)))

    trainable_s, frozen_s = ckpt_lib.split_by_predicate(params_struct, trainable_pred)
    rules = partition.myriad_rules()
    trainable_abs = _sharded_struct(trainable_s, mesh, rules)
    frozen_abs = _sharded_struct(frozen_s, mesh, rules)

    tx = make_optimizer(
        build_schedule("linear_warmup_cosine_lr", init_lr=1e-4, min_lr=0.0,
                       max_epoch=10, iters_per_epoch=1600, warmup_steps=0),
        weight_decay=0.05,
    )
    opt_struct = jax.eval_shape(tx.init, trainable_s)
    # optimizer moments shard like their parameters: the moment trees mirror
    # the param tree, so the path-regex rules resolve identically (the
    # Adam 'count' scalars fall through to replication)
    opt_abs = _abstract(opt_struct,
                        partition.tree_shardings(opt_struct, mesh, rules))

    def train_step(trainable, opt_state, frozen, image, maps, before, after,
                   text_ids, text_mask):
        def loss_fn(tr):
            params = ckpt_lib.overlay_trees(frozen, tr)
            return module.apply(
                {"params": params}, image, maps, before, after,
                text_ids, text_mask, 1, method=MyriadModule.forward_train,
            )

        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, new_opt = tx.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), new_opt, loss

    ds = lambda nd: NamedSharding(mesh, P("data", *([None] * (nd - 1))))
    rep = NamedSharding(mesh, P())
    args = (
        trainable_abs,
        opt_abs,
        frozen_abs,
        jax.ShapeDtypeStruct((batch, a.img_size, a.img_size, 3), jnp.float32,
                             sharding=ds(4)),
        jax.ShapeDtypeStruct((batch, a.map_size, a.map_size, 1), jnp.float32,
                             sharding=ds(4)),
        jax.ShapeDtypeStruct((prompt_before,), jnp.int32, sharding=rep),
        jax.ShapeDtypeStruct((prompt_after,), jnp.int32, sharding=rep),
        jax.ShapeDtypeStruct((batch, txt_len), jnp.int32, sharding=ds(2)),
        jax.ShapeDtypeStruct((batch, txt_len), jnp.int32, sharding=ds(2)),
    )
    with mesh:
        compiled = jax.jit(train_step).lower(*args).compile()
    return (compiled, args) if with_args else compiled


# -- opt-in EXECUTION of the full-arch programs (VERDICT r3 next #5) ---------

def materialize(abs_tree, seed: int = 0):
    """Concrete arrays for a ShapeDtypeStruct tree, placed per-sharding.

    Fill is cheap + deterministic (vectorized modular patterns, not a real
    RNG — a 7.9B-leaf random init on one CPU core costs minutes for zero
    extra fault coverage): int8 weights cycle small nonzero ints, floats
    cycle small positive values so quant scales / LayerNorm gains never
    divide by zero.  Execution exists to surface runtime-only faults
    (donation aliasing, int8 scatter layouts) that AOT compile cannot —
    loss/token values only need to be finite."""
    import numpy as np

    def fill(s, i):
        n = int(np.prod(s.shape)) if s.shape else 1
        base = np.arange(i, i + n, dtype=np.int64)
        if jnp.issubdtype(s.dtype, jnp.integer):
            vals = (base % 7 - 3).astype(s.dtype)  # int8 weights: [-3, 3]
        elif jnp.issubdtype(s.dtype, jnp.floating):
            vals = ((base % 13 + 1) * 0.01).astype(s.dtype)  # (0, 0.13]
        else:
            vals = np.zeros(n, s.dtype)
        arr = vals.reshape(s.shape)
        sh = getattr(s, "sharding", None)
        return jax.device_put(arr, sh) if sh is not None else jnp.asarray(arr)

    leaves, treedef = jax.tree_util.tree_flatten(abs_tree)
    return jax.tree_util.tree_unflatten(
        treedef, [fill(s, seed + 37 * i) for i, s in enumerate(leaves)])


def execute_full_serving(mesh=None, batch: int = 2, max_new_tokens: int = 8,
                         **kw):
    """Compile AND run one full-arch d32 int8 serving step on the mesh with
    materialized params (~8 GiB host).  Returns the first emitted token ids
    (host ints) — finite/valid-range is the assertion the caller makes."""
    compiled, args = compile_full_serving(mesh, batch=batch,
                                          max_new_tokens=max_new_tokens,
                                          with_args=True, **kw)
    out = compiled(*materialize(args))
    tokens = out[0] if isinstance(out, tuple) else out
    return jax.device_get(tokens)


def execute_full_train(mesh=None, batch: int = 2, txt_len: int = 8, **kw):
    """Compile AND run one full-arch LoRA train step (loss + grads + optax
    update) with materialized params.  Returns the float loss."""
    compiled, args = compile_full_train(mesh, batch=batch, txt_len=txt_len,
                                        with_args=True, **kw)
    new_trainable, new_opt, loss = compiled(*materialize(args))
    return float(loss)
