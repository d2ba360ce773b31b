"""v5e HBM fit proof for the FULL-SCALE pipeline (VERDICT r1 next #7).

``jax.eval_shape`` traces the full Vicuna-7B-depth Myriad init without
allocating a byte; per-chip bytes come from each leaf's exact
``NamedSharding.shard_shape`` under ``myriad_rules()``.  Asserts:

* single chip, d32 int8 weights + int8 KV, batch 16: params + KV +
  activation bound < 16 GiB  (the bench serving profile),
* v5e-8 (1x8 model mesh): the sharded plan fits with ample headroom and
  ZERO replication fallbacks on any leaf >= 1 MiB,
* the eval-shape param count matches the 7B-class budget (sanity that the
  trace covered the whole tower set).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myriad_tpu.models.layers import Policy
from myriad_tpu.models.myriad import MyriadArch, MyriadModule
from myriad_tpu.models.vision_expert import AnomalyExpertModule
from myriad_tpu.parallel import memory, partition
from myriad_tpu.parallel.mesh import make_mesh

GIB = 1024**3


@pytest.fixture(scope="module")
def full_shapes():
    """Abstract param shapes of the full-scale model (int8 LLM serving)."""
    import dataclasses

    arch = MyriadArch.full()
    arch = dataclasses.replace(
        arch,
        llama=dataclasses.replace(arch.llama, weight_dtype="int8",
                                  kv_cache_dtype="int8"),
    )
    policy = Policy.bf16_params()
    module = MyriadModule(arch, dtype=policy.compute_dtype,
                          param_dtype=policy.param_dtype)
    img = jnp.zeros((1, arch.img_size, arch.img_size, 3), jnp.float32)
    maps = jnp.zeros((1, arch.map_size, arch.map_size, 1), jnp.float32)
    ids = jnp.zeros((2,), jnp.int32)
    text = jnp.zeros((1, 2), jnp.int32)
    mask = jnp.ones((1, 2), jnp.int32)
    shapes = jax.eval_shape(
        lambda r: module.init(r, img, maps, ids, ids, text, mask, 1,
                              method=MyriadModule.forward_train),
        jax.random.PRNGKey(0),
    )["params"]

    ve_module = AnomalyExpertModule(arch.imagebind, map_size=arch.map_size,
                                    dtype=policy.compute_dtype,
                                    param_dtype=policy.param_dtype)
    vimg = jnp.zeros((1, arch.imagebind.img_size, arch.imagebind.img_size, 3),
                     jnp.float32)
    vids = jnp.zeros((1, arch.imagebind.context_length), jnp.int32)
    vz = jax.eval_shape(
        lambda r: ve_module.init(r, vimg, jnp.zeros((1, 2, arch.imagebind.out_embed_dim)),
                                 method=AnomalyExpertModule.zero_shot),
        jax.random.PRNGKey(1),
    )["params"]
    vt = jax.eval_shape(
        lambda r: ve_module.init(r, vids, method=AnomalyExpertModule.encode_text),
        jax.random.PRNGKey(1),
    )["params"]
    ve_shapes = {**vz, **vt}
    return arch, shapes, ve_shapes


def _param_count(tree):
    return sum(math.prod(l.shape) for l in jax.tree_util.tree_leaves(tree))


def test_trace_covers_the_whole_tower_set(full_shapes):
    arch, shapes, ve_shapes = full_shapes
    n = _param_count(shapes) + _param_count(ve_shapes)
    # EVA-g 1.0B + Vicuna-7B (int8 leaves count elementwise) + Q-Former +
    # ImageBind-huge vision/text — the 8.6B-class budget
    assert 7.5e9 < n < 10e9, n


def test_single_chip_full_depth_int8_fits(full_shapes):
    """d32 + int8 weights + int8 KV + batch 16 serving on ONE v5e chip."""
    arch, shapes, ve_shapes = full_shapes
    mesh = make_mesh(n_model=1, devices=jax.devices()[:1])
    rules = partition.myriad_rules()
    sh = partition.tree_shardings(shapes, mesh, rules)
    ve_sh = partition.tree_shardings(ve_shapes, mesh, [])
    params = memory.tree_bytes_per_chip(shapes, sh) + memory.tree_bytes_per_chip(
        ve_shapes, ve_sh
    )
    report = memory.fit_report(
        shapes, sh, llama_config=arch.llama, batch=16,
        max_len=512, kv_dtype="int8", n_model=1,
    )
    total = params + report["kv_bytes"] + report["activation_bound_bytes"]
    assert total < 16 * GIB, f"{total / GIB:.2f} GiB"
    # and the bf16-KV variant does NOT leave the same headroom (the int8
    # cache is what buys batch 16 — regression guard on the claim)
    kv_bf16 = memory.kv_cache_bytes_per_chip(arch.llama, 16, 512, jnp.bfloat16)
    assert kv_bf16 > report["kv_bytes"] * 1.7


def test_single_chip_b24_int8_towers_fits(full_shapes):
    """The r2 serving profile: d32 int8 LLM + int8 KV + int8 EVA/ImageBind
    towers at batch 24 on ONE chip (measured 10.6 img/s)."""
    import dataclasses

    arch = MyriadArch.full()
    arch = dataclasses.replace(
        arch,
        llama=dataclasses.replace(arch.llama, weight_dtype="int8",
                                  kv_cache_dtype="int8"),
        vit_weight_dtype="int8",
        imagebind=dataclasses.replace(arch.imagebind, weight_dtype="int8"),
    )
    policy = Policy.bf16_params()
    module = MyriadModule(arch, dtype=policy.compute_dtype,
                          param_dtype=policy.param_dtype)
    img = jnp.zeros((1, arch.img_size, arch.img_size, 3), jnp.float32)
    maps = jnp.zeros((1, arch.map_size, arch.map_size, 1), jnp.float32)
    ids = jnp.zeros((2,), jnp.int32)
    text = jnp.zeros((1, 2), jnp.int32)
    mask = jnp.ones((1, 2), jnp.int32)
    shapes = jax.eval_shape(
        lambda r: module.init(r, img, maps, ids, ids, text, mask, 1,
                              method=MyriadModule.forward_train),
        jax.random.PRNGKey(0),
    )["params"]
    _, _, ve_shapes = full_shapes  # VE tower shapes dominate either way
    mesh = make_mesh(n_model=1, devices=jax.devices()[:1])
    sh = partition.tree_shardings(shapes, mesh, partition.myriad_rules())
    ve_sh = partition.tree_shardings(ve_shapes, mesh, [])
    params = memory.tree_bytes_per_chip(shapes, sh) + memory.tree_bytes_per_chip(
        ve_shapes, ve_sh
    )
    report = memory.fit_report(
        shapes, sh, llama_config=arch.llama, batch=24,
        max_len=512, kv_dtype="int8", n_model=1,
    )
    total = params + report["kv_bytes"] + report["activation_bound_bytes"]
    assert total < 16 * GIB, f"{total / GIB:.2f} GiB"


def test_v5e8_sharded_plan_fits_with_no_large_fallbacks(full_shapes):
    arch, shapes, ve_shapes = full_shapes
    mesh = make_mesh(n_model=8)  # 1 x 8 model-parallel serving mesh
    rules = partition.myriad_rules()
    sh = partition.tree_shardings(shapes, mesh, rules)
    fallbacks = list(getattr(partition.tree_shardings, "last_fallbacks", []))
    # no leaf >= 1 MiB may silently replicate (VERDICT r1 weak #6)
    flat = dict(zip(
        ("/".join(str(getattr(k, "key", k)) for k in p)
         for p, _ in jax.tree_util.tree_leaves_with_path(shapes)),
        jax.tree_util.tree_leaves(shapes),
    ))
    big_fallbacks = []
    for msg in fallbacks:
        path = msg.split(":")[0]
        leaf = flat.get(path)
        if leaf is not None and math.prod(leaf.shape) * jnp.dtype(leaf.dtype).itemsize >= 1 << 20:
            big_fallbacks.append(msg)
    assert big_fallbacks == [], big_fallbacks

    ve_sh = partition.tree_shardings(ve_shapes, mesh, [])  # VE replicated
    params = memory.tree_bytes_per_chip(shapes, sh) + memory.tree_bytes_per_chip(
        ve_shapes, ve_sh
    )
    report = memory.fit_report(
        shapes, sh, llama_config=arch.llama, batch=16, max_len=512,
        kv_dtype="int8", n_model=8,
    )
    total = params + report["kv_bytes"] + report["activation_bound_bytes"]
    # sharded serving must leave >50% headroom for fragmentation/compile
    assert total < 8 * GIB, f"{total / GIB:.2f} GiB"


@pytest.fixture(scope="module")
def train_shapes():
    """Abstract shapes of the stage-2 LoRA finetune model (BASELINE config
    4: int8 frozen base + LoRA q/v + remat, the bench --mode train arch).
    Frozen float leaves store bf16 (Myriad._cast_frozen), trainables fp32."""
    import dataclasses

    from myriad_tpu.models.myriad import Myriad

    arch = MyriadArch.full()
    arch = dataclasses.replace(
        arch,
        llama=dataclasses.replace(arch.llama, weight_dtype="int8",
                                  use_lora=True, remat=True),
    )
    module = MyriadModule(arch, use_grad_checkpoint=True,
                          dtype=jnp.bfloat16, param_dtype=jnp.float32)
    img = jnp.zeros((1, arch.img_size, arch.img_size, 3), jnp.float32)
    maps = jnp.zeros((1, arch.map_size, arch.map_size, 1), jnp.float32)
    ids = jnp.zeros((2,), jnp.int32)
    text = jnp.zeros((1, 2), jnp.int32)
    mask = jnp.ones((1, 2), jnp.int32)
    shapes = jax.eval_shape(
        lambda r: module.init(r, img, maps, ids, ids, text, mask, 1,
                              method=MyriadModule.forward_train),
        jax.random.PRNGKey(0),
    )["params"]

    import re

    def trainable(path: str) -> bool:
        return (path.startswith(("expert_adaptor", "ve_instructor",
                                 "ve_tokenizer"))
                or bool(re.search(r"lora_[ab]", path)))

    # frozen float leaves -> bf16 storage (the serving/training cast)
    def cast(key_path, leaf):
        path = partition.param_path(key_path)
        if trainable(path) or not jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf
        name = path.rsplit("/", 1)[-1]
        if name in ("scale", "scale4"):
            return leaf
        return jax.ShapeDtypeStruct(leaf.shape, jnp.bfloat16)

    shapes = jax.tree_util.tree_map_with_path(cast, shapes)
    return arch, shapes, trainable


def test_train_lora_single_chip_bench_batch_fits(train_shapes):
    """The measured train bench profile (one chip, batch 8, remat, int8
    frozen base) is within the 16 GiB budget by the eval-shape math —
    grads + Adam moments for the trainable subtree included."""
    arch, shapes, trainable = train_shapes
    mesh = make_mesh(n_model=1, devices=jax.devices()[:1])
    sh = partition.tree_shardings(shapes, mesh, partition.myriad_rules())
    report = memory.train_fit_report(
        shapes, sh, trainable, llama_config=arch.llama, batch=8, seq=512,
        n_model=1,
    )
    assert report["fits"], f"{report['total_bytes'] / GIB:.2f} GiB"
    # the train-only state is small (LoRA + ~115M of adaptors — the
    # VETokenizer 5x5 head dominates — NOT the 7B base, whose Adam state
    # would be ~84 GiB): trainable-only optimization is what makes
    # single-chip training viable (reference runner_base.py:598-605)
    assert report["grad_bytes"] + report["moment_bytes"] < 2 * GIB


def test_train_lora_v5e8_reference_envelope_fits(train_shapes):
    """BASELINE config 4: the stage-2 LoRA finetune sharded over a v5e-8
    mesh at the reference batch envelope (2 GPUs x bs4 halved to 2 for the
    AD dataset x2 aug-concat = 8; run at 16 for headroom in the proof)."""
    arch, shapes, trainable = train_shapes
    mesh = make_mesh(n_model=8)
    sh = partition.tree_shardings(shapes, mesh, partition.myriad_rules())
    report = memory.train_fit_report(
        shapes, sh, trainable, llama_config=arch.llama, batch=16, seq=512,
        n_model=8,
    )
    assert report["fits"], f"{report['total_bytes'] / GIB:.2f} GiB"
    # sharded training must leave >40% headroom for temps/fragmentation
    assert report["total_bytes"] < 9.6 * GIB, (
        f"{report['total_bytes'] / GIB:.2f} GiB"
    )


def test_sharded_leaf_math_matches_shard_shape(full_shapes):
    """leaf_bytes_per_chip uses the exact GSPMD shard shape, not div-rounding."""
    arch, shapes, _ = full_shapes
    mesh = make_mesh(n_model=8)
    lead = shapes["llama"]["model"]["layers_0"]["self_attn"]["k_proj"]["w_int8"]
    sh = partition.tree_shardings(shapes, mesh, partition.myriad_rules())
    s = sh["llama"]["model"]["layers_0"]["self_attn"]["k_proj"]["w_int8"]
    per = memory.leaf_bytes_per_chip(lead.shape, lead.dtype, s)
    assert per == math.prod(lead.shape) * 1 // 8
