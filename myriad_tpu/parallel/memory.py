"""Per-chip memory accounting for sharded serving/training plans.

The reference never has to budget memory — each A100 holds a full replica.
On v5e (16 GiB HBM/chip) the 8.6B-parameter tower set only fits sharded,
so the plan must be *provable* before touching hardware: every leaf's
per-chip bytes are computed from its ``NamedSharding.shard_shape`` (the
exact GSPMD placement, not an estimate), plus the KV cache and an
activation bound.

Used by tests/test_fit_proof.py to assert the full-depth pipeline fits a
v5e-8 mesh with zero replication fallbacks on large leaves.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

GIB = 1024**3


def leaf_bytes_per_chip(shape, dtype, sharding) -> int:
    """HBM bytes one chip holds for a leaf placed under ``sharding``."""
    shard = sharding.shard_shape(tuple(shape))
    return math.prod(shard) * jnp.dtype(dtype).itemsize


def tree_bytes_per_chip(shapes_tree, shardings_tree) -> int:
    """Sum per-chip bytes over a pytree of ShapeDtypeStructs + shardings."""
    leaves = zip(
        jax.tree_util.tree_leaves(shapes_tree),
        jax.tree_util.tree_leaves(
            shardings_tree, is_leaf=lambda x: hasattr(x, "shard_shape")
        ),
    )
    return sum(leaf_bytes_per_chip(l.shape, l.dtype, s) for l, s in leaves)


def kv_cache_bytes_per_chip(
    config, batch: int, max_len: int, dtype, n_model: int = 1
) -> int:
    """Decode KV cache per chip.

    Head-major (B, Hk, Tmax, D) per layer; heads shard over the model axis
    (the same column-parallel split as q/k/v projections), batch over data.
    ``dtype`` may be "int8" (adds the fp32 per-position scale planes).
    """
    heads = max(config.kv_heads // n_model, 1)
    elems = batch * heads * max_len * config.dims_per_head
    if dtype in ("int8", jnp.int8):
        per_layer = elems * 1 * 2  # int8 k+v
        per_layer += batch * heads * max_len * 1 * 2 * 2  # fp16 scales
    else:
        per_layer = elems * jnp.dtype(dtype).itemsize * 2
    return per_layer * config.num_layers


def prefill_activation_bound(
    config, batch: int, seq: int, n_model: int = 1, compute_bytes: int = 2
) -> int:
    """Upper bound on live prefill activations per chip.

    XLA frees buffers between layers, so the peak is a handful of live
    (B, T, ·) tensors inside one layer: the residual stream, the sharded
    MLP intermediates (gate+up), and the fp32 attention logits
    (B, H, T, T).  A 4x residual-stream slack term absorbs fusion
    boundaries observed on v5e profiles.
    """
    hidden = batch * seq * config.hidden_size * compute_bytes
    inter = 2 * batch * seq * (config.intermediate_size // n_model) * compute_bytes
    logits = 4 * batch * (config.num_heads // n_model) * seq * seq
    return 4 * hidden + inter + logits


def remat_train_activation_bound(
    config, batch: int, seq: int, n_model: int = 1, compute_bytes: int = 2
) -> int:
    """Upper bound on live activations for a REMAT train step per chip.

    With per-layer rematerialization (LlamaConfig.remat) the backward pass
    keeps only the checkpointed layer-boundary residual streams — one
    (B, T, hidden) tensor per layer — plus ONE layer's full recomputed
    activation set (the prefill bound), plus the fp32 LM-head logits and
    their cotangent at the loss (the largest single buffer:
    (B, T-1, vocab) x 4 bytes x 2).
    """
    boundaries = config.num_layers * batch * seq * config.hidden_size * compute_bytes
    one_layer = prefill_activation_bound(config, batch, seq, n_model, compute_bytes)
    vocab = config.vocab_size // max(n_model, 1)
    ce = 2 * batch * max(seq - 1, 1) * vocab * 4
    return boundaries + one_layer + ce


def train_state_bytes_per_chip(shapes_tree, shardings_tree, trainable_pred) -> Dict:
    """Per-chip bytes of the TRAIN-only state: fp32 gradients + AdamW
    mu/nu moments for every trainable leaf (path-predicate selected, the
    same split Myriad uses).  Moments/grads shard like their parameters."""
    from myriad_tpu.parallel.partition import param_path

    grads = 0
    flat_shapes = jax.tree_util.tree_leaves_with_path(shapes_tree)
    flat_shard = jax.tree_util.tree_leaves(
        shardings_tree, is_leaf=lambda x: hasattr(x, "shard_shape")
    )
    for (path, leaf), sharding in zip(flat_shapes, flat_shard):
        if trainable_pred(param_path(path)):
            shard = sharding.shard_shape(tuple(leaf.shape))
            grads += math.prod(shard) * 4  # fp32
    return {"grad_bytes": grads, "moment_bytes": 2 * grads}


def train_fit_report(
    shapes_tree,
    shardings_tree,
    trainable_pred,
    *,
    llama_config,
    batch: int,
    seq: int,
    kv_dtype=None,
    n_model: int = 1,
    hbm_bytes: int = 16 * GIB,
) -> Dict:
    """Per-chip budget for the stage-2 finetune step (BASELINE config 4):
    params + grads + Adam moments (trainables only, runner_base.py-style
    trainable-only optimizer) + remat activation bound."""
    params = tree_bytes_per_chip(shapes_tree, shardings_tree)
    state = train_state_bytes_per_chip(shapes_tree, shardings_tree, trainable_pred)
    act = remat_train_activation_bound(llama_config, batch, seq, n_model)
    total = params + state["grad_bytes"] + state["moment_bytes"] + act
    return {
        "params_bytes": params,
        "grad_bytes": state["grad_bytes"],
        "moment_bytes": state["moment_bytes"],
        "activation_bound_bytes": act,
        "total_bytes": total,
        "hbm_bytes": hbm_bytes,
        "fits": total < hbm_bytes,
        "utilization": total / hbm_bytes,
    }


def fit_report(
    shapes_tree,
    shardings_tree,
    *,
    llama_config=None,
    batch: int = 16,
    max_len: int = 512,
    kv_dtype="int8",
    n_model: int = 1,
    hbm_bytes: int = 16 * GIB,
) -> Dict:
    """Assemble the per-chip budget: params + KV cache + activation bound."""
    params = tree_bytes_per_chip(shapes_tree, shardings_tree)
    kv = (
        kv_cache_bytes_per_chip(llama_config, batch, max_len, kv_dtype, n_model)
        if llama_config is not None
        else 0
    )
    act = (
        prefill_activation_bound(llama_config, batch, max_len, n_model)
        if llama_config is not None
        else 0
    )
    total = params + kv + act
    return {
        "params_bytes": params,
        "kv_bytes": kv,
        "activation_bound_bytes": act,
        "total_bytes": total,
        "hbm_bytes": hbm_bytes,
        "fits": total < hbm_bytes,
        "utilization": total / hbm_bytes,
    }
