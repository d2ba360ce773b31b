"""LR schedules and optimizer factory.

Reference semantics (minigpt4/common/optims.py:13-133): per-step LR writes
with linear warmup then cosine (or stepped) decay; AdamW with weight decay
skipped for 1-D params (bias/LayerNorm — reference runner_base.py:105-139).
Here schedules are pure ``step -> lr`` callables fed to optax, so the whole
update runs inside the jitted train step.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax.numpy as jnp
import optax

from myriad_tpu.common.registry import registry

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


@registry.register_lr_scheduler("linear_warmup_cosine_lr")
def linear_warmup_cosine_lr(
    *,
    init_lr: float,
    min_lr: float,
    max_epoch: int,
    iters_per_epoch: int,
    warmup_steps: int = 0,
    warmup_start_lr: float = -1.0,
    **_unused,
) -> Schedule:
    """Linear warmup to ``init_lr`` then cosine decay to ``min_lr``.

    Matches LinearWarmupCosineLRScheduler.step (optims.py:79-96): warmup is
    linear over ``warmup_steps``; afterwards
    ``lr = (init_lr-min_lr) * 0.5*(1+cos(pi*t/T)) + min_lr`` with
    ``T = max_epoch*iters_per_epoch`` and t the global step.
    """
    warmup_start = warmup_start_lr if warmup_start_lr >= 0 else init_lr
    total = max(max_epoch * iters_per_epoch, 1)

    def schedule(step: jnp.ndarray) -> jnp.ndarray:
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.minimum(
            init_lr,
            warmup_start + (init_lr - warmup_start) * step / max(warmup_steps, 1),
        )
        cos = (init_lr - min_lr) * 0.5 * (1.0 + jnp.cos(math.pi * step / total)) + min_lr
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


@registry.register_lr_scheduler("linear_warmup_step_lr")
def linear_warmup_step_lr(
    *,
    init_lr: float,
    min_lr: float,
    iters_per_epoch: int,
    decay_rate: float = 1.0,
    warmup_steps: int = 0,
    warmup_start_lr: float = -1.0,
    **_unused,
) -> Schedule:
    """Warmup during epoch 0, then ``init_lr * decay_rate**epoch`` (>= min_lr).

    Matches LinearWarmupStepLRScheduler.step (optims.py:37-52).
    """
    warmup_start = warmup_start_lr if warmup_start_lr >= 0 else init_lr

    def schedule(step: jnp.ndarray) -> jnp.ndarray:
        step = jnp.asarray(step, jnp.float32)
        epoch = jnp.floor(step / max(iters_per_epoch, 1))
        in_epoch = step - epoch * iters_per_epoch
        warm = jnp.minimum(
            init_lr,
            warmup_start + (init_lr - warmup_start) * in_epoch / max(warmup_steps, 1),
        )
        decayed = jnp.maximum(min_lr, init_lr * jnp.power(decay_rate, epoch))
        return jnp.where(epoch < 1, warm, decayed)

    return schedule


def build_schedule(name: str, **kwargs) -> Schedule:
    return registry.get_lr_scheduler_class(name)(**kwargs)


def _decay_mask(params) -> object:
    """True for params that receive weight decay: ndim >= 2.

    The reference excludes biases and norm scales by name
    (runner_base.py:116-124); dimensionality captures the same split for our
    modules (kernels/embeddings are >=2-D, biases and LN scales are 1-D).
    """
    import jax

    return jax.tree_util.tree_map(lambda p: p.ndim >= 2, params)


def make_optimizer(
    schedule: Schedule,
    *,
    weight_decay: float = 0.05,
    beta1: float = 0.9,
    beta2: float = 0.999,
    max_grad_norm: Optional[float] = None,
    accum_grad_iters: int = 1,
    mu_dtype=None,
) -> optax.GradientTransformation:
    """AdamW over the *trainable* subtree with decay-mask + optional accum.

    The trainable/frozen split itself happens upstream: the runner passes
    only the trainable param subtree here, mirroring the reference's
    requires_grad filtering (runner_base.py:110-115).

    ``mu_dtype`` ('bfloat16' to halve the first-moment buffers): the HBM
    knob that buys back the +131M-param lm_head readout's optimizer state
    on one chip (run cfg ``optimizer_mu_dtype``).  Second moments stay
    fp32 (they span orders of magnitude; bf16 m is standard practice).
    """
    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(
        optax.adamw(
            learning_rate=schedule,
            b1=beta1,
            b2=beta2,
            weight_decay=weight_decay,
            mask=_decay_mask,
            mu_dtype=mu_dtype,
        )
    )
    tx = optax.chain(*chain)
    if accum_grad_iters > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_grad_iters)
    return tx
