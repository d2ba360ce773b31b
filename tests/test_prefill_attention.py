"""Pallas prefill attention (VMEM-resident scores) vs the XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myriad_tpu.ops.attention import _xla_mha
from myriad_tpu.ops.prefill_attention import prefill_attention


def _xla_ref(q, k, v, positions, scale, k_scale=None, v_scale=None):
    kv_len = k.shape[2]
    k_pos = jnp.arange(kv_len, dtype=jnp.int32)
    allowed = k_pos[None, None, None, :] <= positions[:, None, :, None]
    mask = jnp.where(allowed, 0.0, -1e9).astype(jnp.float32)
    return _xla_mha(q, k, v, mask, scale, k_scale, v_scale)


@pytest.mark.parametrize("tq,tk", [(16, 32), (13, 48)])
def test_prefill_attention_matches_xla(rng, tq, tk):
    b, h, d = 2, 3, 16
    q = jnp.asarray(rng.normal(size=(b, h, tq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, tk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, tk, d)).astype(np.float32))
    positions = jnp.broadcast_to(jnp.arange(tq, dtype=jnp.int32)[None], (b, tq))
    ref = _xla_ref(q, k, v, positions, d**-0.5)
    out = prefill_attention(q, k, v, positions, scale=d**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("tq,h", [(4, 8), (5, 4), (3, 32)])
def test_prefill_attention_head_blocked_small_tq(rng, tq, h, monkeypatch):
    """Tiny-tq feeds run the head-blocked kernel (several heads per
    program, _head_block) and still match XLA — including the int8-KV
    scale folding.  The production dispatch keeps XLA below tq=16
    (measured slower, supported() docstring); MYRIAD_PREFILL_MIN_TQ
    re-opens the regime for re-measurement."""
    from myriad_tpu.models.llama import quantize_kv
    from myriad_tpu.ops.prefill_attention import _head_block, supported

    assert not supported(tq, 64, 16)  # default gate keeps XLA here
    monkeypatch.setenv("MYRIAD_PREFILL_MIN_TQ", "2")
    assert supported(tq, 64, 16)
    assert _head_block(tq, h) > 1
    b, tk, d = 2, 64, 16
    q = jnp.asarray(rng.normal(size=(b, h, tq, d)).astype(np.float32))
    kf = jnp.asarray(rng.normal(size=(b, h, tk, d)).astype(np.float32))
    vf = jnp.asarray(rng.normal(size=(b, h, tk, d)).astype(np.float32))
    positions = 10 + jnp.broadcast_to(
        jnp.arange(tq, dtype=jnp.int32)[None], (b, tq))
    ref = _xla_ref(q, kf, vf, positions, d**-0.5)
    out = prefill_attention(q, kf, vf, positions, scale=d**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    k8, ks = quantize_kv(kf)
    v8, vs = quantize_kv(vf)
    ref8 = _xla_ref(q, k8, v8, positions, d**-0.5, ks, vs)
    out8 = prefill_attention(q, k8, v8, positions, scale=d**-0.5,
                             k_scale=ks, v_scale=vs)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(ref8),
                               rtol=2e-2, atol=2e-2)


def test_prefill_attention_int8_kv(rng):
    """int8 KV + per-position scales folded in-kernel == the XLA
    scale-folded path."""
    from myriad_tpu.models.llama import quantize_kv

    b, h, tq, tk, d = 2, 2, 12, 32, 16
    q = jnp.asarray(rng.normal(size=(b, h, tq, d)).astype(np.float32))
    kf = jnp.asarray(rng.normal(size=(b, h, tk, d)).astype(np.float32))
    vf = jnp.asarray(rng.normal(size=(b, h, tk, d)).astype(np.float32))
    k8, ks = quantize_kv(kf)
    v8, vs = quantize_kv(vf)
    positions = jnp.broadcast_to(jnp.arange(tq, dtype=jnp.int32)[None], (b, tq))
    ref = _xla_ref(q, k8, v8, positions, d**-0.5, ks, vs)
    out = prefill_attention(q, k8, v8, positions, scale=d**-0.5,
                            k_scale=ks, v_scale=vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_prefill_attention_sharded_matches_unsharded(rng):
    """custom_partitioning: under a ('data','model') mesh with heads
    sharded, each shard runs the kernel locally (no gathers) and the
    result equals the unsharded one."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from myriad_tpu.models.llama import quantize_kv
    from myriad_tpu.parallel.mesh import make_mesh

    b, h, tq, tk, d = 4, 4, 16, 32, 16
    q = jnp.asarray(rng.normal(size=(b, h, tq, d)).astype(np.float32))
    kf = jnp.asarray(rng.normal(size=(b, h, tk, d)).astype(np.float32))
    vf = jnp.asarray(rng.normal(size=(b, h, tk, d)).astype(np.float32))
    k8, ks = quantize_kv(kf)
    v8, vs = quantize_kv(vf)
    positions = jnp.broadcast_to(jnp.arange(tq, dtype=jnp.int32)[None], (b, tq))
    ref = np.asarray(prefill_attention(q, k8, v8, positions, scale=d**-0.5,
                                       k_scale=ks, v_scale=vs))

    mesh = make_mesh(n_model=2)
    sh4 = NamedSharding(mesh, P("data", "model", None, None))
    qs = jax.device_put(q, sh4)
    k8s = jax.device_put(k8, sh4)
    v8s = jax.device_put(v8, sh4)
    kss = jax.device_put(ks, sh4)
    vss = jax.device_put(vs, sh4)
    ps = jax.device_put(positions, NamedSharding(mesh, P("data", None)))
    out = np.asarray(prefill_attention(qs, k8s, v8s, ps, scale=d**-0.5,
                                       k_scale=kss, v_scale=vss))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_prefill_attention_offset_positions(rng):
    """Nonzero start offsets (chunked/speculative feeds): only cache slots
    at k_pos <= position contribute."""
    b, h, tq, tk, d = 1, 2, 8, 64, 16
    q = jnp.asarray(rng.normal(size=(b, h, tq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, tk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, tk, d)).astype(np.float32))
    positions = 20 + jnp.broadcast_to(
        jnp.arange(tq, dtype=jnp.int32)[None], (b, tq))
    ref = _xla_ref(q, k, v, positions, d**-0.5)
    out = prefill_attention(q, k, v, positions, scale=d**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
