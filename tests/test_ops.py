"""Pallas kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from myriad_tpu.ops.attention import _xla_mha, mha
from myriad_tpu.ops.decode_attention import decode_attention


def test_decode_attention_matches_xla(rng):
    b, h, t, d = 2, 4, 200, 64  # t, d deliberately unaligned (padding path)
    q = jnp.asarray(rng.normal(size=(b, h, 1, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    mask = jnp.where(
        jnp.arange(t)[None, None, None, :] < 150, 0.0, -1e9
    ).astype(jnp.float32) * jnp.ones((b, 1, 1, t))
    ref = _xla_mha(q, k, v, mask, d**-0.5)
    out = decode_attention(q, k, v, mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_decode_attention_no_mask(rng):
    b, h, t, d = 1, 2, 128, 128
    q = jnp.asarray(rng.normal(size=(b, h, 1, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    ref = _xla_mha(q, k, v, None, d**-0.5)
    out = decode_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_decode_attention_int8_kv(rng):
    """int8 KV + per-position scales folded in-kernel == the XLA
    scale-folded path (the long-context conversation regime)."""
    from myriad_tpu.models.llama import quantize_kv

    b, h, t, d = 2, 3, 200, 64
    q = jnp.asarray(rng.normal(size=(b, h, 1, d)), jnp.float32)
    kf = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    vf = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    k8, ks = quantize_kv(kf)
    v8, vs = quantize_kv(vf)
    mask = jnp.where(
        jnp.arange(t)[None, None, None, :] < 150, 0.0, -1e9
    ).astype(jnp.float32) * jnp.ones((b, 1, 1, t))
    ref = _xla_mha(q, k8, v8, mask, d**-0.5, ks, vs)
    out = decode_attention(q, k8, v8, mask=mask, interpret=True,
                           k_scale=ks, v_scale=vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_mha_forced_pallas_routes_int8_kv(rng, monkeypatch):
    """MYRIAD_FORCE_PALLAS routes a quantized-KV decode step through the
    kernel (interpret on CPU) and matches the XLA scale-folded path."""
    from myriad_tpu.models.llama import quantize_kv

    monkeypatch.setenv("MYRIAD_FORCE_PALLAS", "1")
    b, h, t, d = 1, 2, 64, 32
    q = jnp.asarray(rng.normal(size=(b, h, 1, d)), jnp.float32)
    kf = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    vf = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    k8, ks = quantize_kv(kf)
    v8, vs = quantize_kv(vf)
    ref = _xla_mha(q, k8, v8, None, d**-0.5, ks, vs)
    out = mha(q, k8, v8, k_scale=ks, v_scale=vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_mha_forced_pallas_warns_on_multitoken(rng, monkeypatch):
    """Forcing Pallas with tq>1 falls back to XLA — loudly, so a dispatch
    test feeding a multi-token chunk can't silently validate the wrong
    path (ADVICE r2 #5)."""
    import warnings

    monkeypatch.setenv("MYRIAD_FORCE_PALLAS", "1")
    q = jnp.asarray(rng.normal(size=(1, 2, 4, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, 8, 16)), jnp.float32)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = mha(q, k, k)
    assert out.shape == (1, 2, 4, 16)
    assert any("tq=4" in str(w.message) for w in caught), [
        str(w.message) for w in caught
    ]


def test_mha_dispatch_cpu_uses_xla(rng):
    # on CPU the dispatcher must not try to compile the TPU kernel
    q = jnp.asarray(rng.normal(size=(1, 2, 4, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, 4, 16)), jnp.float32)
    out = mha(q, k, k)
    assert out.shape == (1, 2, 4, 16)
