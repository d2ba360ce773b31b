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


def test_decode_rows_matches_xla(rng):
    """Row-grid kernel (all heads per program) == XLA, bf16-style fp32 KV."""
    from myriad_tpu.ops.decode_attention import decode_attention_rows

    b, h, t, d = 3, 4, 96, 128  # t 32-aligned, d 128-aligned (no-pad contract)
    q = jnp.asarray(rng.normal(size=(b, h, 1, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    mask = jnp.where(
        jnp.arange(t)[None, None, None, :] < 70, 0.0, -1e9
    ).astype(jnp.float32) * jnp.ones((b, 1, 1, t))
    ref = _xla_mha(q, k, v, mask, d**-0.5)
    out = decode_attention_rows(q, k, v, mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_decode_rows_int8_kv(rng):
    """Row-grid kernel with int8 KV + folded per-position scales == XLA."""
    from myriad_tpu.models.llama import quantize_kv
    from myriad_tpu.ops.decode_attention import decode_attention_rows

    b, h, t, d = 2, 3, 64, 128
    q = jnp.asarray(rng.normal(size=(b, h, 1, d)), jnp.float32)
    kf = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    vf = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    k8, ks = quantize_kv(kf)
    v8, vs = quantize_kv(vf)
    mask = jnp.where(
        jnp.arange(t)[None, None, None, :] < 41, 0.0, -1e9
    ).astype(jnp.float32) * jnp.ones((b, 1, 1, t))
    ref = _xla_mha(q, k8, v8, mask, d**-0.5, ks, vs)
    out = decode_attention_rows(q, k8, v8, mask=mask, interpret=True,
                                k_scale=ks, v_scale=vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_rows_supported_gate():
    from myriad_tpu.ops.decode_attention import rows_supported

    assert rows_supported(48, 32, 416, 128)        # the b48 serving shape
    assert not rows_supported(48, 32, 400, 128)    # unaligned bucket
    assert not rows_supported(48, 32, 416, 64)     # unaligned head dim
    assert not rows_supported(1, 32, 4096, 128)    # K+V blocks exceed VMEM
    # the gate sizes blocks at the cache's ACTUAL width: a bf16 cache
    # doubles block bytes, so shapes in (1.5M, 3M] elements pass at int8
    # but must fail at bf16 (h*t*d = 32*608*128 ≈ 2.4M)
    import jax.numpy as jnp
    assert rows_supported(8, 32, 608, 128, kv_dtype=jnp.int8)
    assert not rows_supported(8, 32, 608, 128, kv_dtype=jnp.bfloat16)


def test_mha_decode_attn_row_env_routes(rng, monkeypatch):
    """MYRIAD_DECODE_ATTN=row routes an aligned decode step through the
    row-grid kernel (interpret on CPU) and matches the XLA path."""
    from myriad_tpu.models.llama import quantize_kv

    monkeypatch.setenv("MYRIAD_DECODE_ATTN", "row")
    b, h, t, d = 2, 2, 64, 128
    q = jnp.asarray(rng.normal(size=(b, h, 1, d)), jnp.float32)
    kf = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    vf = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    k8, ks = quantize_kv(kf)
    v8, vs = quantize_kv(vf)
    ref = _xla_mha(q, k8, v8, None, d**-0.5, ks, vs)
    out = mha(q, k8, v8, k_scale=ks, v_scale=vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_decode_rows_sharded_matches_unsharded(rng):
    """custom_partitioning: under a ('data','model') mesh with heads
    sharded the row kernel runs per-shard on its (B_loc, H_loc) block
    (head loop = local head count) and matches the unsharded result."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from myriad_tpu.models.llama import quantize_kv
    from myriad_tpu.ops.decode_attention import decode_attention_rows
    from myriad_tpu.parallel.mesh import make_mesh

    b, h, t, d = 4, 4, 64, 128
    q = jnp.asarray(rng.normal(size=(b, h, 1, d)), jnp.float32)
    kf = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    vf = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    k8, ks = quantize_kv(kf)
    v8, vs = quantize_kv(vf)
    mask = jnp.where(
        jnp.arange(t)[None, None, None, :] < 50, 0.0, -1e9
    ).astype(jnp.float32) * jnp.ones((b, 1, 1, t))
    ref = np.asarray(decode_attention_rows(q, k8, v8, mask=mask,
                                           k_scale=ks, v_scale=vs))

    mesh = make_mesh(n_model=2)
    sh4 = NamedSharding(mesh, P("data", "model", None, None))
    out = np.asarray(decode_attention_rows(
        jax.device_put(q, sh4), jax.device_put(k8, sh4),
        jax.device_put(v8, sh4),
        mask=jax.device_put(mask, NamedSharding(mesh, P("data", None, None, None))),
        k_scale=jax.device_put(ks, sh4), v_scale=jax.device_put(vs, sh4)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


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


# -- kv_write: per-row-frontier cache writes ---------------------------------

def test_kv_write_impls_agree(rng):
    from myriad_tpu.ops import kv_write

    b, h, T, d = 5, 4, 32, 16
    for t in (1, 4):
        for dtype in (jnp.int8, jnp.bfloat16):
            buf = jnp.asarray(rng.integers(-100, 100, (b, h, T, d)), dtype)
            upd = jnp.asarray(rng.integers(-100, 100, (b, h, t, d)), dtype)
            # 29/31 exercise the dus start clamp; 0 the left edge
            idx = jnp.asarray([0, 7, 29, 15, 31], jnp.int32)
            ref = kv_write.kv_cache_write(buf, upd, idx, impl="vmap")
            for impl in ("scatter", "pallas_interpret"):
                out = kv_write.kv_cache_write(buf, upd, idx, impl=impl)
                np.testing.assert_array_equal(
                    np.asarray(out), np.asarray(ref),
                    err_msg=f"impl={impl} t={t} dtype={dtype}")


def test_kv_write_untouched_rows_preserved(rng):
    from myriad_tpu.ops import kv_write

    b, h, T, d = 3, 2, 16, 8
    buf = jnp.asarray(rng.integers(-100, 100, (b, h, T, d)), jnp.int8)
    upd = jnp.asarray(rng.integers(-100, 100, (b, h, 1, d)), jnp.int8)
    idx = jnp.asarray([2, 9, 14], jnp.int32)
    out = np.asarray(kv_write.kv_cache_write(buf, upd, idx,
                                             impl="pallas_interpret"))
    ref = np.asarray(buf).copy()
    for r, i in enumerate([2, 9, 14]):
        ref[r, :, i, :] = np.asarray(upd)[r, :, 0, :]
    np.testing.assert_array_equal(out, ref)


def test_kv_write_env_override(rng, monkeypatch):
    from myriad_tpu.ops import kv_write

    monkeypatch.setenv("MYRIAD_KV_WRITE", "scatter")
    assert kv_write.default_impl(128) == "scatter"
    # forced pallas must NOT capture the 1-lane quant-scale writes: the
    # (.., 1) block can't satisfy Mosaic's divisibility rule (sweep_r4c)
    monkeypatch.setenv("MYRIAD_KV_WRITE", "pallas")
    assert kv_write.default_impl(1) == "vmap"
    assert kv_write.default_impl(128) == "pallas"
    monkeypatch.delenv("MYRIAD_KV_WRITE")
    assert kv_write.default_impl(1) == "vmap"  # scales stay on vmap


def test_kv_write_explicit_pallas_narrow_falls_back(rng):
    """A config-pinned impl='pallas' on a (B,H,t,1) scale buffer must route
    to vmap instead of failing Mosaic lowering."""
    from myriad_tpu.ops import kv_write

    b, h, T = 3, 2, 16
    buf = jnp.asarray(rng.standard_normal((b, h, T, 1)), jnp.float32)
    upd = jnp.asarray(rng.standard_normal((b, h, 1, 1)), jnp.float32)
    idx = jnp.asarray([2, 9, 14], jnp.int32)
    out = kv_write.kv_cache_write(buf, upd, idx, impl="pallas")
    ref = kv_write.kv_cache_write(buf, upd, idx, impl="vmap")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
