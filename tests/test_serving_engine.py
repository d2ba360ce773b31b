"""Continuous-batching engine: transcript identity with greedy_generate.

The engine must be a pure scheduling layer — every request's token stream
must be bit-identical to running generation.greedy_generate on that
request alone (same config/cache dtype), whatever the arrival order, slot
occupancy or slot-reuse history.  That is the whole correctness contract:
per-row frontiers + the position mask make co-residency invisible.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myriad_tpu.generation import (GenerationConfig, greedy_generate,
                                   trim_stop_ids)
from myriad_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from myriad_tpu.serving import ServingEngine

FP32 = dict(dtype=jnp.float32, param_dtype=jnp.float32)


@pytest.fixture(scope="module")
def tiny():
    cfg = LlamaConfig.tiny()
    model = LlamaForCausalLM(cfg, **FP32)
    params = model.init_params(jax.random.PRNGKey(3))
    return model, params


def _prompts(rng, lengths, dim):
    return [jnp.asarray(rng.normal(size=(t, dim)).astype(np.float32) * 0.15)
            for t in lengths]


def _reference(model, params, embeds, cfg, cache_dtype):
    """Per-request greedy_generate transcript, trimmed like the engine."""
    tokens = np.asarray(greedy_generate(
        model, params, embeds[None], config=cfg, cache_dtype=cache_dtype))[0]
    return np.asarray(trim_stop_ids(tokens, cfg), np.int32)


CFG = GenerationConfig(max_new_tokens=10, eos_token_id=-1, stop_single=-1,
                       stop_pair=(-1, -1))


@pytest.mark.parametrize("cache_dtype", [jnp.float32, "int8"])
def test_staggered_arrivals_match_solo_greedy(tiny, cache_dtype):
    """More requests than slots, ragged lengths, arrivals spread across
    ticks: every transcript equals its solo greedy_generate run.  Slots
    get reused (6 requests / 2 slots) including short-after-long, so stale
    KV from the previous occupant is proven mask-dead."""
    model, params = tiny
    rng = np.random.default_rng(0)
    dim = model.config.hidden_size
    lengths = [13, 5, 9, 3, 11, 7]  # short-after-long reuses a dirty slot
    prompts = _prompts(rng, lengths, dim)

    eng = ServingEngine(model, params, slots=2, bucket=64, config=CFG,
                        cache_dtype=cache_dtype, segment=4,
                        admit_widths=(8, 16))
    results = {}
    arrivals = list(enumerate(prompts))
    tick = 0
    while arrivals or eng.pending:
        # two arrivals per tick — admissions interleave with decode
        for _ in range(2):
            if arrivals:
                i, p = arrivals.pop(0)
                eng.submit(p, request_id=i)
        for f in eng.step():
            results[f.request_id] = f.tokens
        tick += 1
        assert tick < 200

    assert sorted(results) == list(range(len(prompts)))
    for i, p in enumerate(prompts):
        ref = _reference(model, params, p, CFG, cache_dtype)
        np.testing.assert_array_equal(results[i], ref, err_msg=f"request {i}")


def test_mixed_admission_while_decoding(tiny):
    """A request admitted while another is mid-decode must not perturb the
    resident row (co-residency invisibility), and vice versa."""
    model, params = tiny
    rng = np.random.default_rng(7)
    dim = model.config.hidden_size
    a, b = _prompts(rng, [10, 4], dim)

    eng = ServingEngine(model, params, slots=2, bucket=64, config=CFG,
                        cache_dtype=jnp.float32, segment=3,
                        admit_widths=(16,))
    eng.submit(a, request_id=0)
    eng.step()  # a is mid-decode (3 of 10 tokens)
    eng.submit(b, request_id=1)
    results = {f.request_id: f.tokens for f in eng.drain()}
    np.testing.assert_array_equal(
        results[0], _reference(model, params, a, CFG, jnp.float32))
    np.testing.assert_array_equal(
        results[1], _reference(model, params, b, CFG, jnp.float32))


def test_stop_token_rows_finish_independently(tiny):
    """Rows finishing on a stop id free their slot and trim correctly."""
    model, params = tiny
    rng = np.random.default_rng(3)
    dim = model.config.hidden_size
    prompts = _prompts(rng, [6, 8, 7], dim)
    # pick real stop ids: find what greedy emits and stop on its 3rd token
    probe_cfg = GenerationConfig(max_new_tokens=6, eos_token_id=-1,
                                 stop_single=-1, stop_pair=(-1, -1))
    probe = np.asarray(greedy_generate(
        model, params, prompts[0][None], config=probe_cfg,
        cache_dtype=jnp.float32))[0]
    stop = int(probe[2])
    cfg = GenerationConfig(max_new_tokens=6, eos_token_id=-1,
                           stop_single=stop, stop_pair=(-1, -1))

    eng = ServingEngine(model, params, slots=3, bucket=64, config=cfg,
                        cache_dtype=jnp.float32, segment=8,
                        admit_widths=(8,))
    for i, p in enumerate(prompts):
        eng.submit(p, request_id=i)
    results = {f.request_id: f.tokens for f in eng.drain()}
    for i, p in enumerate(prompts):
        np.testing.assert_array_equal(
            results[i], _reference(model, params, p, cfg, jnp.float32))
    # the probed row really did stop early
    assert len(results[0]) < cfg.max_new_tokens


def test_submit_validation(tiny):
    model, params = tiny
    dim = model.config.hidden_size
    eng = ServingEngine(model, params, slots=1, bucket=32, config=CFG,
                        cache_dtype=jnp.float32, admit_widths=(8, 16))
    with pytest.raises(ValueError):  # prompt + max_new over the bucket
        eng.submit(np.zeros((30, dim), np.float32))
    with pytest.raises(ValueError):  # over the admission ladder
        eng.submit(np.zeros((20, dim), np.float32))
    assert eng.step() == []  # empty tick is a no-op


def test_submit_group_spill_and_validation(tiny):
    """Device-resident group submission: past max_queued_device_bytes the
    queue spills groups to HOST (bounding HBM held by prompts that cannot
    admit yet — r3 advisor finding) and transcripts stay identical to solo
    greedy; mismatched valid lengths are rejected at submit."""
    model, params = tiny
    rng = np.random.default_rng(7)
    dim = model.config.hidden_size
    lengths = [5, 7, 3, 6, 4, 8]
    prompts = _prompts(rng, lengths, dim)
    width = 8

    def group(idx):  # (n, width, D) device batch + host valid, as the
        n = len(idx)  # adapter's padded embed program produces
        arr = np.zeros((n, width, dim), np.float32)
        for j, i in enumerate(idx):
            arr[j, : lengths[i]] = np.asarray(prompts[i])
        return jnp.asarray(arr), np.asarray([lengths[i] for i in idx])

    eng = ServingEngine(model, params, slots=2, bucket=64, config=CFG,
                        cache_dtype=jnp.float32, segment=4,
                        admit_widths=(8, 16),
                        max_queued_device_bytes=2 * width * dim * 4)
    e0, v0 = group([0, 1])
    e1, v1 = group([2, 3])
    e2, v2 = group([4, 5])
    rids = eng.submit_group(e0, v0)          # fills the device budget
    rids += eng.submit_group(e1, v1)         # over budget -> host spill
    rids += eng.submit_group(e2, v2)
    kinds = [isinstance(b.embeds, np.ndarray) for b in eng._queue]
    assert kinds == [False, True, True], "tail groups must spill to host"

    with pytest.raises(ValueError):  # valid > width
        eng.submit_group(jnp.zeros((1, 8, dim)), np.asarray([9]))
    with pytest.raises(ValueError):  # valid < 1
        eng.submit_group(jnp.zeros((2, 8, dim)), np.asarray([4, 0]))

    results = {f.request_id: f.tokens for f in eng.drain()}
    assert sorted(results) == rids
    for rid, i in zip(rids, range(len(prompts))):
        ref = _reference(model, params, prompts[i], CFG, jnp.float32)
        np.testing.assert_array_equal(results[rid], ref,
                                      err_msg=f"request {i}")


def test_bounded_program_count(tiny):
    """Program count stays bounded by the admission ladder: many requests
    at many lengths compile one prefill per width + one insert trace per
    width + one segment program."""
    model, params = tiny
    rng = np.random.default_rng(5)
    dim = model.config.hidden_size
    eng = ServingEngine(model, params, slots=2, bucket=64, config=CFG,
                        cache_dtype=jnp.float32, segment=16,
                        admit_widths=(8, 16))
    for i, t in enumerate([3, 5, 7, 8, 11, 13, 2, 16]):
        eng.submit(_prompts(rng, [t], dim)[0], request_id=i)
    results = {f.request_id for f in eng.drain()}
    assert results == set(range(8))
    # (width, chunk) programs: widths only from the ladder, chunks <= slots
    assert {w for w, _ in eng._prefill_progs} == {8, 16}
    assert all(n <= 2 for _, n in eng._prefill_progs)
    assert eng.stats["completed"] == 8
    # segment early-exit: total decode steps stay near the useful work
    assert eng.stats["decode_steps"] <= 8 * (CFG.max_new_tokens + 16)


@pytest.mark.parametrize("with_lookup", [False, True])
def test_spec_engine_matches_solo_greedy(tiny, with_lookup):
    """spec_k>0: every transcript still equals solo greedy_generate —
    drafts are proposals, acceptance only changes speed.  With a lookup
    corpus built from the expected outputs, drafts actually hit
    (accepted > 0), proving the fast path is exercised, not bypassed."""
    model, params = tiny
    rng = np.random.default_rng(9)
    dim = model.config.hidden_size
    lengths = [9, 5, 12, 3]
    prompts = _prompts(rng, lengths, dim)
    refs = [_reference(model, params, p, CFG, jnp.float32) for p in prompts]
    lookup = np.concatenate(refs) if with_lookup else None

    eng = ServingEngine(model, params, slots=2, bucket=64, config=CFG,
                        cache_dtype=jnp.float32, segment=3,
                        admit_widths=(8, 16), spec_k=3, lookup_ids=lookup)
    for i, p in enumerate(prompts):
        eng.submit(p, request_id=i)
    results = {f.request_id: f.tokens for f in eng.drain()}
    for i, ref in enumerate(refs):
        np.testing.assert_array_equal(results[i], ref, err_msg=f"request {i}")
    assert eng.stats["spec_drafted"] > 0
    if with_lookup:
        assert eng.stats["spec_accepted"] > 0


def test_spec_engine_slot_reuse_and_stops(tiny):
    """spec with real stop ids + dirty slot reuse: transcripts match the
    solo greedy run and early-stopping rows free their slots."""
    model, params = tiny
    rng = np.random.default_rng(13)
    dim = model.config.hidden_size
    prompts = _prompts(rng, [11, 4, 7], dim)
    probe = np.asarray(greedy_generate(
        model, params, prompts[0][None],
        config=GenerationConfig(max_new_tokens=8, eos_token_id=-1,
                                stop_single=-1, stop_pair=(-1, -1)),
        cache_dtype=jnp.float32))[0]
    cfg = GenerationConfig(max_new_tokens=8, eos_token_id=-1,
                           stop_single=int(probe[3]), stop_pair=(-1, -1))
    eng = ServingEngine(model, params, slots=1, bucket=64, config=cfg,
                        cache_dtype=jnp.float32, segment=4,
                        admit_widths=(16,), spec_k=2)
    for i, p in enumerate(prompts):
        eng.submit(p, request_id=i)
    results = {f.request_id: f.tokens for f in eng.drain()}
    for i, p in enumerate(prompts):
        np.testing.assert_array_equal(
            results[i], _reference(model, params, p, cfg, jnp.float32))
    assert len(results[0]) < cfg.max_new_tokens


@pytest.mark.parametrize("spec_k", [0, 2])
def test_hold_and_continue_multi_turn(tiny, spec_k):
    """Held conversations: turn 2 decodes from the RESIDENT cache (prompt +
    turn-1 raw tokens) extended by only the delta, and must match a full
    greedy run over the concatenated history — while an unrelated request
    co-resides mid-decode.  Released handles free their slot."""
    model, params = tiny
    rng = np.random.default_rng(21)
    dim = model.config.hidden_size
    p1, p2, other = _prompts(rng, [7, 5, 12], dim)

    eng = ServingEngine(model, params, slots=2, bucket=64, config=CFG,
                        cache_dtype=jnp.float32, segment=3,
                        admit_widths=(8, 16), spec_k=spec_k)
    h = eng.submit(p1, hold=True)
    (f1,) = eng.drain()
    assert f1.held and f1.request_id == h
    np.testing.assert_array_equal(
        f1.tokens, _reference(model, params, p1, CFG, jnp.float32))

    # an unrelated request decodes while the turn-2 delta prefills in place
    rid_other = eng.submit(other)
    eng.step()
    rid2 = eng.continue_request(h, p2, hold=True)
    results = {f.request_id: f for f in eng.drain()}

    emb_a1 = np.asarray(model.apply(
        params, jnp.asarray(f1.raw_tokens)[None],
        method=type(model).embed))[0]
    full = jnp.concatenate([p1, jnp.asarray(emb_a1), p2], axis=0)
    np.testing.assert_array_equal(
        results[rid2].tokens,
        _reference(model, params, full, CFG, jnp.float32))
    np.testing.assert_array_equal(
        results[rid_other].tokens,
        _reference(model, params, other, CFG, jnp.float32))

    # turn 3 after a turn-2 hold; then release() must free the slot
    p3 = _prompts(rng, [4], dim)[0]
    rid3 = eng.continue_request(rid2, p3, hold=True)
    (f3,) = eng.drain()
    emb_a2 = np.asarray(model.apply(
        params, jnp.asarray(results[rid2].raw_tokens)[None],
        method=type(model).embed))[0]
    full3 = jnp.concatenate([full, jnp.asarray(emb_a2), p3], axis=0)
    np.testing.assert_array_equal(
        f3.tokens, _reference(model, params, full3, CFG, jnp.float32))
    assert f3.held
    eng.release(rid3)

    with pytest.raises(KeyError):
        eng.continue_request(999, p2)
    # both slots free again: two fresh requests admit simultaneously
    for i, p in enumerate(_prompts(rng, [6, 9], dim)):
        eng.submit(p, request_id=100 + i)
    got = {f.request_id for f in eng.drain()}
    assert got == {100, 101}


def test_spec_stop_inside_accepted_window_frontier_exact(tiny):
    """A stop token inside an ACCEPTED draft window must leave the
    frontier at the emitted end: the resident KV of a held slot has to
    agree with raw_tokens, or the continued turn diverges from the
    full-history reference (r3c review finding)."""
    model, params = tiny
    dim = model.config.hidden_size
    # find a prompt whose greedy stream opens with a non-repeating token:
    # the 1-gram lookup then drafts exactly the greedy continuation, so
    # acceptance outruns the stop we place on the SECOND greedy token
    for seed in range(33, 65):
        rng = np.random.default_rng(seed)
        p1, p2 = _prompts(rng, [9, 5], dim)
        probe = np.asarray(greedy_generate(
            model, params, p1[None], config=CFG, cache_dtype=jnp.float32))[0]
        if probe[0] not in probe[1:6] and len(set(probe[:3].tolist())) == 3:
            break
    else:
        pytest.fail("no seed produced a non-repeating greedy opening")
    cfg = GenerationConfig(max_new_tokens=8, eos_token_id=-1,
                           stop_single=int(probe[1]), stop_pair=(-1, -1))
    eng = ServingEngine(model, params, slots=1, bucket=64, config=cfg,
                        cache_dtype=jnp.float32, segment=4,
                        admit_widths=(8, 16), spec_k=3, lookup_ids=probe)
    h = eng.submit(p1, hold=True)
    (f1,) = eng.drain()
    np.testing.assert_array_equal(f1.raw_tokens, probe[:1])  # stop after 1
    assert eng.stats["spec_accepted"] > 0  # the window really overran it

    rid2 = eng.continue_request(h, p2)
    (f2,) = eng.drain()
    emb_a1 = np.asarray(model.apply(
        params, jnp.asarray(f1.raw_tokens)[None],
        method=type(model).embed))[0]
    full = jnp.concatenate([p1, jnp.asarray(emb_a1), p2], axis=0)
    np.testing.assert_array_equal(
        f2.tokens, _reference(model, params, full, cfg, jnp.float32))


# -- block KV layout (engine.block_size) -------------------------------------

@pytest.mark.parametrize("cache_dtype", [jnp.float32, "int8"])
def test_block_layout_matches_solo_greedy(tiny, cache_dtype):
    """block_size>0: scalar block frontiers + bitmap masks + storage-bound
    causality must be transcript-invisible — every request equals its solo
    greedy_generate run across staggered arrivals, ragged valid lengths
    (storage columns exceed logical positions) and dirty block reuse."""
    model, params = tiny
    rng = np.random.default_rng(11)
    dim = model.config.hidden_size
    lengths = [13, 5, 9, 3, 11, 7, 4, 8]  # ragged: valid < width skew
    prompts = _prompts(rng, lengths, dim)

    eng = ServingEngine(model, params, slots=4, bucket=64, config=CFG,
                        cache_dtype=cache_dtype, segment=4,
                        admit_widths=(16,), block_size=2)
    results = {}
    arrivals = list(enumerate(prompts))
    tick = 0
    while arrivals or eng.pending:
        for _ in range(3):  # 3 per tick: chunks split across blocks
            if arrivals:
                i, p = arrivals.pop(0)
                eng.submit(p, request_id=i)
        for f in eng.step():
            results[f.request_id] = f.tokens
        tick += 1
        assert tick < 200
    assert sorted(results) == list(range(len(prompts)))
    for i, p in enumerate(prompts):
        ref = _reference(model, params, p, CFG, cache_dtype)
        np.testing.assert_array_equal(results[i], ref, err_msg=f"request {i}")


def test_block_layout_early_stop_and_partial_blocks(tiny):
    """Early-stopping rows inside a block: the block frontier keeps
    advancing for live mates, the stopped row's junk writes stay
    mask-dead, and a partially filled block admits nothing until it
    frees as a whole."""
    model, params = tiny
    rng = np.random.default_rng(3)
    dim = model.config.hidden_size
    prompts = _prompts(rng, [6, 8, 7], dim)
    probe = np.asarray(greedy_generate(
        model, params, prompts[0][None],
        config=GenerationConfig(max_new_tokens=6, eos_token_id=-1,
                                stop_single=-1, stop_pair=(-1, -1)),
        cache_dtype=jnp.float32))[0]
    cfg = GenerationConfig(max_new_tokens=6, eos_token_id=-1,
                           stop_single=int(probe[2]), stop_pair=(-1, -1))

    eng = ServingEngine(model, params, slots=4, bucket=64, config=cfg,
                        cache_dtype=jnp.float32, segment=8,
                        admit_widths=(8,), block_size=2)
    eng.submit(prompts[0], request_id=0)
    eng.submit(prompts[1], request_id=1)
    # 2 rows -> 1 block; submit a third while the first block decodes:
    # it must land in the SECOND block, never the first's free row
    results = {f.request_id: f.tokens for f in eng.step()}
    eng.submit(prompts[2], request_id=2)
    results.update({f.request_id: f.tokens for f in eng.drain()})
    for i, p in enumerate(prompts):
        np.testing.assert_array_equal(
            results[i], _reference(model, params, p, cfg, jnp.float32),
            err_msg=f"request {i}")
    assert len(results[0]) < cfg.max_new_tokens  # row 0 really stopped early

    # partial-block pinning: 1 row in a 2-slot block blocks its mate...
    eng2 = ServingEngine(model, params, slots=2, bucket=64, config=cfg,
                         cache_dtype=jnp.float32, segment=2,
                         admit_widths=(8,), block_size=2)
    eng2.submit(prompts[1], request_id=0)
    eng2.step()
    assert eng2._slot_blocked[1] and eng2.free_slot_count == 0
    eng2.submit(prompts[2], request_id=1)  # queues; cannot admit yet
    results2 = {f.request_id: f.tokens for f in eng2.drain()}
    # ...and unpins when the block frees (lazily, at the next allocation)
    assert eng2.free_slot_count == 2 and not any(eng2._slot_blocked)
    for rid, i in [(0, 1), (1, 2)]:
        np.testing.assert_array_equal(
            results2[rid], _reference(model, params, prompts[i], cfg,
                                      jnp.float32))


def test_block_layout_validation(tiny):
    model, params = tiny
    dim = model.config.hidden_size
    with pytest.raises(ValueError):  # indivisible block size
        ServingEngine(model, params, slots=3, bucket=64, config=CFG,
                      block_size=2)
    with pytest.raises(ValueError):  # spec needs per-row frontiers
        ServingEngine(model, params, slots=4, bucket=64, config=CFG,
                      block_size=2, spec_k=2)
    eng = ServingEngine(model, params, slots=4, bucket=24, config=CFG,
                        cache_dtype=jnp.float32, admit_widths=(8, 16),
                        block_size=2)
    with pytest.raises(ValueError):  # holds need per-row frontiers
        eng.submit(np.zeros((4, dim), np.float32), hold=True)
    with pytest.raises(ValueError):  # capacity charged at PADDED width:
        eng.submit(np.zeros((9, dim), np.float32))  # 9 -> 16, +10+1 > 24
    assert eng.submit(np.zeros((8, dim), np.float32)) is not None  # 8+11<=24
    with pytest.raises(ValueError):  # backstop behind the submit guard:
        eng._continue_prog(8, 1)     # cont drops store/bitmap in block mode


def test_block_layout_coordinated_formats(tiny, monkeypatch):
    """The TPU-gated layout coordination (_coordinate_state_layouts),
    forced on for CPU: the AUTO-layout discovery compile, the AOT
    executable as the segment program, the state materialized via
    out_shardings, and the format-pinned insert program must all stay
    transcript-invisible.  Regression for the r4 call-time failure: a jit
    carrying AUTO in_shardings cannot be CALLED with concrete arrays, so
    the segment must run the compiled executable itself."""
    monkeypatch.setattr(ServingEngine, "_layout_coordination",
                        lambda self: True)
    model, params = tiny
    rng = np.random.default_rng(23)
    dim = model.config.hidden_size
    prompts = _prompts(rng, [13, 5, 9, 3, 11, 7], dim)
    eng = ServingEngine(model, params, slots=4, bucket=64, config=CFG,
                        cache_dtype="int8", segment=4, admit_widths=(16,),
                        block_size=2)
    assert eng._state_formats is not None  # the coordination actually ran
    results = {}
    for i, p in enumerate(prompts):
        eng.submit(p, request_id=i)
    tick = 0
    while eng.pending:
        for f in eng.step():
            results[f.request_id] = f.tokens
        tick += 1
        assert tick < 100
    assert sorted(results) == list(range(len(prompts)))
    for i, p in enumerate(prompts):
        ref = _reference(model, params, p, CFG, "int8")
        np.testing.assert_array_equal(results[i], ref, err_msg=f"request {i}")
