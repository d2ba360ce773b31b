"""MyriadServing front-end: engine transcripts match Myriad.generate."""

import numpy as np
import pytest

from myriad_tpu.models.layers import Policy
from myriad_tpu.models.myriad import Myriad, MyriadArch
from myriad_tpu.serving.myriad_adapter import MyriadServing


def _sample(seed, img=28, question="find out if there are defects."):
    rng = np.random.default_rng(seed)
    return {
        "image": rng.normal(size=(1, img, img, 3)).astype(np.float32),
        "scene": ["bottle"],
        "question": [f"<Img><ImageHere></Img>{question}"],
        "question2": [f"<Img><ImageHere></Img>{question}"],
        "question3": [f"<Img><ImageHere></Img>{question}"],
        "img_path": ["mvtec/bottle/train/good/000.png"],
    }


@pytest.fixture(scope="module")
def myriad_tiny():
    return Myriad(arch=MyriadArch.tiny(), use_ve=False, policy=Policy.fp32(),
                  max_txt_len=24, end_sym="###")


def _trim(row, cfg):
    from myriad_tpu.generation import trim_stop_ids

    return np.asarray(trim_stop_ids(row, cfg), np.int32)


def test_adapter_matches_generate(myriad_tiny):
    """Requests with different images and ragged questions, 3 requests on
    2 slots: each transcript equals Myriad.generate on that sample alone
    (same greedy path, stop ids and KV dtype)."""
    m = myriad_tiny
    samples = [
        _sample(0),
        _sample(1, question="is there an anomaly present in this image?"),
        _sample(2, question="defects?"),
    ]
    serving = MyriadServing(m, slots=2, segment=4, max_new_tokens=6,
                            admit_widths=(160, 256))
    ids = [serving.submit(s) for s in samples]
    results = {r["request_id"]: r for r in serving.drain()}
    assert sorted(results) == sorted(ids)

    for rid, s in zip(ids, samples):
        ref = m.generate(s, max_new_tokens=6)
        want = _trim(np.asarray(ref["token_ids"])[0], serving.cfg)
        np.testing.assert_array_equal(results[rid]["token_ids"], want)
        assert isinstance(results[rid]["text"], str)
        assert results[rid]["scene"] == "bottle"
    assert serving.stats["completed"] == 3


def test_adapter_spec_matches_generate(myriad_tiny):
    """spec_k>0 at the adapter level: the shared prompt-lookup corpus is
    installed from the first request and transcripts still match
    Myriad.generate exactly."""
    m = myriad_tiny
    samples = [_sample(5), _sample(6), _sample(7)]
    serving = MyriadServing(m, slots=2, segment=3, max_new_tokens=6,
                            admit_widths=(160, 256), spec_k=2)
    ids = [serving.submit(s) for s in samples]
    results = {r["request_id"]: r for r in serving.drain()}
    for rid, s in zip(ids, samples):
        ref = m.generate(s, max_new_tokens=6)
        want = _trim(np.asarray(ref["token_ids"])[0], serving.cfg)
        np.testing.assert_array_equal(results[rid]["token_ids"], want)
    assert serving.stats["spec_drafted"] > 0


@pytest.mark.parametrize("lazy", [False, True])
def test_adapter_submit_batch_groups(myriad_tiny, lazy):
    """submit_batch (the probe's path): same-question runs share one embed
    program call; lazy=True keeps groups HOST-side until just ahead of
    admission (the r4 burst-OOM fix) with ids reserved at arrival.  Both
    modes must produce transcripts identical to solo Myriad.generate."""
    m = myriad_tiny
    q2 = "is there an anomaly present in this image?"
    samples = [_sample(20), _sample(21), _sample(22, question=q2),
               _sample(23, question=q2), _sample(24), _sample(25)]
    serving = MyriadServing(m, slots=2, segment=4, max_new_tokens=6,
                            admit_widths=(160, 256))
    ids = serving.submit_batch(samples, max_group=2, lazy=lazy)
    assert len(ids) == len(samples)
    if lazy:
        # groups beyond the admission lookahead wait host-side
        assert serving._host_queue, "burst should not embed everything"
        assert serving.engine.queued_rows <= serving.engine.free_slot_count + 2
        assert serving.pending == len(samples)
    results = {r["request_id"]: r for r in serving.drain()}
    assert sorted(results) == sorted(ids)
    assert not serving._host_queue
    for rid, s in zip(ids, samples):
        ref = m.generate(s, max_new_tokens=6)
        want = _trim(np.asarray(ref["token_ids"])[0], serving.cfg)
        np.testing.assert_array_equal(results[rid]["token_ids"], want,
                                      err_msg=f"request {rid} (lazy={lazy})")


def test_adapter_multi_turn_chat(myriad_tiny):
    """Text-level turns on held conversations: turn-2 answers must equal a
    fresh engine request whose prompt is the full concatenated history
    (image prompt + raw turn-1 tokens + turn text)."""
    m = myriad_tiny
    serving = MyriadServing(m, slots=2, segment=4, max_new_tokens=5,
                            admit_widths=(160, 256), bucket=512)
    h1 = serving.submit_held(_sample(11))
    h2 = serving.submit_held(_sample(12))
    first = {r["request_id"]: r for r in serving.drain()}
    assert all(r["held"] for r in first.values())

    turn = "###Human: does the defect affect function?###Assistant: "
    t1 = serving.continue_request(h1, turn, hold=False)
    t2 = serving.continue_request(h2, turn, hold=False)
    second = {r["request_id"]: r for r in serving.drain()}
    assert sorted(second) == sorted([t1, t2])
    assert not any(r["held"] for r in second.values())
    assert second[t1]["scene"] == "bottle"  # meta survives the held turn

    # reference: replay conversation h1 as one flat prompt on the engine
    import jax.numpy as jnp

    from myriad_tpu.models.myriad import MyriadModule

    s = _sample(11)
    image, question, _, maps, _ = m.prepare_sample(s, 1, training=False)
    before, after = m.split_prompt(question)
    args = (m.params, jnp.asarray(image), maps, jnp.asarray(before),
            jnp.asarray(after))
    fn, emb_meta = serving._embed_prog(
        (image.shape, np.asarray(image).dtype.str, before.shape, after.shape),
        args)
    emb = fn(*args)[:, : emb_meta["t"]]  # drop the ladder pad
    eng = serving.engine
    f1_raw = first[h1]["raw_tokens"]  # the KV-resident emitted stream
    tok = m.llama_tokenizer(turn, add_special_tokens=False)["input_ids"]
    tok = tok[0] if tok and isinstance(tok[0], list) else tok
    ans_emb = eng.model.apply(eng.params, jnp.asarray(f1_raw, jnp.int32)[None],
                              method=type(eng.model).embed)[0]
    turn_emb = eng.model.apply(eng.params, jnp.asarray(tok, jnp.int32)[None],
                               method=type(eng.model).embed)[0]
    flat = np.concatenate([np.asarray(emb)[0], np.asarray(ans_emb),
                           np.asarray(turn_emb)])
    rid_ref = eng.submit(flat)
    (ref,) = eng.drain()
    assert ref.request_id == rid_ref
    np.testing.assert_array_equal(second[t1]["token_ids"], ref.tokens)
