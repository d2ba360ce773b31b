"""Chat / conversation API tests."""

import numpy as np
import pytest

from myriad_tpu.conversation import CONV_VISION, Chat
from myriad_tpu.models.layers import Policy
from myriad_tpu.models.myriad import Myriad, MyriadArch
from myriad_tpu.processors.blip_processors import LocImageTrainProcessor


def test_conversation_prompt_state_machine():
    conv = CONV_VISION.copy()
    conv.append_message(conv.roles[0], "<Img><ImageHere></Img> any defects?")
    conv.append_message(conv.roles[1], None)
    prompt = conv.get_prompt()
    assert prompt.startswith("Give the following image")
    assert "###Human: <Img><ImageHere></Img> any defects?###Assistant:" in prompt
    # copy is independent
    c2 = conv.copy()
    c2.append_message(conv.roles[0], "more")
    assert len(conv.messages) == 2 and len(c2.messages) == 3


def test_chat_roundtrip():
    model = Myriad(arch=MyriadArch.tiny(), use_ve=False, policy=Policy.fp32(),
                   max_txt_len=16, end_sym="###")
    chat = Chat(model, LocImageTrainProcessor(identity=True))
    conv = CONV_VISION.copy()
    img_list = []
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (28, 28, 3), dtype=np.uint8)
    msg = chat.upload_img(image, conv, img_list)
    assert msg == "Received."
    assert len(img_list) == 1 and img_list[0].shape[0] == 1
    chat.ask("Is there any defect?", conv)
    # image message was extended with the question
    assert conv.messages[-1][1].endswith("Is there any defect?")
    text, tokens = chat.answer(conv, img_list, max_new_tokens=4)
    assert isinstance(text, str)
    assert conv.messages[-1][1] == text


def test_chat_incremental_matches_full_reprefill():
    """The incremental KV-cache chat (prefill only the per-turn prompt
    delta, generation.continue_generate) must produce token-identical
    transcripts to the reference-shaped full re-prefill across a
    multi-turn conversation, while actually reusing the cached prefix."""
    model = Myriad(arch=MyriadArch.tiny(), use_ve=False, policy=Policy.fp32(),
                   max_txt_len=16, end_sym="###")
    proc = LocImageTrainProcessor(identity=True)
    rng = np.random.default_rng(1)
    image = rng.integers(0, 255, (28, 28, 3), dtype=np.uint8)
    questions = ["Is there any defect?", "Where is it?", "How severe?"]

    def run(incremental):
        chat = Chat(model, proc, incremental=incremental)
        conv = CONV_VISION.copy()
        img_list = []
        chat.upload_img(image, conv, img_list)
        out = []
        for q in questions:
            chat.ask(q, conv)
            text, tokens = chat.answer(conv, img_list, max_new_tokens=5)
            out.append((text, tokens))
        return chat, out

    chat_inc, inc = run(True)
    _, full = run(False)
    for turn, ((ti, ki), (tf, kf)) in enumerate(zip(inc, full)):
        assert ti == tf, f"turn {turn} text diverged"
        np.testing.assert_array_equal(ki, kf, err_msg=f"turn {turn}")
    # the cache was genuinely reused: every turn after the first prefilled
    # only its (true, unpadded) prompt delta
    deltas = chat_inc._delta_log
    assert len(deltas) == len(questions)
    assert deltas[0] == chat_inc._frontier - sum(deltas[1:])  # first = full
    assert all(d < chat_inc._frontier for d in deltas[1:]), (
        "later turns re-prefilled everything")
    # delta padding bounds the compiled-program count: the short per-turn
    # deltas share one padded width instead of one program per turn
    gen_keys = [k for k in chat_inc._jit_cache if k[0] == "gen"]
    assert len(gen_keys) < len(questions)


def test_chat_incremental_fresh_conversation_same_prompt():
    """A second fresh conversation with the IDENTICAL prompt (same image,
    same question — the demo-restart flow) must not crash on a zero-width
    delta: the prompt does not grow past the cached frontier, so the chat
    falls back to a full re-prefill and answers identically."""
    model = Myriad(arch=MyriadArch.tiny(), use_ve=False, policy=Policy.fp32(),
                   max_txt_len=16, end_sym="###")
    proc = LocImageTrainProcessor(identity=True)
    rng = np.random.default_rng(7)
    image = rng.integers(0, 255, (28, 28, 3), dtype=np.uint8)
    chat = Chat(model, proc)

    def one_conversation():
        conv = CONV_VISION.copy()
        img_list = []
        chat.upload_img(image, conv, img_list)
        chat.ask("Is there any defect?", conv)
        return chat.answer(conv, img_list, max_new_tokens=4)

    t1, k1 = one_conversation()
    t2, k2 = one_conversation()  # crashed before the total>frontier guard
    assert t1 == t2
    np.testing.assert_array_equal(k1, k2)


def test_chat_incremental_replaced_image_not_reused():
    """Replacing an img_list entry between turns (re-encoded / edited
    image) with UNCHANGED conversation text must not silently reuse the
    old image's cached KV: the embed-serial units force a re-prefill and
    the transcript matches the full re-prefill of the new image."""
    model = Myriad(arch=MyriadArch.tiny(), use_ve=False, policy=Policy.fp32(),
                   max_txt_len=16, end_sym="###")
    proc = LocImageTrainProcessor(identity=True)
    rng = np.random.default_rng(8)
    imgs = [rng.integers(0, 255, (28, 28, 3), dtype=np.uint8) for _ in range(2)]

    def run(incremental, swap):
        chat = Chat(model, proc, incremental=incremental)
        conv = CONV_VISION.copy()
        img_list = []
        chat.upload_img(imgs[0], conv, img_list)
        chat.ask("Any defect?", conv)
        out = [chat.answer(conv, img_list, max_new_tokens=4)]
        if swap:  # same prompt text, new image content in the same slot
            stash = []
            chat.upload_img(imgs[1], conv, stash)
            conv.messages.pop()  # upload_img's prompt line: keep text equal
            img_list[0] = stash[0]
        chat.ask("Where?", conv)
        out.append(chat.answer(conv, img_list, max_new_tokens=4))
        return chat, out

    chat_inc, inc = run(True, swap=True)
    _, full = run(False, swap=True)
    for turn, ((ti, ki), (tf, kf)) in enumerate(zip(inc, full)):
        assert ti == tf, f"turn {turn} text diverged"
        np.testing.assert_array_equal(ki, kf, err_msg=f"turn {turn}")
    # the swap was detected: turn 2 re-prefilled the FULL prompt (its delta
    # equals the final frontier) instead of extending the stale-image prefix
    assert chat_inc._delta_log[1] == chat_inc._frontier
    chat_ns, _ = run(True, swap=False)
    assert chat_ns._delta_log[1] < chat_ns._frontier  # no swap -> reuse


def test_chat_multi_image_incremental():
    """A second uploaded image mid-conversation is a pure prompt extension:
    the incremental path keeps reusing the prefix and stays token-identical
    to the full re-prefill."""
    model = Myriad(arch=MyriadArch.tiny(), use_ve=False, policy=Policy.fp32(),
                   max_txt_len=16, end_sym="###")
    proc = LocImageTrainProcessor(identity=True)
    rng = np.random.default_rng(2)
    imgs = [rng.integers(0, 255, (28, 28, 3), dtype=np.uint8) for _ in range(2)]

    def run(incremental):
        chat = Chat(model, proc, incremental=incremental)
        conv = CONV_VISION.copy()
        img_list = []
        chat.upload_img(imgs[0], conv, img_list)
        chat.ask("Any defect?", conv)
        out = [chat.answer(conv, img_list, max_new_tokens=4)]
        chat.upload_img(imgs[1], conv, img_list)
        chat.ask("Compare with this one.", conv)
        out.append(chat.answer(conv, img_list, max_new_tokens=4))
        return out

    inc, full = run(True), run(False)
    for turn, ((ti, ki), (tf, kf)) in enumerate(zip(inc, full)):
        assert ti == tf, f"turn {turn} text diverged"
        np.testing.assert_array_equal(ki, kf, err_msg=f"turn {turn}")


def test_chat_incremental_speculative_exact():
    """Speculative incremental chat (verify K prompt-lookup drafts per
    weight pass from the resident cache) must be transcript-identical to
    the plain greedy incremental path across turns — at ANY acceptance
    rate, including the ~0% a random tiny model yields."""
    model = Myriad(arch=MyriadArch.tiny(), use_ve=False, policy=Policy.fp32(),
                   max_txt_len=16, end_sym="###")
    proc = LocImageTrainProcessor(identity=True)
    rng = np.random.default_rng(9)
    image = rng.integers(0, 255, (28, 28, 3), dtype=np.uint8)
    questions = ["Any defect?", "Where is it located?"]

    def run(spec_k):
        chat = Chat(model, proc, incremental=True, spec_k=spec_k)
        conv = CONV_VISION.copy()
        img_list = []
        chat.upload_img(image, conv, img_list)
        out = []
        for q in questions:
            chat.ask(q, conv)
            out.append(chat.answer(conv, img_list, max_new_tokens=6))
        return chat, out

    _, greedy = run(0)
    chat_spec, spec = run(2)
    for turn, ((tg, kg), (ts, ks)) in enumerate(zip(greedy, spec)):
        assert tg == ts, f"turn {turn} text diverged"
        np.testing.assert_array_equal(kg, ks, err_msg=f"turn {turn}")
    # the spec path really ran speculative programs AND reused the prefix
    assert any(k[0] == "spec" for k in chat_spec._jit_cache)
    assert chat_spec._delta_log[1] < chat_spec._frontier


def test_chat_incremental_int8_kv():
    """Incremental chat picks the serving int8 KV cache dtype from the arch
    and stays token-identical to the full re-prefill there too."""
    import dataclasses

    arch = MyriadArch.tiny()
    arch = dataclasses.replace(
        arch, llama=dataclasses.replace(arch.llama, kv_cache_dtype="int8"))
    model = Myriad(arch=arch, use_ve=False, policy=Policy.fp32(),
                   max_txt_len=16, end_sym="###")
    proc = LocImageTrainProcessor(identity=True)
    rng = np.random.default_rng(3)
    image = rng.integers(0, 255, (28, 28, 3), dtype=np.uint8)

    def run(incremental):
        chat = Chat(model, proc, incremental=incremental)
        conv = CONV_VISION.copy()
        img_list = []
        chat.upload_img(image, conv, img_list)
        out = []
        for q in ["Any defect?", "Where?"]:
            chat.ask(q, conv)
            out.append(chat.answer(conv, img_list, max_new_tokens=4))
        return chat, out

    chat_inc, inc = run(True)
    assert chat_inc._cache[0]["k"].dtype == np.int8
    _, full = run(False)
    for turn, ((ti, ki), (tf, kf)) in enumerate(zip(inc, full)):
        assert ti == tf, f"turn {turn} text diverged"
        np.testing.assert_array_equal(ki, kf, err_msg=f"turn {turn}")
