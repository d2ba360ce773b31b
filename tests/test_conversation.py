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
    # only its prompt delta (jit keys record the per-call prefill widths)
    deltas = sorted(k[0] for k in chat_inc._jit_cache)
    assert len(deltas) == len(questions)
    assert deltas[0] < chat_inc._frontier, "later turns re-prefilled everything"


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
