"""Interactive chat plumbing (reference
minigpt4/conversation/conversation.py:24-229).

``Conversation`` is the ###-separated Human/Assistant prompt state machine;
``Chat`` wires it to a Myriad/MiniGPT4 model: upload an image, ask, answer
via the compiled greedy decode.  The reference's ``StoppingCriteriaSub``
becomes the stop-token scan built into myriad_tpu.generation.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class Conversation:
    system: str
    roles: Tuple[str, str] = ("Human", "Assistant")
    messages: List[List[str]] = dataclasses.field(default_factory=list)
    sep: str = "###"
    offset: int = 0

    def append_message(self, role: str, message: Optional[str]) -> None:
        self.messages.append([role, message])

    def get_prompt(self) -> str:
        ret = self.system + self.sep
        for role, message in self.messages:
            if message:
                ret += role + ": " + message + self.sep
            else:
                ret += role + ":"
        return ret

    def copy(self) -> "Conversation":
        return Conversation(
            system=self.system,
            roles=self.roles,
            messages=[list(m) for m in self.messages],
            sep=self.sep,
            offset=self.offset,
        )


CONV_VISION = Conversation(
    system="Give the following image: <Img>ImageContent</Img>. "
    "You will be able to see the image once I provide it to you. "
    "Please answer my questions.",
    roles=("Human", "Assistant"),
)


class Chat:
    """Minimal chat driver over a Myriad/MiniGPT4 model.

    ``incremental=True`` (default) keeps the conversation's KV cache
    resident on device across turns: each ``answer()`` prefills only the
    prompt segment that is NEW since the previous turn
    (generation.continue_generate), instead of re-prefilling the whole
    concatenated history the way the reference re-runs HF generate every
    turn (reference conversation.py:215-229).  Token-exact vs the full
    re-prefill (positions/causality are absolute, keyed off the cache
    write frontier; equality is test-enforced) — the prefix-token match is
    recomputed every turn, so a tokenizer seam that retroactively changes
    earlier tokens simply falls back to a full re-prefill.
    """

    def __init__(self, model, vis_processor, incremental: bool = True):
        self.model = model
        self.vis_processor = vis_processor
        self.incremental = incremental
        # incremental-mode state: device KV cache holding the prompt prefix,
        # its write frontier, and the flattened token "units" it covers
        # (text ids >= 0; image i's tokens encoded as -(i+1))
        self._cache = None
        self._frontier = 0
        self._units: List[int] = []
        self._bucket = 0
        self._jit_cache: Dict = {}

    def upload_img(self, image, conv: Conversation, img_list: List) -> str:
        """Encode an image into LLM-space tokens (conversation.py:190-213).

        The reference's stale ``prepare_sample(do_one_class=...)`` call is
        replaced by the live zero-shot map path.
        """
        arr = np.asarray(self.vis_processor({"img": np.asarray(image)})["img"],
                         np.float32)[None]
        ve = self.model.vision_expert
        if ve is not None:
            # the generic 'object' prompt class (reference prompt_sentences
            # include it, adrefexpert_v2.py:40)
            if "object" not in ve.class_index:
                ve.class_names = list(ve.class_names) + ["object"]
                ve.class_index[ve.class_names[-1]] = len(ve.class_names) - 1
                ve._text_feats = None
            if ve._text_feats is None:
                ve.build_text_features()
        samples: Dict = {
            "image": arr,
            "scene": ["object"],
            "question": ["<Img><ImageHere></Img>placeholder"],
            "img_path": ["<chat>"],
        }
        img_arr, _, _, maps, one_maps = self.model.prepare_sample(
            samples, stage=1, training=False
        )
        from myriad_tpu.models.myriad import MyriadModule

        embeds = self.model.module.apply(
            {"params": self.model.params}, jnp.asarray(img_arr), maps, 1,
            method=MyriadModule.encode_img,
        )
        img_list.append(embeds)
        conv.append_message(conv.roles[0], "<Img><ImageHere></Img>")
        return "Received."

    def ask(self, text: str, conv: Conversation) -> None:
        if (
            conv.messages
            and conv.messages[-1][0] == conv.roles[0]
            and conv.messages[-1][1]
            and conv.messages[-1][1].endswith("</Img>")
        ):
            conv.messages[-1][1] = conv.messages[-1][1] + " " + text
        else:
            conv.append_message(conv.roles[0], text)

    def _context_units_and_embeds(
        self, conv: Conversation, img_list: List
    ) -> Tuple[List[int], jnp.ndarray]:
        """Interleave text segments and image embeddings
        (conversation.py:215-229).

        Also returns the flattened token-unit sequence (text ids as-is,
        image i's embedding positions as -(i+1)) used for the incremental
        prefix match — two prompts share cached KV exactly as far as their
        unit sequences agree."""
        prompt = conv.get_prompt()
        segments = prompt.split("<ImageHere>")
        assert len(segments) == len(img_list) + 1, "prompt/image count mismatch"
        tok = self.model.llama_tokenizer
        embeds = []
        units: List[int] = []
        for i, seg in enumerate(segments):
            ids = tok(seg, add_special_tokens=(i == 0))["input_ids"]
            ids = ids[0] if ids and isinstance(ids[0], list) else ids
            units.extend(int(t) for t in ids)
            seg_ids = jnp.asarray([list(ids)], jnp.int32)
            from myriad_tpu.models.myriad import MyriadModule

            seg_emb = self.model.module.apply(
                {"params": self.model.params}, seg_ids,
                method=MyriadModule.embed_tokens,
            )
            embeds.append(seg_emb)
            if i < len(img_list):
                embeds.append(img_list[i].astype(seg_emb.dtype))
                units.extend([-(i + 1)] * img_list[i].shape[1])
        return units, jnp.concatenate(embeds, axis=1)

    def get_context_emb(self, conv: Conversation, img_list: List) -> jnp.ndarray:
        return self._context_units_and_embeds(conv, img_list)[1]

    def answer(self, conv: Conversation, img_list: List, max_new_tokens: int = 300,
               **kwargs) -> Tuple[str, np.ndarray]:
        conv.append_message(conv.roles[1], None)
        from myriad_tpu.generation import GenerationConfig, greedy_generate
        from myriad_tpu.models.llama import LlamaForCausalLM

        llama = LlamaForCausalLM(
            self.model.arch.llama, self.model.policy.compute_dtype,
            self.model.policy.param_dtype,
        )
        cfg = GenerationConfig(
            max_new_tokens=max_new_tokens,
            do_sample=kwargs.get("do_sample", False),
            top_p=kwargs.get("top_p", 0.9),
            temperature=kwargs.get("temperature", 1.0),
        )
        units, embeds = self._context_units_and_embeds(conv, img_list)
        if self.incremental:
            tokens = self._incremental_generate(llama, cfg, units, embeds)
        else:
            tokens = greedy_generate(
                llama, {"params": self.model.params["llama"]}, embeds,
                config=cfg, cache_dtype=self._cache_dtype(),
            )
        text = self.model.llama_tokenizer.batch_decode(np.asarray(tokens))[0]
        text = text.split("###")[0].split("Assistant:")[-1].strip()
        conv.messages[-1][1] = text
        return text, np.asarray(tokens)

    def _cache_dtype(self):
        """Serving KV dtype: follows the arch knob (int8 halves the cache
        and streams at int8 width; same rule as Myriad.generate)."""
        return ("int8" if self.model.arch.llama.kv_cache_dtype == "int8"
                else self.model.policy.compute_dtype)

    def _incremental_generate(self, llama, cfg, units: List[int],
                              embeds: jnp.ndarray) -> jnp.ndarray:
        """Prefill only the prompt delta since the last turn (the cached
        unit sequence), decode from the resident cache, and keep the
        post-prefill cache for the next turn."""
        import jax

        from myriad_tpu.generation import _round_up, continue_generate
        from myriad_tpu.models.llama import init_cache

        total = len(units)
        # longest cached prefix this prompt still agrees with
        common = 0
        for a, b in zip(self._units[: self._frontier], units):
            if a != b:
                break
            common += 1
        bucket = _round_up(total + cfg.max_new_tokens, 256)
        if self._cache is None or bucket != self._bucket or common != self._frontier:
            # Re-prefill from scratch on: fresh conversation, bucket growth
            # (copy-on-grow isn't worth the extra program; growth happens
            # every 256 tokens at most), or a prompt that diverged inside
            # the cached region (tokenizer seam / edited history).  A
            # partial rollback would be unsound when the new prompt is
            # SHORTER than the old frontier: stale slots between the new
            # total and the old frontier sit at positions the causal mask
            # admits.
            self._cache = init_cache(llama.config, 1, bucket,
                                     self._cache_dtype())
            self._bucket = bucket
            common = 0
        delta = embeds[:, common:]
        assert delta.shape[1] > 0, "conversation prompt did not grow"
        key = (delta.shape[1], self._bucket, cfg)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                lambda params, d, c, r: continue_generate(
                    llama, params, d, c, config=cfg, rng=r)
            )
        tokens, self._cache = self._jit_cache[key](
            {"params": self.model.params["llama"]}, delta, self._cache,
            jax.random.PRNGKey(0),
        )
        self._frontier = total
        self._units = list(units)
        return tokens
