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

    # pad each turn's prompt delta up to a multiple of this before the
    # incremental prefill, so one compiled program serves every turn whose
    # delta fits the padded width (the delta width is otherwise unique per
    # turn, and each new shape costs a multi-minute XLA compile on the
    # remote TPU — far more than the prefill it saves)
    DELTA_PAD = 64

    def __init__(self, model, vis_processor, incremental: bool = True,
                 spec_k: Optional[int] = None):
        self.model = model
        self.vis_processor = vis_processor
        self.incremental = incremental
        # speculative decoding for incremental turns: verify spec_k
        # prompt-lookup-drafted tokens per weight pass (transcript-exact;
        # chat answers often echo conversation phrasing, so the history
        # corpus drafts well).  None = follow the model's llm_spec_k knob;
        # 0 disables.  Engages only on the greedy path (do_sample False,
        # or the reference's effectively-greedy top_p<=0.01).
        self.spec_k = spec_k
        # incremental-mode state: device KV cache holding the prompt prefix,
        # its write frontier, and the flattened token "units" it covers
        # (text ids >= 0; image i's columns as ("img", i, serial) tuples)
        self._cache = None
        self._frontier = 0
        self._units: List = []
        self._bucket = 0
        # compiled programs are MODEL-level state (they close over nothing
        # conversation-specific: arch/policy/cfg/shape only), shared across
        # Chat instances so a fresh conversation never re-traces
        self._jit_cache: Dict = model.__dict__.setdefault(
            "_chat_jit_cache", {})
        # embedding-object serial numbers: a unit must identify the image
        # CONTENT, not just its list slot, or swapping an img_list entry
        # between turns would silently reuse KV from the old image.  Each
        # distinct embedding object gets a fresh serial; a weakref
        # finalizer retires the id() key when the object dies, so a new
        # object reusing the same id() can never alias an old serial.
        self._embed_serials: Dict[int, int] = {}
        self._next_serial = 0
        # true (unpadded) prefill width of each incremental turn — the
        # observable that tests/debugging use to confirm prefix reuse
        self._delta_log: List[int] = []

    def _embed_serial(self, emb) -> int:
        import weakref

        key = id(emb)
        if key not in self._embed_serials:
            serial = self._next_serial
            self._next_serial += 1
            self._embed_serials[key] = serial
            weakref.finalize(emb, self._embed_serials.pop, key, None)
        return self._embed_serials[key]

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

    def _context_units(
        self, conv: Conversation, img_list: List
    ) -> Tuple[List, List[List[int]]]:
        """Host-only tokenize walk: the flattened token-unit sequence (text
        ids as-is, image i's columns as ("img", i, embed-serial) tuples —
        the serial pins the embedding OBJECT, so replacing an img_list
        entry falls back to a full re-prefill) plus the per-segment id
        lists.  Two prompts share cached KV exactly as far as their unit
        sequences agree; each unit owns exactly one embed column."""
        prompt = conv.get_prompt()
        segments = prompt.split("<ImageHere>")
        assert len(segments) == len(img_list) + 1, "prompt/image count mismatch"
        tok = self.model.llama_tokenizer
        units: List = []
        seg_ids: List[List[int]] = []
        for i, seg in enumerate(segments):
            ids = tok(seg, add_special_tokens=(i == 0))["input_ids"]
            ids = ids[0] if ids and isinstance(ids[0], list) else ids
            ids = [int(t) for t in ids]
            seg_ids.append(ids)
            units.extend(ids)
            if i < len(img_list):
                unit = ("img", i, self._embed_serial(img_list[i]))
                units.extend([unit] * img_list[i].shape[1])
        return units, seg_ids

    def _context_units_and_embeds(
        self, conv: Conversation, img_list: List
    ) -> Tuple[List, jnp.ndarray]:
        """Interleave text segments and image embeddings into the full
        prompt embedding (conversation.py:215-229) — the reference-shaped
        full-re-prefill path."""
        from myriad_tpu.models.myriad import MyriadModule

        units, seg_ids = self._context_units(conv, img_list)
        embeds = []
        for i, ids in enumerate(seg_ids):
            seg_emb = self.model.module.apply(
                {"params": self.model.params},
                jnp.asarray([ids], jnp.int32),
                method=MyriadModule.embed_tokens,
            )
            embeds.append(seg_emb)
            if i < len(img_list):
                embeds.append(img_list[i].astype(seg_emb.dtype))
        return units, jnp.concatenate(embeds, axis=1)

    def _embed_ids(self, ids: List[int], width: int) -> jnp.ndarray:
        """Embed a host-side id list as ONE jitted call, zero-padded to
        ``width`` so the compiled-program count is bounded by the width
        buckets (each new shape costs a compile on the remote TPU; pad
        columns are mask-dead downstream via continue_generate's
        valid_len)."""
        import jax

        from myriad_tpu.models.myriad import MyriadModule

        key = ("embed", width)
        if key not in self._jit_cache:
            module = self.model.module
            self._jit_cache[key] = jax.jit(
                lambda p, i: module.apply(
                    {"params": p}, i, method=MyriadModule.embed_tokens)
            )
        padded = jnp.asarray([ids + [0] * (width - len(ids))], jnp.int32)
        return self._jit_cache[key](self.model.params, padded)

    def _embed_units(self, units: List, img_list: List, width: int) -> jnp.ndarray:
        """Build the (1, width, D) embedding of a unit slice: text runs
        embed through the jitted bucket, image runs reuse the encoder
        output already on device.  The common incremental turn (one text
        run) is a single device dispatch — per-turn host work is O(delta),
        not O(history)."""
        runs: List = []  # ("txt", [ids]) | ("img", i, n_cols)
        for u in units:
            if isinstance(u, tuple):
                if runs and runs[-1][0] == "img" and runs[-1][1] == u[1]:
                    runs[-1] = ("img", u[1], runs[-1][2] + 1)
                else:
                    runs.append(("img", u[1], 1))
            else:
                if runs and runs[-1][0] == "txt":
                    runs[-1][1].append(u)
                else:
                    runs.append(("txt", [u]))
        if len(runs) == 1 and runs[0][0] == "txt":
            return self._embed_ids(runs[0][1], width)
        parts = []
        for r in runs:
            if r[0] == "txt":
                w = -(-len(r[1]) // self.DELTA_PAD) * self.DELTA_PAD
                parts.append(self._embed_ids(r[1], w)[:, : len(r[1])])
            else:
                # a partial image run can only be the TAIL of the image's
                # columns (its identical units diverge at the first column)
                emb = img_list[r[1]]
                parts.append(emb[:, emb.shape[1] - r[2]:])
        # image embeds cast to the token-embedding dtype, matching the full
        # re-prefill path (_context_units_and_embeds) bit-for-bit
        dtype = self.model.policy.compute_dtype
        out = jnp.concatenate([p.astype(dtype) for p in parts], axis=1)
        return jnp.pad(out, [(0, 0), (0, width - out.shape[1]), (0, 0)])

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
        if self.incremental:
            # host-only tokenize; only the turn's prompt DELTA is embedded
            units, _ = self._context_units(conv, img_list)
            tokens = self._incremental_generate(llama, cfg, units, img_list)
        else:
            _, embeds = self._context_units_and_embeds(conv, img_list)
            tokens = greedy_generate(
                llama, {"params": self.model.params["llama"]}, embeds,
                config=cfg, cache_dtype=self._cache_dtype(),
            )
        text = self.model.llama_tokenizer.batch_decode(np.asarray(tokens))[0]
        text = text.split("###")[0].split("Assistant:")[-1].strip()
        conv.messages[-1][1] = text
        return text, np.asarray(tokens)

    def _cache_dtype(self):
        """Serving KV dtype: the same rule as Myriad.generate and bench."""
        from myriad_tpu.models.llama import serving_cache_dtype

        return serving_cache_dtype(self.model.arch.llama,
                                   self.model.policy.compute_dtype)

    def _spec_k(self, cfg) -> int:
        """Effective speculation depth for this turn: the Chat override or
        the model's llm_spec_k knob, and only when decoding is greedy
        (speculation is greedy-only; top_p<=0.01 is the reference's
        effectively-greedy sampling, same routing as Myriad.generate)."""
        k = self.spec_k
        if k is None:
            k = int(getattr(self.model, "spec_k", 0) or 0)
        greedy = (not cfg.do_sample) or cfg.top_p <= 0.01
        return k if (k >= 1 and greedy) else 0

    def _incremental_generate(self, llama, cfg, units: List,
                              img_list: List) -> jnp.ndarray:
        """Prefill only the prompt delta since the last turn (the cached
        unit sequence), decode from the resident cache, and keep the
        post-prefill cache for the next turn.

        The delta is right-padded to a DELTA_PAD multiple and the true
        width rides as a traced ``valid_len``, so the compiled-program
        count is bounded by the padded-width buckets instead of one
        program per turn (pad K/V land past the rewound write frontier,
        which every causal mask excludes — continue_generate docstring).
        Only the delta's units are embedded (_embed_units) — a text-only
        turn costs one device dispatch however long the history is."""
        import jax

        from myriad_tpu.generation import (_round_up, continue_generate,
                                           speculative_generate)
        from myriad_tpu.models.llama import init_cache

        spec_k = self._spec_k(cfg)
        total = len(units)
        # longest cached prefix this prompt still agrees with
        common = 0
        for a, b in zip(self._units[: self._frontier], units):
            if a != b:
                break
            common += 1
        # spec verify rounds write up to spec_k+1 positions past an active
        # row's frontier — the bucket carries that slack
        bucket = _round_up(
            total + cfg.max_new_tokens + (spec_k + 1 if spec_k else 0), 256)
        if (self._cache is None or bucket != self._bucket
                or common != self._frontier or total <= self._frontier):
            # Re-prefill from scratch on: fresh conversation, bucket growth
            # (copy-on-grow isn't worth the extra program; growth happens
            # every 256 tokens at most), a prompt that diverged inside
            # the cached region (tokenizer seam / edited history), or a
            # prompt that did not GROW past the frontier (a repeated or
            # shortened conversation — e.g. a second fresh conv on the
            # same Chat — has no delta to prefill).  A partial rollback
            # would be unsound when the new prompt is SHORTER than the
            # old frontier: stale slots between the new total and the old
            # frontier sit at positions the causal mask admits.
            self._cache = init_cache(llama.config, 1, bucket,
                                     self._cache_dtype())
            self._bucket = bucket
            common = 0
        valid = total - common
        assert valid > 0, "conversation prompt did not grow"
        self._delta_log.append(valid)
        # pad width is capped so the prefill writes stay inside the bucket
        # (dynamic_update_slice would clamp-and-corrupt otherwise); the
        # bucket always fits the true delta + max_new_tokens by
        # construction, so the cap never cuts below `valid`
        width = min(-(-valid // self.DELTA_PAD) * self.DELTA_PAD,
                    self._bucket - common)
        delta = self._embed_units(units[common:], img_list, width)
        if spec_k:
            # prompt-lookup corpus = the conversation's own text tokens,
            # padded to a 256 bucket with an impossible id so the filled
            # length stays out of the jit key (passed as a traced arg —
            # never baked into the program)
            text_ids = [u for u in units if not isinstance(u, tuple)]
            lk_w = _round_up(max(len(text_ids), 1), 256)
            lookup = jnp.asarray(
                [text_ids + [-3] * (lk_w - len(text_ids))], jnp.int32)
            spec_cfg = dataclasses.replace(cfg, do_sample=False)
            key = ("spec", width, self._bucket, spec_cfg, spec_k, lk_w)
            if key not in self._jit_cache:
                self._jit_cache[key] = jax.jit(
                    lambda params, d, c, v, lk: speculative_generate(
                        llama, params, d, config=spec_cfg, spec_k=spec_k,
                        lookup_ids=lk, cache=c, valid_len=v,
                        return_cache=True)
                )
            tokens, self._cache = self._jit_cache[key](
                {"params": self.model.params["llama"]}, delta, self._cache,
                jnp.int32(valid), lookup,
            )
        else:
            key = ("gen", width, self._bucket, cfg)
            if key not in self._jit_cache:
                self._jit_cache[key] = jax.jit(
                    lambda params, d, c, v, r: continue_generate(
                        llama, params, d, c, config=cfg, valid_len=v, rng=r)
                )
            tokens, self._cache = self._jit_cache[key](
                {"params": self.model.params["llama"]}, delta, self._cache,
                jnp.int32(valid), jax.random.PRNGKey(0),
            )
        self._frontier = total
        self._units = list(units)
        return tokens
