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
    """Minimal chat driver over a Myriad/MiniGPT4 model."""

    def __init__(self, model, vis_processor):
        self.model = model
        self.vis_processor = vis_processor

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

    def get_context_emb(self, conv: Conversation, img_list: List) -> jnp.ndarray:
        """Interleave text segments and image embeddings
        (conversation.py:215-229)."""
        prompt = conv.get_prompt()
        segments = prompt.split("<ImageHere>")
        assert len(segments) == len(img_list) + 1, "prompt/image count mismatch"
        tok = self.model.llama_tokenizer
        embeds = []
        for i, seg in enumerate(segments):
            ids = tok(seg, add_special_tokens=(i == 0))["input_ids"]
            ids = ids[0] if ids and isinstance(ids[0], list) else ids
            seg_ids = jnp.asarray([list(ids)], jnp.int32)
            from myriad_tpu.models.myriad import MyriadModule

            seg_emb = self.model.module.apply(
                {"params": self.model.params}, seg_ids,
                method=MyriadModule.embed_tokens,
            )
            embeds.append(seg_emb)
            if i < len(img_list):
                embeds.append(img_list[i].astype(seg_emb.dtype))
        return jnp.concatenate(embeds, axis=1)

    def answer(self, conv: Conversation, img_list: List, max_new_tokens: int = 300,
               **kwargs) -> Tuple[str, np.ndarray]:
        conv.append_message(conv.roles[1], None)
        embeds = self.get_context_emb(conv, img_list)
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
        tokens = greedy_generate(
            llama, {"params": self.model.params["llama"]}, embeds, config=cfg,
        )
        text = self.model.llama_tokenizer.batch_decode(np.asarray(tokens))[0]
        text = text.split("###")[0].split("Assistant:")[-1].strip()
        conv.messages[-1][1] = text
        return text, np.asarray(tokens)
