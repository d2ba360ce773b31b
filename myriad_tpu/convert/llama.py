"""HF LLaMA state_dict -> flax LlamaForCausalLM params.

Keys follow HF ``LlamaForCausalLM`` naming (the reference loads Vicuna-7B
through HF from_pretrained, myriad.py:194-197).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from myriad_tpu.models.llama import LlamaConfig


def _t(x) -> np.ndarray:
    arr = np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)
    return arr.astype(np.float32)


def convert_llama_state_dict(state_dict: Dict, config: LlamaConfig) -> Dict:
    """Returns {"params": ...} matching LlamaForCausalLM.init structure."""
    sd = {k: _t(v) for k, v in state_dict.items()}
    p: Dict = {"model": {}}

    model = p["model"]
    model["embed_tokens"] = {"embedding": sd["model.embed_tokens.weight"]}
    for i in range(config.num_layers):
        pre = f"model.layers.{i}."
        layer: Dict = {
            "self_attn": {
                "q_proj": {"base": {"kernel": sd[pre + "self_attn.q_proj.weight"].T}},
                "k_proj": {"kernel": sd[pre + "self_attn.k_proj.weight"].T},
                "v_proj": {"base": {"kernel": sd[pre + "self_attn.v_proj.weight"].T}},
                "o_proj": {"kernel": sd[pre + "self_attn.o_proj.weight"].T},
            },
            "mlp": {
                "gate_proj": {"kernel": sd[pre + "mlp.gate_proj.weight"].T},
                "up_proj": {"kernel": sd[pre + "mlp.up_proj.weight"].T},
                "down_proj": {"kernel": sd[pre + "mlp.down_proj.weight"].T},
            },
            "input_layernorm": {"weight": sd[pre + "input_layernorm.weight"]},
            "post_attention_layernorm": {
                "weight": sd[pre + "post_attention_layernorm.weight"]
            },
        }
        if config.use_lora:
            for proj in ("q_proj", "v_proj"):
                a_key = pre + f"self_attn.{proj}.lora_A.weight"
                b_key = pre + f"self_attn.{proj}.lora_B.weight"
                if a_key in sd:
                    layer["self_attn"][proj]["lora_a"] = {"kernel": sd[a_key].T}
                    layer["self_attn"][proj]["lora_b"] = {"kernel": sd[b_key].T}
        model[f"layers_{i}"] = layer
    model["norm"] = {"weight": sd["model.norm.weight"]}
    lm_head = sd.get("lm_head.weight", sd["model.embed_tokens.weight"])
    p["lm_head"] = lm_head.T
    return {"params": p}
