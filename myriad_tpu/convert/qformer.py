"""BLIP-2 Q-Former state_dict -> flax QFormer params.

Maps the live (query-only) subset of the BertLMHeadModel weights the
reference keeps after pruning (myriad.py:148-157): self/cross attention,
the *_query FFN branch and the embeddings LayerNorm.  Keys follow the
reference checkpoint naming ('Qformer.bert....').
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t(x) -> np.ndarray:
    arr = np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)
    return arr.astype(np.float32)


def convert_qformer_state_dict(
    state_dict: Dict, num_layers: int = 12, cross_attention_freq: int = 2,
    prefix: str = "bert.",
) -> Dict:
    sd = {k: _t(v) for k, v in state_dict.items()}

    def attn(pre: str) -> Dict:
        return {
            "query": {"kernel": sd[pre + "self.query.weight"].T,
                      "bias": sd[pre + "self.query.bias"]},
            "key": {"kernel": sd[pre + "self.key.weight"].T,
                    "bias": sd[pre + "self.key.bias"]},
            "value": {"kernel": sd[pre + "self.value.weight"].T,
                      "bias": sd[pre + "self.value.bias"]},
            "attn_out": {"kernel": sd[pre + "output.dense.weight"].T,
                         "bias": sd[pre + "output.dense.bias"]},
            "attn_ln": {"scale": sd[pre + "output.LayerNorm.weight"],
                        "bias": sd[pre + "output.LayerNorm.bias"]},
        }

    p: Dict = {
        "embeddings_ln": {
            "scale": sd[prefix + "embeddings.LayerNorm.weight"],
            "bias": sd[prefix + "embeddings.LayerNorm.bias"],
        }
    }
    for i in range(num_layers):
        pre = f"{prefix}encoder.layer.{i}."
        layer = {"attention": attn(pre + "attention.")}
        if i % cross_attention_freq == 0:
            layer["crossattention"] = attn(pre + "crossattention.")
        layer["ffn"] = {
            "intermediate_query": {
                "kernel": sd[pre + "intermediate_query.dense.weight"].T,
                "bias": sd[pre + "intermediate_query.dense.bias"],
            },
            "output_query": {
                "kernel": sd[pre + "output_query.dense.weight"].T,
                "bias": sd[pre + "output_query.dense.bias"],
            },
            "ffn_ln": {
                "scale": sd[pre + "output_query.LayerNorm.weight"],
                "bias": sd[pre + "output_query.LayerNorm.bias"],
            },
        }
        p[f"layer_{i}"] = layer
    # the BLIP-2 checkpoint carries the learned query embeddings and the
    # ViT-adapter LayerNorm alongside the BERT weights (blip2.py:58-62 and
    # the whole-model strict=False load, blip2.py:104); surface both so the
    # bootstrap chain can seed Myriad's `query_tokens` / `ln_vision`
    if "query_tokens" in state_dict:
        p["query_tokens"] = _t(state_dict["query_tokens"])
    if "ln_vision.weight" in state_dict:
        # LayerNormFp32 wraps an inner nn.LayerNorm named 'ln'
        p["ln_vision"] = {"ln": {
            "scale": _t(state_dict["ln_vision.weight"]),
            "bias": _t(state_dict["ln_vision.bias"]),
        }}
    return {"params": p}
