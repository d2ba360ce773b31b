"""MiniGPT-4 — the stage-1/2 baseline model (reference
minigpt4/models/mini_gpt4.py:14-307): same tower stack as Myriad but
without the vision expert or VE adaptors; optional random prompt wrapping
from a prompt list.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from myriad_tpu import checkpoint as ckpt_lib
from myriad_tpu.common.registry import registry
from myriad_tpu.models.base import BaseModel
from myriad_tpu.models.eva_vit import EvaViT
from myriad_tpu.models.layers import Dtype, LayerNormFp32, Policy
from myriad_tpu.models.llama import LlamaConfig, LlamaForCausalLM, lm_cross_entropy
from myriad_tpu.models.myriad import MyriadArch, _cast_frozen, _policy_from_cfg
from myriad_tpu.models.qformer import QFormer
from myriad_tpu.tokenization import load_llama_tokenizer


class MiniGPT4Module(nn.Module):
    arch: MyriadArch
    use_grad_checkpoint: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    def setup(self):
        a = self.arch
        self.visual_encoder = EvaViT(
            img_size=a.img_size, patch_size=a.vit_patch, embed_dim=a.vit_dim,
            depth=a.vit_depth, num_heads=a.vit_heads, mlp_ratio=a.vit_mlp_ratio,
            use_checkpoint=self.use_grad_checkpoint,
            dtype=self.dtype, param_dtype=self.param_dtype, name="visual_encoder",
        )
        self.ln_vision = LayerNormFp32(epsilon=1e-5, param_dtype=self.param_dtype,
                                       name="ln_vision")
        self.qformer = QFormer(
            hidden_size=a.qformer_hidden, num_layers=a.qformer_layers,
            num_heads=a.qformer_heads, intermediate_size=a.qformer_intermediate,
            dtype=self.dtype, param_dtype=self.param_dtype, name="qformer",
        )
        self.query_tokens = self.param(
            "query_tokens", nn.initializers.normal(0.02),
            (1, a.num_query_token, a.qformer_hidden), self.param_dtype,
        )
        self.llama_proj = nn.Dense(
            a.llama.hidden_size, dtype=self.dtype, param_dtype=self.param_dtype,
            name="llama_proj",
        )
        self.llama = LlamaForCausalLM(a.llama, self.dtype, self.param_dtype, name="llama")

    def encode_img(self, image: jnp.ndarray) -> jnp.ndarray:
        """mini_gpt4.py:153-181 (no adaptor, no VE tokens)."""
        b = image.shape[0]
        feats = self.ln_vision(self.visual_encoder(image))
        q = jnp.broadcast_to(
            self.query_tokens.astype(feats.dtype),
            (b, self.arch.num_query_token, self.arch.qformer_hidden),
        )
        return self.llama_proj(self.qformer(q, feats))

    def embed_tokens(self, ids: jnp.ndarray) -> jnp.ndarray:
        return self.llama.embed(ids)

    def forward_train(
        self,
        image: jnp.ndarray,
        before_ids: jnp.ndarray,
        after_ids: jnp.ndarray,
        text_ids: jnp.ndarray,
        text_mask: jnp.ndarray,
        bos_id: int = 1,
    ) -> jnp.ndarray:
        img = self.encode_img(image)
        b = image.shape[0]
        bos = self.embed_tokens(jnp.full((b, 1), bos_id, jnp.int32))
        before = self.embed_tokens(jnp.broadcast_to(before_ids[None], (b,) + before_ids.shape))
        after = self.embed_tokens(jnp.broadcast_to(after_ids[None], (b,) + after_ids.shape))
        prefix = jnp.concatenate([bos, before, img.astype(bos.dtype), after], axis=1)
        p = prefix.shape[1]
        text_embeds = self.embed_tokens(text_ids)
        inputs = jnp.concatenate([prefix, text_embeds.astype(prefix.dtype)], axis=1)
        mask = jnp.concatenate(
            [jnp.ones((b, p), jnp.int32), text_mask.astype(jnp.int32)], axis=1
        )
        targets = jnp.concatenate(
            [jnp.full((b, p), -100, jnp.int32),
             jnp.where(text_mask.astype(bool), text_ids, -100).astype(jnp.int32)],
            axis=1,
        )
        logits, _ = self.llama(inputs, mask)
        return lm_cross_entropy(logits, targets)


@registry.register_model("mini_gpt4")
class MiniGPT4(BaseModel):
    PRETRAINED_MODEL_CONFIG_DICT = {
        "pretrain_vicuna": "configs/models/minigpt4.yaml",
    }
    default_model_type = "pretrain_vicuna"

    def __init__(
        self,
        arch: Optional[MyriadArch] = None,
        *,
        freeze_vit: bool = True,
        freeze_qformer: bool = True,
        freeze_llama: bool = True,
        use_grad_checkpoint: bool = False,
        llama_model: str = "",
        prompt_path: str = "",
        prompt_template: str = "",
        max_txt_len: int = 32,
        end_sym: str = "\n",
        policy: Optional[Policy] = None,
        seed: int = 0,
    ):
        self.arch = arch or MyriadArch.full()
        self.freeze_vit = freeze_vit
        self.freeze_qformer = freeze_qformer
        self.freeze_llama = freeze_llama
        self.max_txt_len = max_txt_len
        self.end_sym = end_sym
        policy = policy or Policy.bf16()
        self.policy = policy
        self.module = MiniGPT4Module(
            self.arch, use_grad_checkpoint=use_grad_checkpoint,
            dtype=policy.compute_dtype, param_dtype=policy.param_dtype,
        )
        params = self._init_params(jax.random.PRNGKey(seed))
        self.trainable, self.frozen = ckpt_lib.split_by_predicate(
            params, self._trainable_predicate()
        )
        # frozen towers store in the compute dtype (reference fp16 conversion)
        self.frozen = _cast_frozen(self.frozen, policy.compute_dtype)
        self.llama_tokenizer = load_llama_tokenizer(llama_model)
        self.prompt_list: List[str] = []
        if prompt_path:
            with open(prompt_path) as f:
                raw = f.read().splitlines()
            self.prompt_list = [prompt_template.format(p) for p in raw if "<ImageHere>" in p]
            logging.info("Loaded %d training prompts", len(self.prompt_list))
        self._prompt_cache: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
        self._jit_cache: Dict = {}

    def _init_params(self, rng) -> Dict:
        a = self.arch
        img = jnp.zeros((1, a.img_size, a.img_size, 3), jnp.float32)
        ids = jnp.zeros((2,), jnp.int32)
        text = jnp.zeros((1, 2), jnp.int32)
        mask = jnp.ones((1, 2), jnp.int32)

        @jax.jit
        def init_fn(rng):
            return self.module.init(
                rng, img, ids, ids, text, mask, method=MiniGPT4Module.forward_train
            )

        return init_fn(rng)["params"]

    def _trainable_predicate(self):
        def pred(path: str) -> bool:
            # MiniGPT-4 stage-1/2 trains only llama_proj (mini_gpt4.py freeze logic)
            if path.startswith("llama_proj"):
                return True
            if not self.freeze_qformer and (
                path.startswith("qformer") or path == "query_tokens"
            ):
                return True
            if not self.freeze_vit and path.startswith("visual_encoder"):
                return True
            if not self.freeze_llama and path.startswith("llama") and not path.startswith("llama_proj"):
                return True
            return False

        return pred

    @property
    def params(self) -> Dict:
        return ckpt_lib.overlay_trees(self.frozen, self.trainable)

    def split_prompt(self, prompt: str) -> Tuple[np.ndarray, np.ndarray]:
        if prompt not in self._prompt_cache:
            before, after = prompt.split("<ImageHere>")
            b_ids = self.llama_tokenizer(before, add_special_tokens=False)["input_ids"]
            a_ids = self.llama_tokenizer(after, add_special_tokens=False)["input_ids"]
            b_ids = b_ids[0] if b_ids and isinstance(b_ids[0], list) else b_ids
            a_ids = a_ids[0] if a_ids and isinstance(a_ids[0], list) else a_ids
            self._prompt_cache[prompt] = (
                np.asarray(b_ids, np.int32), np.asarray(a_ids, np.int32)
            )
        return self._prompt_cache[prompt]

    def tokenize_targets(self, texts) -> Tuple[np.ndarray, np.ndarray]:
        rows = []
        for t in texts:
            ids = self.llama_tokenizer(t + self.end_sym, add_special_tokens=False)["input_ids"]
            ids = ids[0] if ids and isinstance(ids[0], list) else ids
            rows.append(list(ids)[: self.max_txt_len])
        out = np.zeros((len(rows), self.max_txt_len), np.int32)
        mask = np.zeros((len(rows), self.max_txt_len), np.int32)
        for i, ids in enumerate(rows):
            out[i, : len(ids)] = ids
            mask[i, : len(ids)] = 1
        return out, mask

    def prepare_train_arrays(self, samples: Dict, rng: np.random.Generator):
        image = np.asarray(samples["image"], np.float32)
        if self.prompt_list:
            prompt = self.prompt_list[int(rng.integers(0, len(self.prompt_list)))]
        else:
            prompt = "<ImageHere>"
        before, after = self.split_prompt(prompt)
        text_ids, text_mask = self.tokenize_targets(list(samples["text_input"]))
        arrays = {
            "image": jnp.asarray(image),
            "before": jnp.asarray(before),
            "after": jnp.asarray(after),
            "text_ids": jnp.asarray(text_ids),
            "text_mask": jnp.asarray(text_mask),
        }
        return arrays, ()

    def pure_loss(self, trainable, frozen, arrays, static):
        params = ckpt_lib.overlay_trees(frozen, trainable)
        return self.module.apply(
            {"params": params}, arrays["image"], arrays["before"], arrays["after"],
            arrays["text_ids"], arrays["text_mask"],
            method=MiniGPT4Module.forward_train,
        )

    def forward(self, samples: Dict, rng: Optional[np.random.Generator] = None) -> Dict:
        rng = rng or np.random.default_rng()
        image = np.asarray(samples["image"], np.float32)
        if self.prompt_list:
            prompt = self.prompt_list[int(rng.integers(0, len(self.prompt_list)))]
        else:
            prompt = "<ImageHere>"
        before, after = self.split_prompt(prompt)
        text_ids, text_mask = self.tokenize_targets(list(samples["text_input"]))

        key = ("loss", image.shape, before.shape, after.shape, text_ids.shape)
        if key not in self._jit_cache:
            module = self.module

            @jax.jit
            def fn(trainable, frozen, image, before, after, text_ids, text_mask):
                params = ckpt_lib.overlay_trees(frozen, trainable)
                return module.apply(
                    {"params": params}, image, before, after, text_ids, text_mask,
                    method=MiniGPT4Module.forward_train,
                )

            self._jit_cache[key] = fn
        loss = self._jit_cache[key](
            self.trainable, self.frozen, jnp.asarray(image),
            jnp.asarray(before), jnp.asarray(after),
            jnp.asarray(text_ids), jnp.asarray(text_mask),
        )
        return {"loss": loss}

    def load_pretrained_weights(self, weights: Dict) -> Dict:
        """Merge converted pretrained towers into the frozen subtrees
        (the MiniGPT-4 bootstrap: EVA + Q-Former + Vicuna frozen,
        mini_gpt4.py freeze logic).  ``llama_proj`` is MiniGPT-4's
        *trainable* module, so a supplied llama_proj tree (e.g. converted
        from pretrained_minigpt4_7b.pth) merges into ``self.trainable``.

        Returns {loaded, skipped, missing} path accounting (see
        Myriad.load_pretrained_weights)."""
        report: Dict = {"loaded": {}, "skipped": {}}
        loaded_paths = set()
        for key, prefix in (("vit", "visual_encoder"), ("qformer", ""),
                            ("llama", "llama")):
            if not weights.get(key):
                continue
            tree = (ckpt_lib.load_params(weights[key])
                    if isinstance(weights[key], str) else weights[key])
            if key == "qformer" and "qformer" not in tree:
                qt = tree.pop("query_tokens", None)
                ln = tree.pop("ln_vision", None)
                tree = {"qformer": tree}
                if qt is not None:
                    tree["query_tokens"] = qt
                if ln is not None:
                    tree["ln_vision"] = ln
            loaded, skipped = self.load_frozen(tree, prefix=prefix)
            report["loaded"][key], report["skipped"][key] = loaded, skipped
            loaded_paths.update(loaded)
        if weights.get("llama_proj"):
            tree = (ckpt_lib.load_params(weights["llama_proj"])
                    if isinstance(weights["llama_proj"], str) else weights["llama_proj"])
            merged, loaded, skipped = ckpt_lib.merge_with_paths(self.trainable, tree)
            self.trainable = merged
            report["loaded"]["llama_proj"], report["skipped"]["llama_proj"] = loaded, skipped
            loaded_paths.update(loaded)
        roots = {"vit": ["visual_encoder"],
                 "qformer": ["qformer", "query_tokens", "ln_vision"],
                 "llama": ["llama"], "llama_proj": ["llama_proj"]}
        expect = [r for k, rs in roots.items() if weights.get(k) for r in rs]
        all_paths = ckpt_lib.tree_paths(self.frozen) + ckpt_lib.tree_paths(self.trainable)
        report["missing"] = [
            p for p in all_paths
            if any(p == r or p.startswith(r + "/") for r in expect)
            and p not in loaded_paths
        ]
        if report["missing"]:
            logging.warning("pretrained weights: %d leaves NOT covered",
                            len(report["missing"]))
        return report

    @classmethod
    def from_config(cls, cfg):
        arch_preset = cfg.get("arch_preset", "full")
        arch = MyriadArch.tiny() if arch_preset == "tiny" else MyriadArch.full()
        if cfg.get("image_size"):
            arch = dataclasses.replace(arch, img_size=cfg.get("image_size"))
        model = cls(
            arch=arch,
            freeze_vit=cfg.get("freeze_vit", True),
            freeze_qformer=cfg.get("freeze_qformer", True),
            freeze_llama=cfg.get("freeze_llama", True),
            use_grad_checkpoint=cfg.get("use_grad_checkpoint", False),
            llama_model=cfg.get("llama_model", ""),
            prompt_path=cfg.get("prompt_path", ""),
            prompt_template=cfg.get("prompt_template", ""),
            max_txt_len=cfg.get("max_txt_len", 32),
            end_sym=cfg.get("end_sym", "\n"),
            policy=_policy_from_cfg(cfg),
            seed=cfg.get("seed", 0),
        )
        weights = dict(cfg.get("weights") or {})
        if weights:
            model.load_pretrained_weights(weights)
        ckpt_path = cfg.get("ckpt", "")
        if ckpt_path:
            model.load_checkpoint(ckpt_path)
        return model
