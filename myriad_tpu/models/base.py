"""Base model plumbing (reference minigpt4/models/base_model.py:19-118).

Models here are *not* flax modules themselves: a model class owns

* a flax module tree (``self.module``)
* a parameter pytree split into ``trainable`` / ``frozen`` collections
  (the functional replacement for requires_grad freezing)
* config plumbing: ``from_config`` / ``default_config_path`` /
  checkpoint load

so the jitted train/eval steps stay pure functions over pytrees.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from myriad_tpu.common.registry import registry


class BaseModel:
    PRETRAINED_MODEL_CONFIG_DICT: Dict[str, str] = {}

    @classmethod
    def default_config_path(cls, model_type: str) -> Optional[str]:
        rel = cls.PRETRAINED_MODEL_CONFIG_DICT.get(model_type)
        if rel is None:
            return None
        return os.path.join(registry.get_path("library_root"), rel)

    @classmethod
    def from_config(cls, cfg):  # pragma: no cover - overridden
        raise NotImplementedError

    # -- parameter bookkeeping -------------------------------------------------
    @staticmethod
    def count_params(tree) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))

    def show_n_params(self) -> str:
        total = 0
        for name in ("trainable", "frozen"):
            tree = getattr(self, name, None)
            if tree is not None:
                total += self.count_params(tree)
        if total > 1e9:
            return f"{total / 1e9:.1f}B"
        if total > 1e6:
            return f"{total / 1e6:.1f}M"
        return f"{total / 1e3:.1f}K"

    # -- pretrained frozen towers (bootstrap chain, SURVEY.md §5.4) -------------
    def load_frozen(self, tree_or_path, prefix: str = "") -> Tuple[list, list]:
        """Merge a converted param tree into the **frozen** subtree.

        The reference builds its model FROM pretrained towers (EVA download
        eva_vit.py:429-436, Q-Former blip2.py:91-110, Vicuna myriad.py:194-197,
        llama_proj myriad.py:210-219); the functional equivalent is merging
        converted npz trees into ``self.frozen``.  ``prefix`` roots the
        incoming tree at a frozen submodule (e.g. 'visual_encoder').

        Returns (loaded_paths, skipped_paths); unknown/mismatched leaves are
        skipped with a warning, never fatal (strict=False semantics).
        """
        from myriad_tpu import checkpoint as ckpt_lib

        tree = (
            ckpt_lib.load_params(tree_or_path)
            if isinstance(tree_or_path, str)
            else tree_or_path
        )
        if prefix:
            for part in reversed(prefix.split("/")):
                tree = {part: tree}
        merged, loaded, skipped = ckpt_lib.merge_with_paths(self.frozen, tree)
        self.frozen = merged
        logging.info(
            "load_frozen%s: %d leaves loaded, %d skipped",
            f" [{prefix}]" if prefix else "", len(loaded), len(skipped),
        )
        return loaded, skipped

    # -- checkpoint load (url/file, non-strict) ---------------------------------
    def load_checkpoint(self, url_or_filename: str) -> None:
        """Merge a saved trainable-param tree into this model (strict=False
        semantics of the reference: unknown keys ignored, missing kept)."""
        from myriad_tpu import checkpoint as ckpt_lib

        tree = ckpt_lib.load_params(url_or_filename)
        if isinstance(tree, dict) and "model" in tree and (
                "optimizer" in tree or "epoch" in tree):
            # a RunnerBase ring checkpoint (runner_base._save_checkpoint):
            # trainables nest under 'model' beside optimizer/step state —
            # unwrap so `ckpt:` in an eval config can point straight at a
            # training run's orbax dir (the train -> serve loop)
            tree = tree["model"]
        merged, loaded, skipped = ckpt_lib.merge_trees(self.trainable, tree)
        self.trainable = merged
        if loaded == 0:
            logging.warning(
                "load checkpoint from %s matched ZERO trainable leaves — "
                "wrong tree layout?", url_or_filename)
        logging.info(
            "load checkpoint from %s (%d leaves loaded, %d unknown)",
            url_or_filename, loaded, skipped,
        )
