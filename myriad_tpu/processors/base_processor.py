"""Base processor (reference minigpt4/processors/base_processor.py:11)."""

from __future__ import annotations

from myriad_tpu.common.config import ConfigDict


class BaseProcessor:
    def __call__(self, item):
        return item

    @classmethod
    def from_config(cls, cfg=None):
        return cls()

    @staticmethod
    def _cfg(cfg) -> ConfigDict:
        return cfg if cfg is not None else ConfigDict()
