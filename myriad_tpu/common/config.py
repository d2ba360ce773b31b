"""Hierarchical YAML config with the reference's 3-level merge semantics.

Mirrors reference minigpt4/common/config.py:16-136: a user YAML with
``model:``, ``datasets:``, ``run:`` sections is merged over (1) the default
YAML registered for the model's ``model_type`` and (2) each dataset
builder's default YAML, with ``--options a.b=c`` dot-list overrides applied
last.  OmegaConf is replaced by a small attribute-dict (``ConfigDict``) so
the YAML schema of the reference configs (eval_configs/myriad.yaml,
train_configs/*.yaml) loads unchanged.
"""

from __future__ import annotations

import copy
import json
import logging
import os
from typing import Any, Dict, Iterable, List, Mapping, Optional

import yaml

from myriad_tpu.common.registry import registry


class ConfigDict(dict):
    """dict with attribute access, deep merge and dot-list overrides."""

    def __init__(self, data: Optional[Mapping] = None):
        super().__init__()
        if data:
            for k, v in data.items():
                self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, v: Any) -> Any:
        if isinstance(v, Mapping) and not isinstance(v, ConfigDict):
            return cls(v)
        if isinstance(v, list):
            return [cls._wrap(i) for i in v]
        return v

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = self._wrap(value)

    def __setitem__(self, name, value):
        super().__setitem__(name, self._wrap(value))

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name) from None

    def __deepcopy__(self, memo):
        return ConfigDict({k: copy.deepcopy(v, memo) for k, v in self.items()})

    # -- merge ----------------------------------------------------------------
    def merge(self, other: Optional[Mapping]) -> "ConfigDict":
        """Deep-merge ``other`` on top of self (other wins). Returns self."""
        if other is None:
            return self
        for k, v in other.items():
            if k in self and isinstance(self[k], ConfigDict) and isinstance(v, Mapping):
                self[k].merge(v)
            else:
                self[k] = self._wrap(v)
        return self

    def set_dotted(self, key: str, value: Any) -> None:
        parts = key.split(".")
        node = self
        for p in parts[:-1]:
            if p not in node or not isinstance(node[p], ConfigDict):
                node[p] = ConfigDict()
            node = node[p]
        node[parts[-1]] = value

    def to_dict(self) -> Dict:
        out: Dict = {}
        for k, v in self.items():
            if isinstance(v, ConfigDict):
                out[k] = v.to_dict()
            elif isinstance(v, list):
                out[k] = [i.to_dict() if isinstance(i, ConfigDict) else i for i in v]
            else:
                out[k] = v
        return out


def _parse_option_value(raw: str) -> Any:
    # numeric forms YAML 1.1 misses, e.g. "1e-4"
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        pass
    try:
        return yaml.safe_load(raw)
    except yaml.YAMLError:
        return raw


def parse_dotlist(options: Optional[Iterable[str]]) -> ConfigDict:
    """Parse ``["a.b=c", ...]`` CLI overrides (reference config.py:124-136)."""
    cfg = ConfigDict()
    if not options:
        return cfg
    for opt in options:
        if "=" not in opt:
            raise ValueError(f"Override '{opt}' is not in key=value form")
        key, raw = opt.split("=", 1)
        cfg.set_dotted(key.strip(), _parse_option_value(raw))
    return cfg


def load_yaml(path: str) -> ConfigDict:
    with open(path, "r") as f:
        return ConfigDict(yaml.safe_load(f) or {})


class Config:
    """3-way merged run/model/datasets config (reference config.py:16-122)."""

    def __init__(self, args=None, cfg_path: Optional[str] = None, options: Optional[List[str]] = None):
        if args is not None:
            cfg_path = getattr(args, "cfg_path", cfg_path)
            options = getattr(args, "options", options)
        if cfg_path is None:
            raise ValueError("Config requires a cfg_path")

        self.args = args
        user = load_yaml(cfg_path)
        overrides = parse_dotlist(options)

        self.config = ConfigDict()
        self.config.merge({"run": self._build_runner_config(user)})
        self.config.merge({"model": self._build_model_config(user, overrides)})
        self.config.merge({"datasets": self._build_dataset_config(user)})
        self.config.merge(overrides)

    # -- section builders -------------------------------------------------------
    @staticmethod
    def _build_runner_config(user: ConfigDict) -> ConfigDict:
        return copy.deepcopy(user.get("run", ConfigDict()))

    @staticmethod
    def _build_model_config(user: ConfigDict, overrides: ConfigDict) -> ConfigDict:
        model = user.get("model")
        if model is None:
            return ConfigDict()
        arch = overrides.get("model", ConfigDict()).get("arch", model.get("arch"))
        if arch is None:
            raise KeyError("Missing model.arch in config")
        model_cls = registry.get_model_class(arch)
        model_type = model.get("model_type", getattr(model_cls, "default_model_type", None))
        base = ConfigDict()
        if model_type is not None:
            default_path = model_cls.default_config_path(model_type)
            if default_path and os.path.isfile(default_path):
                base = load_yaml(default_path).get("model", ConfigDict())
        base.merge(model)
        return base

    @staticmethod
    def _build_dataset_config(user: ConfigDict) -> ConfigDict:
        datasets = user.get("datasets")
        if datasets is None:
            return ConfigDict()
        merged = ConfigDict()
        for name, ds_cfg in datasets.items():
            builder_cls = registry.get_builder_class(name)
            default_path = builder_cls.default_config_path(
                type=(ds_cfg or ConfigDict()).get("type", "default")
            )
            base = ConfigDict()
            if default_path and os.path.isfile(default_path):
                base = load_yaml(default_path).get("datasets", ConfigDict()).get(name, ConfigDict())
            base.merge(ds_cfg)
            merged[name] = base
        return merged

    # -- accessors (reference-compatible names) ---------------------------------
    @property
    def run_cfg(self) -> ConfigDict:
        return self.config.run

    @property
    def model_cfg(self) -> ConfigDict:
        return self.config.model

    @property
    def datasets_cfg(self) -> ConfigDict:
        return self.config.datasets

    def pretty_print(self) -> None:
        logging.info("\n=====  Running Parameters    =====")
        logging.info(json.dumps(self.config.get("run", {}).to_dict(), indent=4, default=str))
        logging.info("\n======  Dataset Attributes  ======")
        logging.info(json.dumps(self.config.get("datasets", {}).to_dict(), indent=4, default=str))
        logging.info("\n======  Model Attributes  ======")
        logging.info(json.dumps(self.config.get("model", {}).to_dict(), indent=4, default=str))

    def to_dict(self) -> Dict:
        return self.config.to_dict()
