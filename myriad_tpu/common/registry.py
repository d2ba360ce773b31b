"""Global name->class registry.

Mirrors the capability of the reference registry (reference:
minigpt4/common/registry.py:9-329): named registration for models, datasets
builders, processors, tasks, runners and LR schedulers, plus a small
path/state store.  The implementation is a single generic mapping rather
than a hand-rolled class per kind.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Type


class Registry:
    _KINDS = (
        "model",
        "builder",
        "processor",
        "task",
        "runner",
        "lr_scheduler",
    )

    def __init__(self) -> None:
        self._maps: Dict[str, Dict[str, Any]] = {k: {} for k in self._KINDS}
        self._paths: Dict[str, str] = {}
        self._state: Dict[str, Any] = {}

    # -- generic ------------------------------------------------------------
    def _register(self, kind: str, name: str) -> Callable[[Type], Type]:
        def wrap(cls: Type) -> Type:
            existing = self._maps[kind].get(name)
            if existing is not None and existing is not cls:
                raise KeyError(f"{kind} named '{name}' already registered ({existing}).")
            self._maps[kind][name] = cls
            return cls

        return wrap

    def _get(self, kind: str, name: str) -> Any:
        try:
            return self._maps[kind][name]
        except KeyError:
            known = ", ".join(sorted(self._maps[kind]))
            raise KeyError(f"Unknown {kind} '{name}'. Registered: [{known}]") from None

    # -- kind-specific sugar (matches reference API surface) ----------------
    def register_model(self, name: str):
        return self._register("model", name)

    def register_builder(self, name: str):
        return self._register("builder", name)

    def register_processor(self, name: str):
        return self._register("processor", name)

    def register_task(self, name: str):
        return self._register("task", name)

    def register_runner(self, name: str):
        return self._register("runner", name)

    def register_lr_scheduler(self, name: str):
        return self._register("lr_scheduler", name)

    def get_model_class(self, name: str):
        return self._get("model", name)

    def get_builder_class(self, name: str):
        return self._get("builder", name)

    def get_processor_class(self, name: str):
        return self._get("processor", name)

    def get_task_class(self, name: str):
        return self._get("task", name)

    def get_runner_class(self, name: str):
        return self._get("runner", name)

    def get_lr_scheduler_class(self, name: str):
        return self._get("lr_scheduler", name)

    def list_models(self):
        return sorted(self._maps["model"])

    def list_builders(self):
        return sorted(self._maps["builder"])

    def list_processors(self):
        return sorted(self._maps["processor"])

    def list_tasks(self):
        return sorted(self._maps["task"])

    # -- paths / state -------------------------------------------------------
    def register_path(self, name: str, path: str) -> None:
        self._paths[name] = path

    def get_path(self, name: str) -> str:
        return self._paths[name]

    def register(self, name: str, obj: Any) -> None:
        self._state[name] = obj

    def get(self, name: str, default: Any = None) -> Any:
        return self._state.get(name, default)


registry = Registry()
