"""Global name → class registry.

TPU-native counterpart of the reference's registry
(``lavis/common/registry.py:9-20``): the same seven categories
(model, task, builder, processor, pruner, lr_scheduler, runner) plus a
free-form path/state store, re-implemented as one generic mapping with
decorator registration.
"""

from __future__ import annotations

from typing import Any, Callable, Dict


class Registry:
    CATEGORIES = (
        "model",
        "task",
        "builder",
        "processor",
        "pruner",
        "lr_scheduler",
        "runner",
    )

    def __init__(self) -> None:
        self._maps: Dict[str, Dict[str, Any]] = {c: {} for c in self.CATEGORIES}
        self._paths: Dict[str, str] = {}
        self._state: Dict[str, Any] = {}
        self._lazy: Dict[str, list] = {}

    def register_lazy(self, category: str, loader: Callable) -> None:
        """Deferred registration: ``loader()`` runs (once) the first time
        a ``category`` lookup misses, then the lookup retries.  Lets the
        legacy-zoo modules stay unimported on the RESSA fast path while
        config-driven zoo names still resolve (models/__init__)."""
        self._lazy.setdefault(category, []).append(loader)

    # -- generic machinery ------------------------------------------------
    def _register(self, category: str, name: str) -> Callable:
        def deco(cls):
            existing = self._maps[category].get(name)
            if existing is not None and existing is not cls:
                raise KeyError(f"{category} '{name}' already registered to {existing}")
            self._maps[category][name] = cls
            return cls

        return deco

    def _get(self, category: str, name: str) -> Any:
        try:
            return self._maps[category][name]
        except KeyError:
            for loader in self._lazy.pop(category, ()):
                loader()
            try:
                return self._maps[category][name]
            except KeyError:
                known = ", ".join(sorted(self._maps[category]))
                raise KeyError(
                    f"No {category} named '{name}'. Known: {known}") from None

    def list_names(self, category: str):
        for loader in self._lazy.pop(category, ()):
            loader()
        return sorted(self._maps[category])

    # -- category-specific sugar (same API surface as the reference) ------
    def register_model(self, name):
        return self._register("model", name)

    def register_task(self, name):
        return self._register("task", name)

    def register_builder(self, name):
        return self._register("builder", name)

    def register_processor(self, name):
        return self._register("processor", name)

    def register_pruner(self, name):
        return self._register("pruner", name)

    def register_lr_scheduler(self, name):
        return self._register("lr_scheduler", name)

    def register_runner(self, name):
        return self._register("runner", name)

    def get_model_class(self, name):
        return self._get("model", name)

    def get_task_class(self, name):
        return self._get("task", name)

    def get_builder_class(self, name):
        return self._get("builder", name)

    def get_processor_class(self, name):
        return self._get("processor", name)

    def get_pruner_class(self, name):
        return self._get("pruner", name)

    def get_lr_scheduler_class(self, name):
        return self._get("lr_scheduler", name)

    def get_runner_class(self, name):
        return self._get("runner", name)

    # -- paths & state -----------------------------------------------------
    def register_path(self, name: str, path: str) -> None:
        self._paths[name] = path

    def get_path(self, name: str) -> str:
        return self._paths[name]

    def register(self, name: str, obj: Any) -> None:
        self._state[name] = obj

    def get(self, name: str, default: Any = None) -> Any:
        return self._state.get(name, default)


registry = Registry()
