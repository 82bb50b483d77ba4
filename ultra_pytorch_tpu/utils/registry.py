"""Component registry: string name -> implementation.

Replaces the reference's reflection plumbing (``find_class`` at
``ultra/utils/sys_tools.py:7-22`` and the recursive-subclass walk at
``:36-54``) with an explicit registry. Experiment JSONs written for the
reference keep working: names like ``ultra.input_layer.ClickSimulationFeed``
are aliased onto our implementations, so a reference user can bring their
config files unchanged.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Dict, List, Optional

_REGISTRY: Dict[str, Dict[str, Any]] = {}  # kind -> {name -> obj}
_ALIASES: Dict[str, str] = {}  # reference-style dotted name -> "kind:name"

# Modules whose import populates the registry for each component kind.
_KIND_MODULES = {
    "ranker": "ultra_pytorch_tpu.models",
    "algorithm": "ultra_pytorch_tpu.algorithms",
    "feed": "ultra_pytorch_tpu.input_layer",
    "click_model": "ultra_pytorch_tpu.sim",
    "estimator": "ultra_pytorch_tpu.sim",
}


def register(kind: str, name: str, aliases: Optional[List[str]] = None
             ) -> Callable[[Any], Any]:
    """Class/function decorator registering an implementation under `kind`."""

    def deco(obj: Any) -> Any:
        _REGISTRY.setdefault(kind, {})[name] = obj
        for alias in aliases or []:
            _ALIASES[alias] = f"{kind}:{name}"
        return obj

    return deco


def _ensure_loaded(kind: Optional[str] = None) -> None:
    mods = ([_KIND_MODULES[kind]] if kind in _KIND_MODULES
            else list(dict.fromkeys(_KIND_MODULES.values())))
    for m in mods:
        importlib.import_module(m)


def find_class(name: str, kind: Optional[str] = None) -> Any:
    """Resolve a component by name.

    Accepts our short names ("DNN", "DLA"), our dotted names
    ("ultra_pytorch_tpu.models.DNN"), and reference-style dotted names
    ("ultra.ranking_model.DNN") via the alias table.
    """
    _ensure_loaded(kind)
    if name in _ALIASES:
        kind_, short = _ALIASES[name].split(":", 1)
        return _REGISTRY[kind_][short]
    short = name.rsplit(".", 1)[-1]
    kinds = [kind] if kind else list(_REGISTRY)
    for k in kinds:
        if short in _REGISTRY.get(k, {}):
            return _REGISTRY[k][short]
    raise KeyError(f"Unknown component {name!r} (kind={kind})")


def list_available(kind: str) -> List[str]:
    """List registered implementation names for a component kind
    (mirrors the per-package ``list_available()`` of the reference,
    e.g. ``ultra/learning_algorithm/__init__.py:17-20``)."""
    _ensure_loaded(kind)
    return sorted(_REGISTRY.get(kind, {}))
