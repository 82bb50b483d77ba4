"""Generate per-package parameter reference docs.

Equivalent of the reference's ``parameter_readme_generator.py`` scripts
(ref e.g. ``ultra/ranking_model/parameter_readme_generator.py:14-22``:
introspect ``list_available()`` + docstrings -> README.rst); here one
generator walks the component registry and emits a README.md per package
listing every implementation, its docstring summary, and its default
hyperparameters.

Usage: python tools/gen_parameter_readmes.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KIND_PACKAGES = {
    "ranker": "ultra_pytorch_tpu/models",
    "algorithm": "ultra_pytorch_tpu/algorithms",
    "feed": "ultra_pytorch_tpu/input_layer",
}

KIND_TITLES = {
    "ranker": "Ranking models",
    "algorithm": "Learning algorithms",
    "feed": "Input feeds",
}


def default_hparams_of(cls):
    try:
        inst = object.__new__(cls)
        return cls.default_hparams(inst)
    except Exception:
        return {}


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from ultra_pytorch_tpu.utils import registry

    for kind, package in KIND_PACKAGES.items():
        registry._ensure_loaded(kind)
        names = registry.list_available(kind)
        lines = [f"# {KIND_TITLES[kind]}", ""]
        lines.append(
            "Auto-generated parameter reference "
            "(`python tools/gen_parameter_readmes.py`). Components are "
            "selected by name in the experiment JSON; reference-style "
            "dotted names (`ultra.*`) are accepted aliases.")
        lines.append("")
        for name in names:
            cls = registry.find_class(name, kind=kind)
            doc = (cls.__doc__ or "").strip()
            if not doc:
                import importlib
                mod = importlib.import_module(cls.__module__)
                doc = (mod.__doc__ or "").strip()
            summary = doc.splitlines()[0] if doc else ""
            lines.append(f"## {name}")
            lines.append("")
            if summary:
                lines.append(summary)
                lines.append("")
            hps = default_hparams_of(cls)
            if hps:
                lines.append("| hyperparameter | default |")
                lines.append("|---|---|")
                for k, v in hps.items():
                    lines.append(f"| `{k}` | `{v!r}` |")
                lines.append("")
        out = os.path.join(package, "README.md")
        with open(out, "w") as fout:
            fout.write("\n".join(lines) + "\n")
        print(out)


if __name__ == "__main__":
    main()
