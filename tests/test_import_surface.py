"""Package import-surface completeness.

Round-4 shipped `functions/reproject.py` without adding it to
`functions/__init__.py.__all__`, so `pygridmap_spark.functions.reproject`
raised AttributeError unless imported explicitly (VERDICT r4 "What's
wrong" #1). This test walks the package tree and pins the contract:

- every .py module under pygridmap_spark/ is reachable as an attribute of
  its parent package (eagerly or via a module __getattr__),
- every subpackage is listed in its parent's __all__,
- every name in every __all__ resolves.
"""

from __future__ import annotations

import importlib
import pkgutil

import pygridmap_spark


def _walk(pkg):
    for info in pkgutil.iter_modules(pkg.__path__):
        yield pkg, info.name, info.ispkg


def test_every_module_exported_and_resolvable():
    stack = [pygridmap_spark]
    while stack:
        pkg = stack.pop()
        exported = set(getattr(pkg, "__all__", ()))
        for parent, name, ispkg in _walk(pkg):
            if name.startswith("_"):
                continue
            # reachable as an attribute (triggers lazy __getattr__ too)
            mod = getattr(parent, name, None)
            assert mod is not None, f"{parent.__name__}.{name} not reachable"
            # listed in the parent's __all__
            assert name in exported, f"{name!r} missing from {parent.__name__}.__all__"
            if ispkg:
                stack.append(importlib.import_module(f"{parent.__name__}.{name}"))


def test_all_names_resolve():
    stack = [pygridmap_spark]
    seen = set()
    while stack:
        pkg = stack.pop()
        if pkg.__name__ in seen:
            continue
        seen.add(pkg.__name__)
        for name in getattr(pkg, "__all__", ()):
            obj = getattr(pkg, name)  # AttributeError == failure
            if hasattr(obj, "__path__"):
                stack.append(obj)
