"""Declarative pipeline configuration — the TPU framework's replacement for
the SRRG2 property/config plug-in system (SURVEY.md §5 'Config/flag system';
reference surface: PARAM macros with docstrings/defaults, BOSS text files with
#id/#pointer object graphs, ``ConfigurableManager`` named-object creation and
round-trip, default-config generation — apps/slam_app.cpp:40-46,87-167,
configurations/stage_segway_double_config_LASER_0.json).

Design: pipeline components are frozen dataclasses (jit-static); this module
adds (1) a class registry keyed by class name, (2) JSON serialization of
object graphs with ``#id``/``#pointer`` references and optional instance
names, (3) ``ConfigManager`` with create/get_by_name/read/write, and (4) a
``describe`` introspection that lists every parameter with type, default and
docstring — the PARAM docs equivalent.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any

_REGISTRY: dict[str, type] = {}
_FIELD_DOCS: dict[str, dict[str, str]] = {}


def register(cls: type, docs: dict[str, str] | None = None) -> type:
    """Register a dataclass as a configurable component type."""
    _REGISTRY[cls.__name__] = cls
    if docs:
        _FIELD_DOCS[cls.__name__] = docs
    return cls


def registry() -> dict[str, type]:
    return dict(_REGISTRY)


def describe(cls_or_name) -> list[dict]:
    """Parameter sheet: name, type, default, doc for every field."""
    cls = _REGISTRY[cls_or_name] if isinstance(cls_or_name, str) else cls_or_name
    docs = _FIELD_DOCS.get(cls.__name__, {})
    out = []
    for f in dataclasses.fields(cls):
        default: Any = f.default
        if default is dataclasses.MISSING and f.default_factory is not dataclasses.MISSING:
            default = f.default_factory()
        out.append(
            {
                "name": f.name,
                "type": getattr(f.type, "__name__", str(f.type)),
                "default": default,
                "doc": docs.get(f.name, ""),
            }
        )
    return out


def _is_component(obj) -> bool:
    return dataclasses.is_dataclass(obj) and type(obj).__name__ in _REGISTRY


class ConfigManager:
    """Named-object manager with BOSS-style object-graph round-trip."""

    def __init__(self):
        self._objects: dict[int, Any] = {}   # id -> object
        self._names: dict[str, int] = {}     # name -> id
        self._next_id = 1

    # -- creation ------------------------------------------------------------
    def create(self, class_name: str, name: str | None = None, **overrides):
        cls = _REGISTRY[class_name]
        obj = cls(**overrides)
        return self.add(obj, name)

    def add(self, obj, name: str | None = None):
        oid = self._next_id
        self._next_id += 1
        self._objects[oid] = obj
        if name:
            self._names[name] = oid
        return obj

    def get_by_name(self, name: str):
        oid = self._names.get(name)
        return self._objects.get(oid) if oid is not None else None

    def objects(self):
        return list(self._objects.values())

    # -- serialization -------------------------------------------------------
    def write(self, path: str) -> None:
        """Serialize the whole object graph (nested components become
        #pointer references, exactly once per distinct object)."""
        ids: dict[int, int] = {}  # python id -> #id
        entries: list[dict] = []

        def assign(obj):
            key = id(obj)
            if key in ids:
                return ids[key]
            oid = len(entries) + 1
            ids[key] = oid
            entry = {"#id": oid, "#class": type(obj).__name__}
            entries.append(entry)
            for f in dataclasses.fields(obj):
                v = getattr(obj, f.name)
                entry[f.name] = encode(v)
            return oid

        def encode(v):
            if _is_component(v):
                return {"#pointer": assign(v)}
            if isinstance(v, tuple) and hasattr(v, "_fields"):
                # NamedTuple component (e.g. PolarProjection intrinsics)
                return {
                    "#namedtuple": type(v).__name__,
                    "values": {k: encode(x) for k, x in zip(v._fields, v)},
                }
            if isinstance(v, tuple):
                return list(v)
            if isinstance(v, (list, dict, str, int, float, bool)) or v is None:
                return v
            if hasattr(v, "item"):
                return v.item()
            raise TypeError(f"unserializable config value {v!r}")

        roots = {}
        for name, oid_local in self._names.items():
            roots[name] = assign(self._objects[oid_local])
        for obj in self._objects.values():
            assign(obj)

        with open(path, "w") as f:
            json.dump({"objects": entries, "names": roots}, f, indent=1)

    @classmethod
    def read(cls, path: str) -> "ConfigManager":
        with open(path) as f:
            data = json.load(f)
        mgr = cls()
        raw = {e["#id"]: e for e in data["objects"]}
        built: dict[int, Any] = {}

        def build(oid: int):
            if oid in built:
                return built[oid]
            e = raw[oid]
            klass = _REGISTRY[e["#class"]]
            kwargs = {}
            field_types = {f.name: f for f in dataclasses.fields(klass)}
            for k, v in e.items():
                if k.startswith("#") or k not in field_types:
                    continue
                kwargs[k] = decode(v, field_types[k])
            obj = klass(**kwargs)
            built[oid] = obj
            return obj

        def decode(v, field):
            if isinstance(v, dict) and "#pointer" in v:
                return build(v["#pointer"])
            if isinstance(v, dict) and "#namedtuple" in v:
                nt_cls = _REGISTRY[v["#namedtuple"]]
                return nt_cls(**{k: decode(x, field) for k, x in v["values"].items()})
            if isinstance(v, list):
                # dataclass fields declared as tuples round-trip as tuples
                if "tuple" in str(field.type).lower() or isinstance(field.default, tuple):
                    return tuple(v)
                return v
            return v

        for oid in raw:
            build(oid)
        for obj in built.values():
            mgr.add(obj)
        for name, oid in data.get("names", {}).items():
            mgr._names[name] = [
                k for k, o in mgr._objects.items() if o is built[oid]
            ][0]
        return mgr
