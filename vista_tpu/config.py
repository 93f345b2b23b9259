"""Typed config system: YAML <-> nested frozen dataclasses.

Replaces the reference's OmegaConf ``target:``-string object graph
(vwm/util.py instantiate_from_config — arbitrary import-path eval) with a
*typed registry*: YAML keys map onto the framework's dataclass configs, so a
config is validated at load time and cannot execute arbitrary code. Supports
the reference workflow's essentials: multi-file merge (left-to-right) and
``a.b.c=value`` dotlist overrides (train.py:600-602).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, List, Optional, Sequence, Type, TypeVar

T = TypeVar("T")


def _convert(value, field_type):
    """Best-effort structural conversion of YAML scalars/containers."""
    import typing

    origin = typing.get_origin(field_type)
    if dataclasses.is_dataclass(field_type) and isinstance(value, dict):
        return from_dict(field_type, value)
    if origin in (tuple, Sequence) and isinstance(value, (list, tuple)):
        args = typing.get_args(field_type)
        if args and args[-1] is Ellipsis:
            return tuple(_convert(v, args[0]) for v in value)
        if args and len(args) == len(value):
            return tuple(_convert(v, a) for v, a in zip(value, args))
        return tuple(value)
    if origin is typing.Union:  # Optional[...]
        for a in typing.get_args(field_type):
            if a is type(None):
                continue
            try:
                return _convert(value, a)
            except (TypeError, ValueError):
                continue
        return value
    if field_type in (int, float, str, bool) and value is not None:
        return field_type(value)
    if origin is frozenset and isinstance(value, (list, tuple, set)):
        return frozenset(value)
    return value


def from_dict(cls: Type[T], data: Dict[str, Any]) -> T:
    """Build a (nested) dataclass from a plain dict; unknown keys error."""
    fields = {f.name: f for f in dataclasses.fields(cls)}
    unknown = set(data) - set(fields)
    if unknown:
        raise KeyError(f"{cls.__name__}: unknown config keys {sorted(unknown)}")
    kwargs = {}
    for name, value in data.items():
        f = fields[name]
        ftype = f.type
        if isinstance(ftype, str):  # postponed annotations
            import typing
            ftype = typing.get_type_hints(cls).get(name, Any)
        kwargs[name] = _convert(value, ftype)
    return cls(**kwargs)


def to_dict(cfg) -> Dict[str, Any]:
    """Dataclass -> plain JSON/YAML-safe dict."""
    if dataclasses.is_dataclass(cfg):
        return {f.name: to_dict(getattr(cfg, f.name)) for f in dataclasses.fields(cfg)}
    if isinstance(cfg, (tuple, list)):
        return [to_dict(v) for v in cfg]
    if isinstance(cfg, frozenset):
        return sorted(cfg)
    return cfg


def _deep_merge(base: Dict, extra: Dict) -> Dict:
    out = dict(base)
    for k, v in extra.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _parse_scalar(s: str):
    try:
        return json.loads(s)
    except (json.JSONDecodeError, ValueError):
        return s


def apply_overrides(data: Dict, overrides: Sequence[str]) -> Dict:
    """Apply ``a.b.c=value`` dotlist overrides."""
    out = json.loads(json.dumps(data))
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override {ov!r} must be key=value")
        key, _, value = ov.partition("=")
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _parse_scalar(value)
    return out


def load_config(
    cls: Type[T],
    paths: Sequence[str] = (),
    overrides: Sequence[str] = (),
    base: Optional[Dict] = None,
) -> T:
    """Merge YAML files left-to-right, apply dotlist overrides, build cls."""
    import yaml

    data: Dict = dict(base or {})
    for p in paths:
        with open(p) as f:
            data = _deep_merge(data, yaml.safe_load(f) or {})
    data = apply_overrides(data, overrides)
    return from_dict(cls, data)


def save_config(cfg, path: str) -> None:
    import yaml

    with open(path, "w") as f:
        yaml.safe_dump(to_dict(cfg), f, sort_keys=False)
