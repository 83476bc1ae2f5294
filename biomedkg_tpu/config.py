"""Minimal Hydra-compatible config system (no torch / hydra / omegaconf deps).

The reference composes configs with Hydra: a root yaml with a ``defaults``
list pulling group files (``configs/data/primekg.yaml``,
``configs/model/kge.yaml``), dotted CLI overrides (``data.batch_size=64``)
and ``_target_`` instantiation of the data module
(/root/reference/train_kge.py:15-21, configs/kge.yaml:1-4,
configs/data/primekg.yaml:1). This module reimplements exactly that surface
so the reference's ``scripts/*.sh`` override vocabulary works unchanged.
"""

from __future__ import annotations

import importlib
import sys
from pathlib import Path
from typing import Any, List, Optional

import yaml


class Config(dict):
    """Dict with attribute access, nested-merge and dotted get/set."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:  # pragma: no cover - attribute protocol
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, dict) and not isinstance(value, Config):
            return Config({k: Config._wrap(v) for k, v in value.items()})
        if isinstance(value, list):
            return [Config._wrap(v) for v in value]
        return value

    def merge(self, other: dict) -> "Config":
        """Recursive in-place merge; ``other`` wins on conflicts."""
        for key, value in other.items():
            if (
                key in self
                and isinstance(self[key], dict)
                and isinstance(value, dict)
            ):
                node = self[key]
                if not isinstance(node, Config):
                    node = Config._wrap(node)
                    self[key] = node
                node.merge(value)
            else:
                self[key] = Config._wrap(value)
        return self

    def set_dotted(self, dotted_key: str, value: Any) -> None:
        node = self
        parts = dotted_key.split(".")
        for part in parts[:-1]:
            if part not in node or not isinstance(node[part], dict):
                node[part] = Config()
            node = node[part]
        node[parts[-1]] = Config._wrap(value)

    def get_dotted(self, dotted_key: str, default: Any = None) -> Any:
        node: Any = self
        for part in dotted_key.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def to_dict(self) -> dict:
        def _unwrap(value: Any) -> Any:
            if isinstance(value, dict):
                return {k: _unwrap(v) for k, v in value.items()}
            if isinstance(value, list):
                return [_unwrap(v) for v in value]
            return value

        return _unwrap(self)


def _parse_value(text: str) -> Any:
    """Parse an override value with yaml semantics (ints, floats, lists, null)."""
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


def _load_yaml(path: Path) -> Config:
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    if not isinstance(raw, dict):
        raise ValueError(f"Config file {path} must contain a mapping")
    return Config._wrap(raw)


def _compose_file(path: Path) -> Config:
    """Load one yaml file, resolving its own ``defaults`` list.

    Group-internal defaults (e.g. ``configs/model/kge.yaml`` starting with
    ``defaults: [base]``) merge the sibling file into the same node, matching
    Hydra's behavior for configs/model/base.yaml:1-4.
    """
    raw = _load_yaml(path)
    defaults = raw.pop("defaults", [])
    composed = Config()
    self_inserted = False
    for entry in defaults:
        if entry == "_self_":
            composed.merge(raw)
            self_inserted = True
        elif isinstance(entry, str):
            composed.merge(_compose_file(path.parent / f"{entry}.yaml"))
        elif isinstance(entry, dict):
            for group, name in entry.items():
                if group == "_self_":
                    continue
                sub = _compose_file(path.parent / str(group) / f"{name}.yaml")
                composed.merge(Config({group: sub}))
    if not self_inserted:
        composed.merge(raw)
    return composed


def load_config(
    config_dir: str | Path,
    config_name: str,
    overrides: Optional[List[str]] = None,
) -> Config:
    """Compose ``{config_dir}/{config_name}.yaml`` with dotted overrides.

    Override syntax matches Hydra's basic form used by the reference scripts
    (scripts/kge.sh:26-39): ``key=value`` and ``a.b=value``; a leading ``+``
    (add-new-key) is accepted and ignored.
    """
    config_dir = Path(config_dir)
    cfg = _compose_file(config_dir / f"{config_name}.yaml")
    for override in overrides or []:
        if "=" not in override:
            raise ValueError(f"Malformed override (expected key=value): {override!r}")
        key, _, value = override.partition("=")
        cfg.set_dotted(key.lstrip("+~"), _parse_value(value))
    return cfg


def cli_overrides(argv: Optional[List[str]] = None) -> List[str]:
    """Extract ``key=value`` overrides from argv (skipping flags)."""
    argv = sys.argv[1:] if argv is None else argv
    return [a for a in argv if "=" in a and not a.startswith("--")]


def instantiate(node: Config, **kwargs: Any) -> Any:
    """Instantiate the class named by ``_target_`` (Hydra-style).

    Mirrors hydra.utils.instantiate as used at reference train_kge.py:19-21.
    """
    node = Config._wrap(dict(node))
    target = node.pop("_target_")
    module_name, _, attr = target.rpartition(".")
    obj = getattr(importlib.import_module(module_name), attr)
    params = {k: v for k, v in node.items()}
    params.update(kwargs)
    return obj(**params)


def main(config_path: str, config_name: str):
    """Decorator replacing ``@hydra.main`` on the entry points.

    The wrapped function receives the composed :class:`Config`; overrides come
    from ``sys.argv`` so the reference's bash scripts work verbatim.
    """

    def decorator(fn):
        def wrapper():
            cfg = load_config(config_path, config_name, cli_overrides())
            return fn(cfg)

        wrapper.__name__ = fn.__name__
        return wrapper

    return decorator
