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

    def delete_dotted(self, dotted_key: str) -> None:
        node: Any = self
        parts = dotted_key.split(".")
        for part in parts[:-1]:
            if not isinstance(node, dict) or part not in node:
                return
            node = node[part]
        if isinstance(node, dict):
            node.pop(parts[-1], None)

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
    """Parse an override value with Hydra's grammar, not raw YAML 1.1:
    ints, floats INCLUDING scientific notation (yaml.safe_load parses
    '1e-3' as the string '1e-3' and would hand optax a str learning
    rate), true/false/null literals, and yaml for [..]/{..} structures.
    YAML 1.1-isms like on/off→bool and sexagesimal '3:04'→184 stay
    plain strings, matching Hydra."""
    s = text.strip()
    low = s.lower()
    if low in ("true", "false"):
        return low == "true"
    if low in ("null", "none", "~"):
        return None
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    if s[:1] in ("[", "{") or s[:1] in ("'", '"'):
        try:
            return yaml.safe_load(s)
        except yaml.YAMLError:
            return text
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
    (add-new-key) is accepted and ignored; a leading ``~`` DELETES the key
    (``~key`` or ``~key=value``, Hydra semantics); a dotless
    ``group=name`` whose ``{config_dir}/{group}/{name}.yaml`` exists is a
    GROUP SELECTION and composes that file (it previously clobbered the
    composed group dict with the bare string).
    """
    config_dir = Path(config_dir)
    if not config_dir.is_absolute() and not config_dir.exists():
        # @hydra.main resolves config_path against the entry script's
        # directory, not the CWD — mirror that so
        # `cd /tmp && python /root/repo/train_kge.py` works
        script_dir = Path(sys.argv[0]).resolve().parent
        if (script_dir / config_dir).exists():
            config_dir = script_dir / config_dir
    cfg = _compose_file(config_dir / f"{config_name}.yaml")
    for override in overrides or []:
        if override.startswith("~"):
            cfg.delete_dotted(override[1:].partition("=")[0])
            continue
        if "=" not in override:
            raise ValueError(f"Malformed override (expected key=value): {override!r}")
        key, _, value = override.partition("=")
        key = key.lstrip("+")
        if "." not in key and isinstance(value, str) \
                and (config_dir / key / f"{value}.yaml").exists():
            # Hydra REPLACES the group choice (stale keys from the
            # default group must not linger)
            cfg[key] = _compose_file(config_dir / key / f"{value}.yaml")
            continue
        cfg.set_dotted(key, _parse_value(value))
    return cfg


def cli_overrides(argv: Optional[List[str]] = None) -> List[str]:
    """Extract ``key=value`` (and bare ``~key`` delete) overrides from
    argv, skipping flags."""
    argv = sys.argv[1:] if argv is None else argv
    return [a for a in argv
            if ("=" in a or a.startswith("~")) and not a.startswith("--")]


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
