"""Minimal Hydra-compatible config system.

The reference uses Hydra 1.3 + OmegaConf (``core_exp_runner.py:259``,
``configs/nerf.yaml``); neither is in this image, so this module reimplements
the slice of behavior the CLI surface needs:

- a root YAML under ``configs/`` selected by ``--config-name``,
- a ``defaults`` list composing group files (``- device: local`` loads
  ``configs/device/local.yaml`` under key ``device``; ``- _self_`` keeps the
  root's own keys winning),
- dotted CLI overrides (``dataset.image_path=... mode=render_dense``) with
  YAML-typed values,
- attribute + item access, ``in`` support, and round-trip ``to_yaml``.
"""

from __future__ import annotations

import copy
import os

import yaml


class Config(dict):
    """Nested dict with attribute access."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    @staticmethod
    def wrap(obj):
        if isinstance(obj, dict):
            return Config({k: Config.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [Config.wrap(v) for v in obj]
        return obj

    def to_dict(self):
        def unwrap(o):
            if isinstance(o, dict):
                return {k: unwrap(v) for k, v in o.items()}
            if isinstance(o, list):
                return [unwrap(v) for v in o]
            return o
        return unwrap(self)

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)

    def get_path(self, dotted: str, default=None):
        node = self
        for part in dotted.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node


def _deep_merge(base: dict, extra: dict) -> dict:
    out = copy.deepcopy(base)
    for k, v in extra.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _set_dotted(cfg: dict, dotted: str, value):
    parts = dotted.split(".")
    node = cfg
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def load_config(config_dir: str, config_name: str,
                overrides=()) -> Config:
    root_path = os.path.join(config_dir, config_name + ".yaml")
    with open(root_path) as f:
        root = yaml.safe_load(f) or {}

    defaults = root.pop("defaults", [])
    cfg: dict = {}
    self_merged = False
    for entry in defaults:
        if entry == "_self_":
            cfg = _deep_merge(cfg, root)
            self_merged = True
            continue
        assert isinstance(entry, dict) and len(entry) == 1, entry
        (group, name), = entry.items()
        path = os.path.join(config_dir, group, f"{name}.yaml")
        with open(path) as f:
            cfg = _deep_merge(cfg, {group: yaml.safe_load(f) or {}})
    if not self_merged:
        cfg = _deep_merge(cfg, root)

    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override {ov!r} must be key=value")
        key, _, raw = ov.partition("=")
        _set_dotted(cfg, key.strip(), yaml.safe_load(raw))

    return Config.wrap(cfg)
