"""YAML config system with recursive `inherit_from` and deep merge.

Behavioral parity with the reference (/root/reference/utils/config_utils.py:
4-50): a config may name a parent via ``inherit_from``; parents load first
and children deep-merge on top. `DotDict` replaces the reference's `munch`
dependency (not available here) for attribute access.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import yaml


class DotDict(dict):
    """dict with attribute access, recursively applied."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @staticmethod
    def wrap(obj: Any) -> Any:
        if isinstance(obj, dict):
            return DotDict({k: DotDict.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [DotDict.wrap(v) for v in obj]
        return obj


def update_recursive(dict1: Dict, dict2: Dict) -> None:
    """Deep-merge dict2 into dict1 (config_utils.py:36-50 semantics)."""
    for k, v in dict2.items():
        if k not in dict1:
            dict1[k] = dict()
        if isinstance(v, dict):
            update_recursive(dict1[k], v)
        else:
            dict1[k] = v


def load_config(path: str, default_path: str | None = None) -> DotDict:
    """Load a YAML config, resolving `inherit_from` chains recursively.

    Relative `inherit_from` paths resolve against the current working
    directory (same as the reference) but also fall back to the config
    file's own directory and the repo root, so configs work from anywhere.
    """
    with open(path, "r") as f:
        cfg_special = yaml.full_load(f)

    inherit = cfg_special.get("inherit_from")
    cfg: Dict = dict()
    if inherit is not None:
        candidates = [
            inherit,
            os.path.join(os.path.dirname(os.path.abspath(path)), inherit),
            os.path.join(_repo_root(), inherit),
        ]
        for cand in candidates:
            if os.path.exists(cand):
                cfg = load_config(cand, default_path)
                break
        else:
            raise FileNotFoundError(f"inherit_from target not found: {inherit}")
    elif default_path is not None:
        with open(default_path, "r") as f:
            cfg = yaml.full_load(f)

    update_recursive(cfg, cfg_special)
    return DotDict.wrap(cfg)


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
