"""Config system with recursive ``base_config`` YAML inheritance.

Semantics match the reference's live config loader (``utils/hparams_v2.py:7-46``):

- ``load_config``: YAML file with an optional single-parent ``base_config`` key;
  the child's keys shallow-override the parent's.
- ``set_hparams``: resolves ``checkpoints/{exp}/{task}/config.yaml`` when no
  explicit config is given (enables "config-free" inference from a work dir),
  stamps ``task`` / ``exp_name`` / ``work_dir``, and persists the merged config
  into the work dir.

Key names are kept identical to the reference so its YAML configs work
unchanged. Additionally supports dotted-path overrides ("a=1,b.c=2"), the one
useful feature of the reference's legacy v1 system (``utils/hparams.py:51-90``).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import yaml

# Global singleton, like the reference's `utils.hparams_v2.hparams`.
hparams: Dict[str, Any] = {}

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
BASE_CONFIG_PATH = os.path.join(_PKG_DIR, "assets", "base_config.yaml")


def load_config(config_fn: str) -> Dict[str, Any]:
    """Load a YAML config, recursively merging its ``base_config`` parent."""
    with open(config_fn) as f:
        _hparams = yaml.safe_load(f) or {}
    base = _hparams.get("base_config", "")
    if isinstance(base, (list, tuple)):
        # legacy v1 multi-parent DFS (``utils/hparams.py:51-90``): later
        # parents override earlier ones, the child overrides all
        merged: Dict[str, Any] = {}
        for b in base:
            merged.update(load_config(_resolve_base_path(config_fn, b)))
        merged.update({k: v for k, v in _hparams.items() if k != "base_config"})
        return merged
    if base:
        base_hparams = load_config(_resolve_base_path(config_fn, base))
        base_hparams.update(_hparams)
        _hparams = base_hparams
    return _hparams


def _resolve_base_path(config_fn: str, base: str) -> str:
    if base in ("base", "builtin"):
        return BASE_CONFIG_PATH
    if not os.path.isabs(base) and not os.path.exists(base):
        # resolve relative to the including file, then cwd
        cand = os.path.join(os.path.dirname(config_fn), base)
        return cand if os.path.exists(cand) else base
    return base


def load_base_config() -> Dict[str, Any]:
    """The built-in defaults (mirrors ``handler/base_config.yaml``)."""
    with open(BASE_CONFIG_PATH) as f:
        return yaml.safe_load(f)


def apply_overrides(cfg: Dict[str, Any], overrides: str) -> Dict[str, Any]:
    """Apply ``"a=1,b.c=2"``-style dotted overrides in place."""
    if not overrides:
        return cfg
    for item in overrides.split(","):
        item = item.strip()
        if not item:
            continue
        key, _, raw = item.partition("=")
        node = cfg
        parts = key.strip().split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = yaml.safe_load(raw) if raw != "" else None
    return cfg


def set_hparams(
    config_fn: Optional[str] = None,
    exp_name: Optional[str] = None,
    task: Optional[str] = None,
    global_hparams: bool = True,
    make_work_dir: bool = True,
    overrides: str = "",
    checkpoints_root: str = "checkpoints",
    verbose: bool = False,
) -> Dict[str, Any]:
    """Resolve + load the experiment config; mirror of ``hparams_v2.set_hparams``."""
    global hparams
    if config_fn is None or not os.path.exists(config_fn):
        assert task is not None, "You should at least provide config or task"
        config_fn = checkpoints_root
        if exp_name is not None:
            config_fn = os.path.join(config_fn, exp_name)
        config_fn = os.path.join(config_fn, task, "config.yaml")
    assert os.path.exists(config_fn), f"Config file not found: {config_fn}"

    _hparams = load_config(config_fn)
    apply_overrides(_hparams, overrides)

    _hparams["task"] = task
    if exp_name is not None:
        _hparams["exp_name"] = exp_name
        _hparams["work_dir"] = os.path.join(checkpoints_root, exp_name, task or "")
    else:
        _hparams["work_dir"] = os.path.join(checkpoints_root, task or "")
    if make_work_dir:
        os.makedirs(_hparams["work_dir"], exist_ok=True)
        with open(os.path.join(_hparams["work_dir"], "config.yaml"), "w") as f:
            yaml.dump(_hparams, f)

    if global_hparams:
        hparams.clear()
        hparams.update(_hparams)
        if verbose:
            for k in sorted(_hparams):
                print(f"{k}: {_hparams[k]}")
    return _hparams
