"""Checkpoint I/O with the reference's layout semantics.

Mirrors ``handler/train/handler.py:363-402`` + ``utils/ckpt_utils.py``:
- files named ``model_ckpt_steps_{N}.ckpt`` in the work dir
- atomic write via ``.part`` + ``os.replace``
- prune to ``num_ckpt_keep`` newest by step number
- best-checkpoint copy ``model_ckpt_best.pt`` on monitored-metric improvement
- inference loaders support nested sub-model extraction

Serialization is flax msgpack of numpy-converted pytrees — a single portable
file per step, no torch pickle.
"""

from __future__ import annotations

import glob
import os
import re
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    work_dir: str,
    step: int,
    payload: Dict[str, Any],
    num_ckpt_keep: int = 3,
) -> str:
    """payload: json-ish dict of pytrees (e.g. {'params': ..., 'opt_state': ...,
    'epoch': int, 'global_step': int, 'best': float})."""
    os.makedirs(work_dir, exist_ok=True)
    path = os.path.join(work_dir, f"model_ckpt_steps_{step}.ckpt")
    blob = serialization.msgpack_serialize(_to_numpy(payload))
    tmp = path + ".part"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    prune_checkpoints(work_dir, num_ckpt_keep)
    return path


def prune_checkpoints(work_dir: str, keep: int):
    ckpts = sorted_checkpoints(work_dir)
    for path, _ in ckpts[:-keep] if keep > 0 else []:
        os.remove(path)


def sorted_checkpoints(work_dir: str):
    """[(path, step)] sorted ascending by step."""
    out = []
    for path in glob.glob(os.path.join(work_dir, "model_ckpt_steps_*.ckpt")):
        m = re.search(r"model_ckpt_steps_(\d+)\.ckpt$", path)
        if m:
            out.append((path, int(m.group(1))))
    return sorted(out, key=lambda x: x[1])


def get_last_checkpoint_path(work_dir: str) -> Optional[str]:
    ckpts = sorted_checkpoints(work_dir)
    return ckpts[-1][0] if ckpts else None


def load_checkpoint_file(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def load_last_checkpoint(work_dir: str) -> Optional[Dict[str, Any]]:
    path = get_last_checkpoint_path(work_dir)
    return load_checkpoint_file(path) if path else None


def save_best_copy(work_dir: str, step: int):
    src = os.path.join(work_dir, f"model_ckpt_steps_{step}.ckpt")
    if os.path.exists(src):
        shutil.copy(src, os.path.join(work_dir, "model_ckpt_best.pt"))


def extract_submodel(params: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """Pull a nested sub-tree, e.g. prefix='diffusion' (cf. the reference's
    dotted-key extraction in ``utils/ckpt_utils.py:28-69``)."""
    node = params
    for part in prefix.split("."):
        if part not in node:
            raise KeyError(f"submodel prefix {prefix!r} not found at {part!r}")
        node = node[part]
    return node


def merge_subtree(target: Dict[str, Any], prefix: str, subtree: Dict[str, Any]):
    """Splice ``subtree`` into ``target`` at dotted ``prefix`` (ckpt surgery for
    ``merge_rectified``, cf. ``main.py:128-140``)."""
    node = target
    parts = prefix.split(".")
    for part in parts[:-1]:
        node = node.setdefault(part, {})
    node[parts[-1]] = subtree
    return target
