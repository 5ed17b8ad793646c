"""Checkpoint save/restore for the full TrainState.

Replaces the reference's live-module pickles (reference training_loop.py:
472-501 + torch_utils/persistence.py source-embedding) with Orbax pytree
checkpoints: instead of embedding module SOURCE in the snapshot, we embed the
model CONFIGS (the init-args capture at persistence.py:103-116 is the part
worth keeping) — a checkpoint is self-describing and restorable without the
original config files.

Layout:  <run_dir>/network-snapshot-<kimg>/   (orbax checkpoint dir)
         + meta.json with configs and counters.
Resume modes mirror the reference (train.py:283-317, training_loop.py:167-183):
  * resume='latest' scans run_dir for the newest snapshot;
  * weights-only restore copies params into a freshly-initialized state
    (transfer learning) vs whole-state restore (counters, opt, ADA p).
"""
from __future__ import annotations

import dataclasses
import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _to_pure(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _meta_encode(obj):
    if dataclasses.is_dataclass(obj):
        # NOTE: not dataclasses.asdict — it recursively flattens nested
        # dataclasses and loses their types; encode each field explicitly.
        return {"__dataclass__": type(obj).__name__,
                "fields": {f.name: _meta_encode(getattr(obj, f.name))
                           for f in dataclasses.fields(obj)}}
    if isinstance(obj, tuple):
        return [_meta_encode(v) for v in obj]
    return obj


def meta_decode(node, registry: Dict[str, Any]):
    """Inverse of _meta_encode: rebuild dataclasses via a name->class registry."""
    if isinstance(node, dict) and "__dataclass__" in node:
        cls = registry[node["__dataclass__"]]
        kw = {k: meta_decode(v, registry) for k, v in node["fields"].items()}
        import dataclasses as _dc
        names = {f.name for f in _dc.fields(cls)}
        hints = {f.name: f.type for f in _dc.fields(cls)}
        kw = {k: (tuple(v) if isinstance(v, list) else v)
              for k, v in kw.items() if k in names}
        return cls(**kw)
    if isinstance(node, dict):
        return {k: meta_decode(v, registry) for k, v in node.items()}
    return node


def save_snapshot(run_dir: str, state, cur_nimg: int, configs: Dict[str, Any],
                  extra_meta: Optional[Dict] = None) -> str:
    """Write an Orbax snapshot named by kimg (reference network-snapshot-XXXXXX)."""
    import orbax.checkpoint as ocp

    tag = f"network-snapshot-{cur_nimg // 1000:06d}"
    path = os.path.abspath(os.path.join(run_dir, tag))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, _to_pure(state), force=True)
    meta = {
        "cur_nimg": int(cur_nimg),
        "configs": {k: _meta_encode(v) for k, v in configs.items()},
    }
    if extra_meta:
        meta.update(extra_meta)
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f, indent=2, default=str)
    return path


def find_latest_snapshot(run_dir: str) -> Optional[str]:
    """resume='latest' scan (reference train.py:298-309)."""
    if not os.path.isdir(run_dir):
        return None
    pat = re.compile(r"network-snapshot-(\d+)$")
    best, best_kimg = None, -1
    for name in os.listdir(run_dir):
        m = pat.match(name)
        if m and os.path.isdir(os.path.join(run_dir, name)):
            kimg = int(m.group(1))
            if kimg > best_kimg:
                best, best_kimg = os.path.join(run_dir, name), kimg
    return best


def load_snapshot(path: str, target=None) -> Tuple[Any, Dict]:
    """Restore a snapshot pytree (+ meta). `target` optionally provides the
    pytree structure/dtypes to restore into."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)       # orbax/tensorstore rejects relative paths
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        restored = ckptr.restore(path, item=_to_pure(target))
    else:
        restored = ckptr.restore(path)
    meta = {}
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return restored, meta


def copy_params(src_tree, dst_tree, require_all: bool = False):
    """Name-matched partial parameter copy for transfer learning
    (reference misc.copy_params_and_buffers, misc.py:146-161).

    Copies leaves whose paths exist in both trees and whose shapes match;
    leaves only in dst are kept as-is (require_all=False) or error."""
    src_flat = dict(jax.tree_util.tree_flatten_with_path(src_tree)[0])
    dst_flat, treedef = jax.tree_util.tree_flatten_with_path(dst_tree)
    out = []
    for path, dst_leaf in dst_flat:
        if path in src_flat and np.shape(src_flat[path]) == np.shape(dst_leaf):
            out.append(np.asarray(src_flat[path], dtype=np.asarray(dst_leaf).dtype))
        else:
            if require_all:
                raise KeyError(f"missing parameter {path} in source checkpoint")
            out.append(dst_leaf)
    return jax.tree_util.tree_unflatten(treedef, out)
