"""Model summary + replicated-state consistency checking.

  * print_module_summary — parameter/shape table for a flax variable tree
    (reference torch_utils/misc.py:193-272's startup wiring check);
  * check_replica_consistency — compares pytree content hashes across hosts
    before checkpointing, the sharded-jit analog of the reference's DDP
    broadcast-and-compare (reference misc.py:179-188, training_loop.py:487-492).
"""
from __future__ import annotations

import hashlib
import re
from typing import Any, Dict, List, Optional

import numpy as np


def module_summary_rows(variables: Dict[str, Any]) -> List[Dict]:
    import jax
    rows = []
    for coll, tree in variables.items():
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        for path, leaf in flat:
            name = "/".join(getattr(p, "key", str(p)) for p in path)
            rows.append(dict(collection=coll, name=name,
                             shape=tuple(np.shape(leaf)),
                             params=int(np.prod(np.shape(leaf)))))
    return rows


def print_module_summary(variables: Dict[str, Any], title: str = "Module",
                         max_rows: int = 200, log=print) -> int:
    """Print the parameter table; returns total parameter count."""
    rows = module_summary_rows(variables)
    total = sum(r["params"] for r in rows if r["collection"] == "params")
    if max_rows <= 0:      # summary line only
        log(f"{title}: {total / 1e6:.2f}M parameters in {len(rows)} tensors")
        return total
    w = max((len(r["name"]) for r in rows), default=10) + 2
    log(f"\n{title}  —  {total / 1e6:.2f}M parameters")
    log(f"{'Name':<{w}}{'Shape':<24}{'Params':>12}  Collection")
    log("-" * (w + 48))
    for r in rows[:max_rows]:
        log(f"{r['name']:<{w}}{str(r['shape']):<24}{r['params']:>12,}  "
            f"{r['collection']}")
    if len(rows) > max_rows:
        log(f"... ({len(rows) - max_rows} more rows)")
    log("-" * (w + 48))
    log(f"{'Total':<{w}}{'':<24}{total:>12,}")
    return total


def activation_summary_rows(module, variables, *args, method=None,
                            **kwargs) -> List[Dict]:
    """Per-module OUTPUT shapes from a dummy forward (the reference's
    print_module_summary hook pass, torch_utils/misc.py:193-272), computed
    with jax.eval_shape + flax capture_intermediates — abstract tracing
    only, no FLOPs, no device memory."""
    import jax

    def run(*a):
        _, mods = module.apply(variables, *a, capture_intermediates=True,
                               mutable="intermediates", method=method,
                               **kwargs)
        return mods["intermediates"]

    inter = jax.eval_shape(run, *args)
    rows = []
    flat = jax.tree_util.tree_flatten_with_path(
        inter, is_leaf=lambda x: isinstance(x, tuple))[0]
    for path, leaf in flat:
        name = "/".join(getattr(p, "key", str(p)) for p in path
                        if getattr(p, "key", None) != "__call__")
        outs = leaf if isinstance(leaf, tuple) else (leaf,)
        for o in outs:
            rows.append(dict(name=name or "(root)",
                             shape=tuple(getattr(o, "shape", ())),
                             dtype=str(getattr(o, "dtype", "?"))))
    return rows


def print_activation_summary(module, variables, *args, title: str = "Module",
                             log=print, method=None, **kwargs) -> List[Dict]:
    """Print the per-module output-shape table for a dummy forward."""
    rows = activation_summary_rows(module, variables, *args, method=method,
                                   **kwargs)
    w = max((len(r["name"]) for r in rows), default=10) + 2
    log(f"\n{title} activations (dummy forward)")
    log(f"{'Module':<{w}}{'Output shape':<26}Dtype")
    log("-" * (w + 36))
    for r in rows:
        log(f"{r['name']:<{w}}{str(r['shape']):<26}{r['dtype']}")
    log("-" * (w + 36))
    return rows


def tree_content_hash(tree, ignore_regex: Optional[str] = None) -> str:
    """Deterministic md5 over all leaves (sorted by path)."""
    import jax
    pat = re.compile(ignore_regex) if ignore_regex else None
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    h = hashlib.md5()
    for path, leaf in sorted(flat, key=lambda kv: str(kv[0])):
        name = str(path)
        if pat and pat.search(name):
            continue
        h.update(name.encode())
        h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
    return h.hexdigest()


def check_replica_consistency(tree, ignore_regex: Optional[str] = None) -> bool:
    """All hosts must hold identical replicated state (call before
    checkpointing). Single-process: trivially true. Multi-process: hashes are
    exchanged via multihost_utils; raises on divergence.

    Leaves that are NOT fully replicated (e.g. ZeRO-1-partitioned optimizer
    moments) are skipped: they are shard-local by construction and not even
    host-addressable in full. `ignore_regex` filters leaf paths like the
    reference's ignore list for legitimately-divergent buffers
    (reference misc.py:179-188)."""
    import jax
    if jax.process_count() == 1:
        return True
    from jax.experimental import multihost_utils
    import jax.numpy as jnp

    def _replicated(leaf):
        keep = (not hasattr(leaf, "is_fully_replicated")
                or leaf.is_fully_replicated)
        return leaf if keep else None      # None subtrees drop out of flatten

    digest = tree_content_hash(jax.tree_util.tree_map(_replicated, tree),
                               ignore_regex)
    local = jnp.asarray(np.frombuffer(bytes.fromhex(digest), dtype=np.uint8))
    gathered = multihost_utils.process_allgather(local)
    same = bool((gathered == gathered[0]).all())
    if not same:
        raise RuntimeError(
            "Replicated training state diverged across hosts "
            "(the sharded-jit analog of check_ddp_consistency failing)")
    return True
