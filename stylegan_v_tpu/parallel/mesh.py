"""Device mesh + sharding helpers.

Replaces the reference's per-process DDP/NCCL stack (reference train.py:359-366,
training_loop.py:226-232, misc.py:167-188): one sharded jit program over a
`jax.sharding.Mesh`; gradient all-reduce, stat sync and replica consistency
are XLA collectives inserted by sharding propagation, riding ICI.

Mesh axes:
  * 'data'  — batch (videos) axis; the reference's only parallelism (DP).
  * 'frame' — optional frame/sequence axis for synthesis/eval sharding: frames
    are independent given (ws, motion codes), making this the natural
    context-parallel analog (SURVEY.md §5.7).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(devices: Optional[Sequence] = None, data: Optional[int] = None,
                frame: int = 1) -> Mesh:
    """Build a (data, frame) mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // frame
    assert data * frame == n, f"{data}x{frame} mesh != {n} devices"
    dev_array = np.asarray(devices).reshape(data, frame)
    return Mesh(dev_array, axis_names=("data", "frame"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding for [B, ...] arrays."""
    return NamedSharding(mesh, P("data"))


def constrain_data_axis(x: jax.Array, axis: str = "data") -> jax.Array:
    """Pin dim0 (batch) of `x` to the mesh `axis`; no-op without a mesh.

    Model code calls this at batch-reshape boundaries the SPMD partitioner
    cannot track (the D frame-fusion [B*F,...]→[B,...,F*C] and epilogue
    flatten — reference topology networks.py:659-662): without the pin, the
    partitioner resolves the second-order R1 path through these reshapes by
    involuntary full rematerialization (replicate-then-reshard) on every Dr1
    step. Resolution is trace-time via the ambient abstract mesh
    (`jax.sharding.use_abstract_mesh`), so the model stays mesh-agnostic and
    single-chip programs are untouched.
    """
    try:
        am = jax.sharding.get_abstract_mesh()
    except Exception:
        return x
    if am is None or axis not in getattr(am, "axis_names", ()):
        return x
    if dict(am.shape).get(axis, 1) <= 1:
        return x
    return jax.lax.with_sharding_constraint(x, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree of [B, ...] arrays sharded on the data axis.

    Single-process: device_put with the sharding. Multi-process: each host
    holds its LOCAL batch shard (the loader is rank-strided, reference
    misc.py:136 semantics) and the global array is assembled across hosts.
    """
    s = data_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
    from jax import make_array_from_process_local_data
    return jax.tree_util.tree_map(
        lambda x: make_array_from_process_local_data(s, x), batch)


def initialize_multihost() -> bool:
    """Initialize jax.distributed when running under a multi-host TPU pod
    (the replacement for torch.distributed NCCL init, reference
    train.py:359-366). Controlled by standard JAX env vars
    (COORDINATOR_ADDRESS etc.); no-op single-host."""
    import os
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
            "COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        return True
    return False
