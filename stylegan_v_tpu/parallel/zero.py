"""ZeRO-1 optimizer-state sharding over the data axis.

The reference replicates ALL training state per GPU (DDP,
reference train.py:359-366, training_loop.py:226-232) — Adam moments alone
are 2x the parameter memory. On a TPU mesh the moments can instead be
PARTITIONED across the 'data' axis: each chip stores and updates 1/N of
every moment tensor, and XLA turns the parameter update into
update-shard + all-gather, riding ICI (the classic ZeRO stage-1 layout,
expressed purely as shardings — no manual collectives).

Per-leaf layout rule: shard the LARGEST axis divisible by the data-axis
size (conv kernels HWIO shard O; biases/scalars or awkward shapes stay
replicated). This keeps every shard a contiguous slice with no padding and
degrades gracefully — a leaf that cannot split evenly just stays
replicated.

Enable with TrainingConfig(zero1=True); exercised on the virtual 8-device
mesh by tests/test_zero1.py and __graft_entry__.dryrun_multichip.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _moment_spec(x, ndata: int) -> P:
    ndim = getattr(x, "ndim", 0)
    if ndim == 0 or ndata <= 1:
        return P()
    cands = [i for i in range(ndim) if x.shape[i] % ndata == 0
             and x.shape[i] >= ndata]
    if not cands:
        return P()
    ax = max(cands, key=lambda i: x.shape[i])
    spec = [None] * ndim
    spec[ax] = "data"
    return P(*spec)


def zero1_state_sharding(mesh: Mesh, state):
    """A sharding pytree (same structure as `state`): params, EMA and loop
    scalars replicated; optimizer-state leaves (Adam mu/nu) sharded along
    their largest data-divisible axis."""
    ndata = mesh.shape["data"]
    rep = NamedSharding(mesh, P())

    def shard_opt(tree):
        return jax.tree_util.tree_map(
            lambda x: NamedSharding(mesh, _moment_spec(x, ndata)), tree)

    shardings = jax.tree_util.tree_map(lambda _: rep, state)
    return shardings.replace(opt_G=shard_opt(state.opt_G),
                             opt_D=shard_opt(state.opt_D))


def opt_state_bytes_per_device(state) -> int:
    """Sum of per-device bytes actually resident for the optimizer state
    (diagnostic for the ZeRO-1 memory win)."""
    total = 0
    for leaf in jax.tree_util.tree_leaves((state.opt_G, state.opt_D)):
        if hasattr(leaf, "addressable_shards") and leaf.addressable_shards:
            sh = leaf.addressable_shards[0]
            total += sh.data.size * sh.data.dtype.itemsize
        elif hasattr(leaf, "nbytes"):
            total += leaf.nbytes
    return total
