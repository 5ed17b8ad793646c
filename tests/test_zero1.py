"""ZeRO-1 optimizer-state sharding (parallel/zero.py): the Adam moments
partition across the 8-device 'data' axis, per-device optimizer memory
drops accordingly, and the training math is unchanged vs the replicated
layout. No reference counterpart (DDP replicates all state per GPU,
reference train.py:359-366) — this is TPU-mesh-native scaling headroom."""
import numpy as np
import jax
import jax.numpy as jnp

from stylegan_v_tpu.models import Discriminator, Generator
from stylegan_v_tpu.training import (
    LossConfig, OptimizerConfig, TrainingConfig, init_train_state,
    make_train_step,
)
from stylegan_v_tpu.parallel import (
    create_mesh, opt_state_bytes_per_device, replicated_sharding, shard_batch,
    zero1_state_sharding,
)
from test_models import small_disc_cfg, small_gen_cfg
from test_train_step import make_batch


def _run(n_steps, state_sharding_fn):
    G = Generator(small_gen_cfg())
    D = Discriminator(small_disc_cfg())
    tcfg = TrainingConfig(batch_size=8, ema_kimg=1.0, ada_target=0.6)
    lcfg = LossConfig(r1_gamma=1.0, pl_weight=0.0)
    mesh = create_mesh(frame=1)
    state = init_train_state(jax.random.PRNGKey(0), G, D,
                             OptimizerConfig(), OptimizerConfig(), tcfg)
    sharding = state_sharding_fn(mesh, state)
    state = jax.device_put(state, sharding)
    step = make_train_step(
        G, D, lcfg, OptimizerConfig(), OptimizerConfig(), tcfg, donate=False,
        state_sharding=None if state_sharding_fn is _replicated else sharding)
    for i in range(n_steps):
        batch = shard_batch(mesh, make_batch(i, B=8, F=3))
        state, stats = step(state, batch, jax.random.PRNGKey(100 + i))
        assert all(np.isfinite(float(v)) for v in stats.values())
    return mesh, state


def _replicated(mesh, state):
    return replicated_sharding(mesh)


def test_zero1_shards_moments_and_matches_replicated():
    mesh, s_rep = _run(2, _replicated)
    mesh, s_z1 = _run(2, zero1_state_sharding)

    # 1) the moments are actually partitioned: per-device bytes well below
    #    the replicated footprint (biases/scalars may stay replicated)
    b_rep = opt_state_bytes_per_device(s_rep)
    b_z1 = opt_state_bytes_per_device(s_z1)
    ndata = mesh.shape["data"]
    assert ndata == 8
    assert b_z1 < 0.35 * b_rep, (b_z1, b_rep)

    # 2) at least one moment leaf has a 1/8 shard and stays sharded AFTER
    #    the step (out_shardings pins the layout step over step)
    mu_leaves = [l for l in jax.tree_util.tree_leaves(s_z1.opt_G)
                 if hasattr(l, "sharding") and l.ndim >= 1]
    frac = [l.addressable_shards[0].data.size / l.size for l in mu_leaves]
    assert min(frac) <= 1.0 / ndata + 1e-6

    # 3) identical training math: params and EMA agree with the replicated
    #    run (same init, same rng, same batches) to reduction-order noise
    for name in ("params_G", "params_D", "params_Gema"):
        ra = jax.tree_util.tree_leaves(getattr(s_rep, name))
        za = jax.tree_util.tree_leaves(getattr(s_z1, name))
        for a, b in zip(ra, za):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(s_rep.augment_p), float(s_z1.augment_p))


def test_zero1_handles_awkward_shapes():
    """Leaves with no data-divisible axis just stay replicated — the layout
    rule must never fail, whatever the model's parameter shapes."""
    from stylegan_v_tpu.parallel.zero import _moment_spec

    class Fake:
        def __init__(self, shape):
            self.shape, self.ndim = shape, len(shape)

    assert _moment_spec(Fake(()), 8) == jax.sharding.PartitionSpec()
    assert _moment_spec(Fake((3, 3, 7, 5)), 8) == jax.sharding.PartitionSpec()
    spec = _moment_spec(Fake((3, 3, 64, 128)), 8)
    assert spec == jax.sharding.PartitionSpec(None, None, None, "data")
    # ties/competing axes: largest divisible axis wins
    spec = _moment_spec(Fake((16, 512)), 8)
    assert spec == jax.sharding.PartitionSpec(None, "data")
