"""Training-step tests: single-device semantics + 8-device sharded execution.

The sharded test is the JAX analog of the reference's file://-rendezvous
multi-process DDP simulation (reference train.py:359-366).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stylegan_v_tpu.models import Discriminator, Generator
from stylegan_v_tpu.training import (
    LossConfig, OptimizerConfig, TrainingConfig, init_train_state, make_train_step,
)
from stylegan_v_tpu.parallel import create_mesh, shard_batch, replicated_sharding
from test_models import small_disc_cfg, small_gen_cfg


def make_models():
    return Generator(small_gen_cfg()), Discriminator(small_disc_cfg())


def make_batch(rng, B, F, res=32, c_dim=0, n_phases=3):
    r = np.random.RandomState(rng)
    t = np.sort(r.randint(0, 60, size=(B, F)).astype(np.float32), axis=1)
    # ensure strictly increasing distinct frames
    t += np.arange(F)[None] * 0.1
    gen_t = np.stack([t + i for i in range(n_phases)], axis=1)
    return {
        "real_img": r.randint(0, 255, size=(B, F, res, res, 3)).astype(np.uint8),
        "real_c": np.zeros((B, c_dim), np.float32),
        "real_t": t,
        "gen_c": np.zeros((B, n_phases, c_dim), np.float32),
        "gen_t": gen_t.astype(np.float32),
    }


@pytest.fixture(scope="module")
def setup():
    G, D = make_models()
    tcfg = TrainingConfig(batch_size=4, ema_kimg=1.0, ada_target=0.6, ada_interval=2,
                          G_reg_interval=4, D_reg_interval=4)
    lcfg = LossConfig(r1_gamma=1.0, pl_weight=2.0, style_mixing_prob=0.9)
    state = init_train_state(jax.random.PRNGKey(0), G, D,
                             OptimizerConfig(lr=0.0025), OptimizerConfig(lr=0.002), tcfg)
    step = make_train_step(G, D, lcfg, OptimizerConfig(lr=0.0025),
                           OptimizerConfig(lr=0.002), tcfg, donate=False)
    return G, D, state, step, tcfg


def test_one_step_updates_everything(setup):
    G, D, state, step, tcfg = setup
    batch = make_batch(0, B=4, F=3)
    new_state, stats = step(state, batch, jax.random.PRNGKey(1))
    assert int(new_state.step) == 1
    assert int(new_state.cur_nimg) == tcfg.batch_size * 3
    # params moved
    dg = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                                state.params_G, new_state.params_G)
    assert max(jax.tree_util.tree_leaves(dg)) > 0
    dd = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                                state.params_D, new_state.params_D)
    assert max(jax.tree_util.tree_leaves(dd)) > 0
    # EMA moved but less than params
    assert all(np.isfinite(float(v)) for v in stats.values())
    assert "Loss/G/loss" in stats and "Loss/scores/real" in stats
    # w_avg updated
    assert float(jnp.abs(new_state.extra_G["moving"]["mapping"]["w_avg"]).sum()) > 0


def test_reg_phases_run(setup):
    G, D, state, step, tcfg = setup
    batch = make_batch(1, B=4, F=3)
    new_state, stats = step(state, batch, jax.random.PRNGKey(2),
                            do_gpl=True, do_dr1=True)
    assert "Loss/pl_penalty" in stats
    assert "Loss/r1_penalty" in stats
    assert float(new_state.pl_mean) != 0.0
    assert np.isfinite(float(stats["Loss/r1_penalty"]))


def test_ada_p_increases_on_confident_D(setup):
    """With sign(D(real)) ~ +1 > target, p must ratchet up at the interval."""
    G, D, state, step, tcfg = setup
    batch = make_batch(2, B=4, F=3)
    s = state
    p_vals = []
    for i in range(4):
        s, stats = step(s, batch, jax.random.PRNGKey(10 + i))
        p_vals.append(float(s.augment_p))
    # p only changes on interval steps
    assert p_vals[0] == 0.0
    # and the accumulator resets
    assert float(s.ada_sign_acc) == 0.0 or abs(float(s.ada_sign_acc)) < 2


def test_sharded_step_matches_replicated_math():
    """Run the identical step on an 8-device mesh; loss stats must be finite
    and state update must succeed with batch sharded on 'data'."""
    G, D = make_models()
    tcfg = TrainingConfig(batch_size=8, ada_target=0.6)
    lcfg = LossConfig(r1_gamma=1.0, pl_weight=0.0)
    state = init_train_state(jax.random.PRNGKey(0), G, D,
                             OptimizerConfig(), OptimizerConfig(), tcfg)
    step = make_train_step(G, D, lcfg, OptimizerConfig(), OptimizerConfig(), tcfg,
                           donate=False)
    mesh = create_mesh(frame=1)
    assert mesh.devices.size == 8
    batch = make_batch(3, B=8, F=3)
    sharded = shard_batch(mesh, batch)
    rep = replicated_sharding(mesh)
    state = jax.device_put(state, rep)
    new_state, stats = step(state, sharded, jax.random.PRNGKey(1), do_dr1=True)
    assert all(np.isfinite(float(v)) for v in stats.values())
    # result params are replicated across all 8 devices
    leaf = jax.tree_util.tree_leaves(new_state.params_G)[0]
    assert len(leaf.sharding.device_set) == 8


def test_sharded_step_with_augment_pipe():
    """The production ADA path on a mesh: full bgc augment pipe (shear warp
    executor, shard-aware chunking) inside the sharded train step. Catches
    device-serializing or resharding regressions in the warp chunking."""
    import dataclasses
    from stylegan_v_tpu.training.augment import (AUGPIPE_SPECS, AugmentConfig,
                                                 make_augment_pipe)
    G, D = make_models()
    tcfg = TrainingConfig(batch_size=8, ada_target=0.6)
    lcfg = LossConfig(r1_gamma=1.0, pl_weight=0.0, video_consistent_aug=True)
    aug = make_augment_pipe(dataclasses.replace(
        AugmentConfig(**AUGPIPE_SPECS["bgc"]), data_shards=8))
    state = init_train_state(jax.random.PRNGKey(0), G, D,
                             OptimizerConfig(), OptimizerConfig(), tcfg,
                             augment_p=0.5)
    step = make_train_step(G, D, lcfg, OptimizerConfig(), OptimizerConfig(),
                           tcfg, augment_fn=aug, donate=False)
    mesh = create_mesh(frame=1)
    batch = shard_batch(mesh, make_batch(11, B=8, F=3))
    state = jax.device_put(state, replicated_sharding(mesh))
    new_state, stats = step(state, batch, jax.random.PRNGKey(1))
    assert all(np.isfinite(float(v)) for v in stats.values())
    dg = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                                state.params_G, new_state.params_G)
    assert max(jax.tree_util.tree_leaves(dg)) > 0


def test_gradient_accumulation_rounds():
    """batch_chip < batch_size => microbatch accumulation rounds inside the
    step (the reference's batch_gpu capability)."""
    G, D = make_models()
    tcfg = TrainingConfig(batch_size=4, batch_chip=2)
    lcfg = LossConfig(r1_gamma=1.0, pl_weight=2.0)
    state = init_train_state(jax.random.PRNGKey(0), G, D,
                             OptimizerConfig(), OptimizerConfig(), tcfg)
    step = make_train_step(G, D, lcfg, OptimizerConfig(), OptimizerConfig(),
                           tcfg, donate=False)
    batch = make_batch(7, B=4, F=3)
    new_state, stats = step(state, batch, jax.random.PRNGKey(1),
                            do_gpl=True, do_dr1=True)
    assert all(np.isfinite(float(v)) for v in stats.values())
    dg = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                                state.params_G, new_state.params_G)
    assert max(jax.tree_util.tree_leaves(dg)) > 0
    assert float(new_state.pl_mean) != 0.0


def test_frame_axis_sharded_generation():
    """CP analog: videos shard over 'data', frames over 'frame' (SURVEY 5.7)."""
    import numpy as np
    from stylegan_v_tpu.parallel import create_mesh
    from stylegan_v_tpu.parallel.sharded_eval import sharded_generate_frames
    from stylegan_v_tpu.models import Generator
    from stylegan_v_tpu.models.motion import MotionMappingNetwork
    from test_models import small_gen_cfg

    cfg = small_gen_cfg()
    G = Generator(cfg)
    mesh = create_mesh(data=4, frame=2)
    V, T = 4, 8
    z = jax.random.normal(jax.random.PRNGKey(0), (V, cfg.z_dim))
    ts = jnp.tile(jnp.arange(T, dtype=jnp.float32)[None], (V, 1))
    L = MotionMappingNetwork.required_traj_len(cfg, float(T))
    mz = jax.random.normal(jax.random.PRNGKey(1), (V, L, cfg.motion.z_dim))
    variables = jax.jit(lambda r, z, t: G.init(r, z, None, t, noise_mode="none"))(
        {"params": jax.random.PRNGKey(2), "motion": jax.random.PRNGKey(3)},
        z, ts)
    out = sharded_generate_frames(G, variables, z, None, ts, mz, mesh,
                                  noise_mode="none")
    assert out.shape == (V, T, 32, 32, 3)
    assert len(out.sharding.device_set) == 8
    # must equal the unsharded computation
    ref = G.apply(variables, z, None, ts, motion_z=mz, noise_mode="none",
                  rngs={"motion": jax.random.PRNGKey(0)})
    np.testing.assert_allclose(np.asarray(out).reshape(V * T, 32, 32, 3),
                               np.asarray(ref), rtol=2e-2, atol=2e-3)


def test_conditional_training_step():
    """Class-conditional path (UCF-101 style): c flows through mapping embed,
    motion encoder concat, and D's label projection."""
    from test_models import small_gen_cfg, small_disc_cfg
    C_DIM = 5
    G = Generator(small_gen_cfg(c_dim=C_DIM))
    D = Discriminator(small_disc_cfg(c_dim=C_DIM))
    tcfg = TrainingConfig(batch_size=4)
    state = init_train_state(jax.random.PRNGKey(0), G, D,
                             OptimizerConfig(), OptimizerConfig(), tcfg)
    step = make_train_step(G, D, LossConfig(r1_gamma=1.0), OptimizerConfig(),
                           OptimizerConfig(), tcfg, donate=False)
    batch = make_batch(0, B=4, F=3, c_dim=C_DIM)
    # one-hot labels
    r = np.random.RandomState(1)
    eye = np.eye(C_DIM, dtype=np.float32)
    batch["real_c"] = eye[r.randint(C_DIM, size=4)]
    batch["gen_c"] = eye[r.randint(C_DIM, size=(4, 3))]
    new_state, stats = step(state, batch, jax.random.PRNGKey(1), do_dr1=True)
    assert np.isfinite(float(stats["Loss/G/loss"]))
    assert np.isfinite(float(stats["Loss/r1_penalty"]))
    # label-embedding params received gradients
    d_emb = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                                   state.params_D["mapping"]["embed"],
                                   new_state.params_D["mapping"]["embed"])
    assert max(jax.tree_util.tree_leaves(d_emb)) > 0
