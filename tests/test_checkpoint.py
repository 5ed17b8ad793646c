"""Orbax snapshot save/restore + resume-latest + partial-copy tests."""
import numpy as np
import jax
import jax.numpy as jnp

from stylegan_v_tpu.io import (
    copy_params, find_latest_snapshot, load_snapshot, save_snapshot,
)
from stylegan_v_tpu.models import Discriminator, Generator
from stylegan_v_tpu.training import (
    OptimizerConfig, TrainingConfig, init_train_state,
)
from test_models import small_disc_cfg, small_gen_cfg


def test_snapshot_roundtrip_and_latest(tmp_path):
    G, D = Generator(small_gen_cfg()), Discriminator(small_disc_cfg())
    tcfg = TrainingConfig(batch_size=4)
    state = init_train_state(jax.random.PRNGKey(0), G, D,
                             OptimizerConfig(), OptimizerConfig(), tcfg)
    run_dir = str(tmp_path)
    p1 = save_snapshot(run_dir, state, cur_nimg=1000,
                       configs={"G": G.cfg, "D": D.cfg})
    state2 = state.replace(step=state.step + 5, cur_nimg=state.cur_nimg + 5000)
    p2 = save_snapshot(run_dir, state2, cur_nimg=5000,
                       configs={"G": G.cfg, "D": D.cfg})
    assert find_latest_snapshot(run_dir) == p2

    restored, meta = load_snapshot(p2, target=state)
    assert meta["cur_nimg"] == 5000
    for a, b in zip(jax.tree_util.tree_leaves(restored.params_G),
                    jax.tree_util.tree_leaves(state2.params_G)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(np.asarray(restored.step)) == 5


def test_copy_params_partial():
    src = {"a": {"w": np.ones((2, 2))}, "b": np.full((3,), 7.0)}
    dst = {"a": {"w": np.zeros((2, 2))}, "b": np.zeros((3,)), "c": np.zeros((4,))}
    out = copy_params(src, dst)
    np.testing.assert_array_equal(out["a"]["w"], 1.0)
    np.testing.assert_array_equal(out["b"], 7.0)
    np.testing.assert_array_equal(out["c"], 0.0)   # kept (transfer learning)


def test_copy_params_require_all_raises():
    import pytest as _pytest
    src = {"a": np.ones((2,))}
    dst = {"a": np.zeros((2,)), "b": np.zeros((3,))}
    with _pytest.raises(KeyError):
        copy_params(src, dst, require_all=True)
