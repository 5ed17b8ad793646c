"""scripts/export_model.py: StableHLO serving-artifact export round trip.

The artifact must deserialize WITHOUT the model class tree and reproduce
the direct forward pass (the reference has no AOT serving path — it ships
live-module pickles, reference legacy.py:13-60)."""
import json
import os
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from stylegan_v_tpu.io import save_snapshot
from stylegan_v_tpu.models import Discriminator, Generator
from stylegan_v_tpu.training import (OptimizerConfig, TrainingConfig,
                                     init_train_state)

from test_models import small_disc_cfg, small_gen_cfg


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("export_run"))
    G, D = Generator(small_gen_cfg()), Discriminator(small_disc_cfg())
    state = init_train_state(jax.random.PRNGKey(0), G, D,
                             OptimizerConfig(), OptimizerConfig(),
                             TrainingConfig(batch_size=4))
    save_snapshot(d, state, cur_nimg=0, configs={"G": G.cfg, "D": D.cfg})
    return d


def test_export_roundtrip(run_dir, tmp_path, monkeypatch):
    out = str(tmp_path / "model.jaxexport")
    monkeypatch.setattr(sys, "argv", [
        "export_model.py", "--ckpt", run_dir, "--out", out,
        "--batch", "2", "--video-len", "3", "--selftest"])
    import export_model
    export_model.main()          # --selftest asserts output parity inside

    assert os.path.getsize(out) > 1000
    meta = json.load(open(out + ".json"))
    assert meta["inputs"]["z"] == [2, small_gen_cfg().z_dim]
    assert meta["output"][:2] == [2, 3]

    # the artifact is self-contained: deserialize + call with NO access to
    # the Generator module or config registry
    from jax import export as jexport
    loaded = jexport.deserialize(bytearray(open(out, "rb").read()))
    z = np.zeros(meta["inputs"]["z"], np.float32)
    t = np.tile(np.arange(3, dtype=np.float32)[None], (2, 1))
    frames = np.asarray(jax.jit(loaded.call)(z, t, np.int32(0)))
    assert list(frames.shape) == meta["output"]
    assert np.isfinite(frames).all()
    # different seeds give different motion
    frames2 = np.asarray(jax.jit(loaded.call)(z, t, np.int32(5)))
    assert np.abs(frames - frames2).max() > 1e-4


def test_export_conditional(tmp_path, monkeypatch):
    """c_dim > 0: the label one-hot becomes a served input and the artifact
    signature/metadata reflect it."""
    gcfg = small_gen_cfg(c_dim=5)
    dcfg = small_disc_cfg(c_dim=5)
    d = str(tmp_path / "cond_run")
    G, D = Generator(gcfg), Discriminator(dcfg)
    state = init_train_state(jax.random.PRNGKey(0), G, D,
                             OptimizerConfig(), OptimizerConfig(),
                             TrainingConfig(batch_size=4))
    save_snapshot(d, state, cur_nimg=0, configs={"G": gcfg, "D": dcfg})

    out = str(tmp_path / "cond.jaxexport")
    monkeypatch.setattr(sys, "argv", [
        "export_model.py", "--ckpt", d, "--out", out,
        "--batch", "2", "--video-len", "3", "--selftest"])
    import importlib
    import export_model
    importlib.reload(export_model)
    export_model.main()
    meta = json.load(open(out + ".json"))
    assert meta["inputs"]["c"] == [2, 5]
