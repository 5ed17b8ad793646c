"""CI run of the one-command FVD-parity harness (scripts/fvd_parity.py).

With stub detectors and tiny counts the WHOLE pipeline runs end-to-end:
detector gate (stubbed) -> FVD sweep over two Orbax checkpoints -> rank
agreement vs a reference-format metric-fvd2048_16f.jsonl (VERDICT r3 task 5
done-criterion; reference credibility chain README.md:144-145). The real run
needs exactly two external inputs, documented in the script docstring.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _make_snapshots(run_dir):
    import jax
    from test_models import small_disc_cfg, small_gen_cfg
    from stylegan_v_tpu.io.checkpoint import save_snapshot
    from stylegan_v_tpu.models import Discriminator, Generator
    from stylegan_v_tpu.training import (OptimizerConfig, TrainingConfig,
                                         init_train_state)

    gcfg, dcfg = small_gen_cfg(), small_disc_cfg()
    state = init_train_state(jax.random.PRNGKey(0), Generator(gcfg),
                             Discriminator(dcfg), OptimizerConfig(),
                             OptimizerConfig(), TrainingConfig(batch_size=4))
    save_snapshot(run_dir, state, 48_000, configs={"G": gcfg, "D": dcfg})
    # second checkpoint: perturbed weights -> different generated stats
    state2 = state.replace(params_Gema=jax.tree_util.tree_map(
        lambda p: p + 0.05 * np.float32(1.0), state.params_Gema))
    save_snapshot(run_dir, state2, 96_000, configs={"G": gcfg, "D": dcfg})


def test_rank_agreement_math():
    import fvd_parity
    ours = {"a": 10.0, "b": 5.0, "c": 7.0}
    ref = {"a": 100.0, "b": 50.0, "c": 70.0, "d": 1.0}   # same order
    report = {}
    assert fvd_parity.stage_rank_agreement(ours, ref, report)
    ra = report["rank_agreement"]
    assert ra["spearman_rho"] == 1.0 and ra["best_ckpt_agrees"]
    # inverted order: must fail the gate
    ref_bad = {"a": 1.0, "b": 100.0, "c": 50.0}
    assert not fvd_parity.stage_rank_agreement(ours, ref_bad, {})


def test_snapshot_id_parsing():
    import fvd_parity
    assert fvd_parity.snapshot_id("runs/x/network-snapshot-000123.pkl") == "000123"
    assert fvd_parity.snapshot_id("runs/x/network-snapshot-000048/") == "000048"


@pytest.mark.slow
def test_fvd_parity_cli_end_to_end(tmp_path):
    from test_data import build_video_dataset_dir
    data = build_video_dataset_dir(str(tmp_path), num_videos=4,
                                   frames_per_video=24, res=32)
    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir)
    _make_snapshots(run_dir)

    # reference-format jsonl (reference metric_main.py:81-91 line schema)
    ref_jsonl = str(tmp_path / "metric-fvd2048_16f.jsonl")
    with open(ref_jsonl, "w") as f:
        for snap, val in [("network-snapshot-000048.pkl", 120.0),
                          ("network-snapshot-000096.pkl", 80.0)]:
            f.write(json.dumps({"results": {"fvd2048_16f": val},
                                "metric": "fvd2048_16f",
                                "snapshot_pkl": snap}) + "\n")

    env = dict(os.environ, SGV_STUB_DETECTORS="1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "fvd_parity.py"),
         "--data", data, "--ckpts", os.path.join(run_dir, "network-snapshot-*"),
         "--ref-jsonl", ref_jsonl, "--out", str(tmp_path / "fvd_parity.json"),
         "--max-real", "4", "--num-gen", "4"],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO)
    assert r.returncode in (0, 2), r.stderr[-3000:] + r.stdout[-2000:]
    report = json.loads((tmp_path / "fvd_parity.json").read_text())
    assert report["detector_gate"]["status"] == "stubbed"
    assert len(report["ours"]) == 2
    assert all(np.isfinite(v) for v in report["ours"].values())
    ra = report["rank_agreement"]
    assert ra["status"] == "ok" and ra["n"] == 2
    assert "spearman_rho" in ra and "best_ckpt_agrees" in ra
