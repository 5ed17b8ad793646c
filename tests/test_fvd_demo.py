"""Miniature end-to-end run of scripts/train_fvd_demo.py: procedural data ->
real loop -> in-training random-feature FVD series written to the run dir.
(The PERF.md convergence record comes from the production-scale run of the
same script on TPU.)"""
import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_demo():
    spec = importlib.util.spec_from_file_location(
        "train_fvd_demo", os.path.join(REPO, "scripts", "train_fvd_demo.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_fvd_demo_miniature(tmp_path, monkeypatch):
    # unfused metric extraction: the fused G+I3D program's XLA compile
    # takes tens of minutes on a 1-core CI host (the fused path has its own
    # dedicated tests, tests/test_sharded_metrics.py)
    monkeypatch.setenv("SGV_METRIC_NO_FUSE", "1")
    demo = _load_demo()
    outdir = str(tmp_path / "run")
    data = str(tmp_path / "mv.zip")
    monkeypatch.setattr(sys, "argv", [
        "train_fvd_demo.py", "--outdir", outdir, "--data", data,
        "--videos", "6", "--dataset-frames", "16", "--res", "32",
        "--batch", "4", "--channel-base", "1024",
        "--total-kimg", "0.02", "--kimg-per-tick", "0.008",
        "--snap-ticks", "1", "--fvd-items", "4", "--workers", "2",
        # blit pipe: ADA stays live but the geometric-warp graph (whose
        # XLA:CPU compile dominates on 1-core CI hosts) is dropped; the
        # production TPU run keeps the full bgc pipe
        "--augpipe", "blit",
    ])
    demo.main()

    path = os.path.join(outdir, "metric-fvd2048_16f.jsonl")
    assert os.path.exists(path), os.listdir(outdir)
    rows = [json.loads(l) for l in open(path)]
    assert rows, "no FVD rows written"
    for r in rows:
        v = r["results"]["fvd2048_16f"]
        assert v >= 0.0 and v == v      # finite, non-negative
