"""Input-pipeline bench harness (scripts/bench_loader.py) contract test.

The measurement itself runs on real hosts (docs/PERF.md records the gate:
decode throughput >= 2x the production training consumption rate); here we
pin that the harness runs end-to-end on a tiny synthetic zip and emits the
JSON contract (reference analog: DataLoader worker feeding,
reference src/train.py:98 — never measured by the reference).
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_loader_contract(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import bench_loader

    zpath = bench_loader.make_synthetic_zip(str(tmp_path), num_videos=6,
                                            frames=8, res=64)
    assert os.path.exists(zpath)
    fps = bench_loader.bench_loader(zpath, batch_size=4, num_workers=2,
                                    num_batches=4, frames_per_video=3)
    assert fps > 0


def test_bench_loader_cli(tmp_path):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "bench_loader.py"),
         "--res", "64", "--batch-size", "4", "--num-workers", "2",
         "--num-batches", "4"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["metric"] == "loader_frames_per_sec"
    assert out["value"] > 0
