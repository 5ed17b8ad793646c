"""2-process x 4-device multihost test over a jax.distributed local CPU
cluster (VERDICT r1 item 7): loader/metric replica striding, global-array
assembly, cross-host replica hash check, metric merge + result broadcast.

Each worker runs in its own process (tests/multiproc_worker.py) and prints a
JSON result line; all processes must succeed and print IDENTICAL results.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from test_data import build_video_dataset_dir


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_four_device_cluster(tmp_path):
    ds = build_video_dataset_dir(str(tmp_path), num_videos=6,
                                 frames_per_video=20, res=16)
    port, nproc = _free_port(), 2
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tests", "multiproc_worker.py"),
         str(port), str(r), str(nproc), ds],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for r in range(nproc)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=840)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {r} failed:\n{out[-4000:]}"

    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, f"no RESULT line:\n{out[-2000:]}"
        results.append(json.loads(lines[0][len("RESULT "):]))

    r0, r1 = results
    assert r0["n_devices"] == r1["n_devices"] == 8
    assert r0["stats_num_items"] == r1["stats_num_items"] == 6
    assert r0["stats_all_shape"] == r1["stats_all_shape"]
    # merged stats and broadcast metric results must be IDENTICAL across
    # processes (reference metric_utils.py:103-113 + metric_main.py:52-59)
    assert r0["stats_mu_head"] == r1["stats_mu_head"]
    # zero-share replica (max_items=1 < process_count): identical everywhere
    assert r0["stats1_num_items"] == r1["stats1_num_items"] == 1
    assert r0["stats1_mu0"] == r1["stats1_mu0"]
    assert r0["fvd"] == r1["fvd"]
    assert abs(r0["fvd"]) < 1.0                  # dataset vs itself
    # mesh + multi-process: local-mesh restriction, identical everywhere
    assert r0["fvd_mesh"] == r1["fvd_mesh"]
    assert abs(r0["fvd_mesh"]) < 1.0
    assert r0["batch_sum"] == r1["batch_sum"]
    assert r0["consistency_ok"] and r1["consistency_ok"]
    assert r0["divergence_caught"] and r1["divergence_caught"]
    assert r0["divergence_ignored_ok"] and r1["divergence_ignored_ok"]
    # rank-agreed abort: only process 1's abort_fn fired, yet BOTH processes
    # exited at the same (early) tick — no one-sided exit, no deadlock
    assert r0["abort_nimg"] == r1["abort_nimg"]
    assert r0["abort_nimg"] <= 72, "abort did not stop the loop early"
