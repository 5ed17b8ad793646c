#!/usr/bin/env python
"""One-command FVD ranking-parity harness — the BASELINE north-star gate.

Stages (each skippable only by missing inputs, never silently):
  1. DETECTOR GATE — validate the flax I3D port against the real TorchScript
     file at native AND 256^2 inputs (<=1e-3 max_rel / 1e-4 mean_rel), via
     scripts/validate_detectors.py. The reference's own credibility chain is
     the bit-exact TF->TorchScript port (reference README.md:144-145,
     src/metrics/frechet_video_distance.py:19-23).
  2. FVD SWEEP — compute fvd2048_16f for N checkpoints (reference
     network-snapshot-*.pkl or this framework's Orbax snapshot dirs) against
     --data.
  3. RANK AGREEMENT — match checkpoints to the reference's
     metric-fvd2048_16f.jsonl by snapshot id and report Spearman rho /
     Kendall tau / argmin (best-checkpoint) agreement.

Usage:
    python scripts/fvd_parity.py --detectors detectors/ \\
        --data /data/ffs_256.zip --ckpts 'runs/ref_ffs/network-snapshot-*.pkl' \\
        --ref-jsonl runs/ref_ffs/metric-fvd2048_16f.jsonl

CI mode: SGV_STUB_DETECTORS=1 runs the full pipeline with the deterministic
stub detector backend (stage 1 reported as "stubbed"), which is what
tests/test_fvd_parity.py exercises.

EXACTLY TWO external inputs unblock the real run (no egress in the build
sandbox):
  1. detectors/i3d_torchscript.pt — the reference's I3D detector file
     (URL in scripts/download_detectors.py, reference
     frechet_video_distance.py:19-23);
  2. a reference training-run bundle: its network-snapshot-*.pkl checkpoints
     + the metric-fvd2048_16f.jsonl the reference wrote for them (any public
     StyleGAN-V release run works), plus the dataset zip it was trained on.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def snapshot_id(path: str) -> str:
    """'network-snapshot-000123.pkl' / orbax 'network-snapshot-000123' -> '000123'."""
    m = re.search(r"(\d{4,})(?:\.pkl)?/?$", os.path.basename(path.rstrip("/")))
    return m.group(1) if m else os.path.basename(path.rstrip("/"))


def stage_detector_gate(detector_dir: str, report: dict) -> bool:
    if os.environ.get("SGV_STUB_DETECTORS"):
        report["detector_gate"] = {"status": "stubbed",
                                   "note": "SGV_STUB_DETECTORS=1 (CI mode)"}
        return True
    path = os.path.join(detector_dir, "i3d_torchscript.pt")
    if not os.path.exists(path):
        report["detector_gate"] = {
            "status": "missing",
            "note": f"{path} not found — fetch with scripts/download_detectors.py"}
        return False
    from validate_detectors import validate
    out: dict = {}
    ok = validate("i3d", path, out)
    report["detector_gate"] = {"status": "ok" if ok else "FAILED",
                               "cases": out["i3d"]["cases"]}
    return ok


def stage_fvd_sweep(ckpt_paths, data: str, detector_dir, report: dict,
                    max_real=None, num_gen=None) -> dict:
    from generate import load_any_checkpoint
    from stylegan_v_tpu.metrics import metric_main
    from stylegan_v_tpu.parallel import create_mesh

    ours = {}
    for path in ckpt_paths:
        G, variables = load_any_checkpoint(path)
        dataset_kwargs = dict(path=data, sampling=G.cfg.sampling,
                              max_num_frames=G.cfg.sampling.max_num_frames,
                              resolution=G.cfg.img_resolution)
        kwargs = {}
        if max_real is not None:
            kwargs["max_real_override"] = max_real
        if num_gen is not None:
            kwargs["num_gen_override"] = num_gen
        r = metric_main.calc_metric(
            metric="fvd2048_16f", G=G, G_variables=variables,
            dataset_kwargs=dataset_kwargs, detector_dir=detector_dir,
            mesh=create_mesh(frame=1), **kwargs)
        ours[snapshot_id(path)] = float(r["results"]["fvd2048_16f"])
        print(f"  {snapshot_id(path)}: fvd2048_16f = {ours[snapshot_id(path)]:.2f}")
    report["ours"] = ours
    return ours


def load_ref_jsonl(path: str) -> dict:
    """Reference metric-fvd2048_16f.jsonl -> {snapshot_id: fvd}
    (reference metric_main.py:81-91 line format)."""
    if os.path.isdir(path):
        path = os.path.join(path, "metric-fvd2048_16f.jsonl")
    ref = {}
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            rec = json.loads(line)
            res = rec.get("results", {})
            val = res.get("fvd2048_16f")
            snap = rec.get("snapshot_pkl") or rec.get("snapshot") or ""
            if val is not None and snap:
                ref[snapshot_id(snap)] = float(val)
    return ref


def stage_rank_agreement(ours: dict, ref: dict, report: dict) -> bool:
    common = sorted(set(ours) & set(ref))
    report["matched_snapshots"] = common
    if len(common) < 2:
        report["rank_agreement"] = {
            "status": "insufficient",
            "note": f"{len(common)} matched snapshots (need >= 2)"}
        return False
    a = np.array([ours[k] for k in common])
    b = np.array([ref[k] for k in common])
    from scipy import stats
    rho = float(stats.spearmanr(a, b).statistic)
    tau = float(stats.kendalltau(a, b).statistic)
    argmin_agree = bool(common[int(np.argmin(a))] == common[int(np.argmin(b))])
    report["rank_agreement"] = {
        "status": "ok", "n": len(common), "spearman_rho": round(rho, 4),
        "kendall_tau": round(tau, 4), "best_ckpt_agrees": argmin_agree,
        "pairs": {k: {"ours": round(ours[k], 2), "ref": round(ref[k], 2)}
                  for k in common}}
    return rho >= 0.8 and argmin_agree


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--detectors", default=os.environ.get("SGV_DETECTOR_DIR",
                                                          "detectors"))
    ap.add_argument("--data", required=True, help="real dataset dir/zip")
    ap.add_argument("--ckpts", required=True,
                    help="glob of checkpoints (pkl files or Orbax dirs)")
    ap.add_argument("--ref-jsonl", required=True,
                    help="reference metric-fvd2048_16f.jsonl (or its run dir)")
    ap.add_argument("--out", default="fvd_parity.json")
    ap.add_argument("--max-real", type=int, default=None,
                    help="override real-item count (CI shrink)")
    ap.add_argument("--num-gen", type=int, default=None,
                    help="override generated-item count (CI shrink)")
    args = ap.parse_args()

    report: dict = {}
    gate_ok = stage_detector_gate(args.detectors, report)
    print(f"[1/3] detector gate: {report['detector_gate']['status']}")
    if not gate_ok and report["detector_gate"]["status"] == "missing":
        print(json.dumps(report))
        print("\nBlocked on external input #1 (see module docstring).")
        return 3

    ckpts = sorted(glob.glob(args.ckpts)) or [args.ckpts]
    # checkpoints are reference .pkl files or Orbax snapshot DIRS; the glob
    # may also catch .meta.json sidecars — drop them
    ckpts = [p for p in ckpts
             if os.path.isdir(p) or (os.path.exists(p) and p.endswith(".pkl"))]
    if not ckpts:
        raise SystemExit(f"no checkpoints match {args.ckpts!r}")
    print(f"[2/3] FVD sweep over {len(ckpts)} checkpoints...")
    ours = stage_fvd_sweep(ckpts, args.data, args.detectors, report,
                           max_real=args.max_real, num_gen=args.num_gen)

    print("[3/3] rank agreement vs reference jsonl...")
    ref = load_ref_jsonl(args.ref_jsonl)
    agree = stage_rank_agreement(ours, ref, report)
    report["parity"] = bool(gate_ok and agree)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["rank_agreement"]))
    print(f"wrote {args.out}  parity={'PASS' if report['parity'] else 'FAIL'}")
    return 0 if report["parity"] else 2


if __name__ == "__main__":
    raise SystemExit(main())
