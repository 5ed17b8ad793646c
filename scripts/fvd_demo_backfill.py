#!/usr/bin/env python
"""Backfill the FVD-over-training series for snapshots that predate a
metric fix (companion to scripts/train_fvd_demo.py): loads each
network-snapshot-* in --outdir that has no row in metric-fvd2048_16f.jsonl,
registers the SAME fixed-seed random-weight flax I3D, and appends its FVD.

    python scripts/fvd_demo_backfill.py --outdir runs/fvd_demo \
        --data data/moving64.zip
"""
from __future__ import annotations

import argparse
import importlib.util
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--outdir", default="runs/fvd_demo")
    ap.add_argument("--data", default="data/moving64.zip")
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--dataset-frames", type=int, default=32)
    ap.add_argument("--fvd-items", type=int, default=256)
    ap.add_argument("--detector-seed", type=int, default=17)
    ap.add_argument("--out-jsonl", default=None,
                    help="metric jsonl to read/append (default: the run's "
                         "metric-fvd2048_16f.jsonl). For the multi-seed "
                         "stability check, point each detector seed at its "
                         "own file, e.g. metric-fvd2048_16f.seed18.jsonl")
    ap.add_argument("--force", action="store_true",
                    help="re-score snapshots even if already recorded")
    args = ap.parse_args()

    from stylegan_v_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()

    spec = importlib.util.spec_from_file_location(
        "train_fvd_demo",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "train_fvd_demo.py"))
    demo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo)
    demo.register_random_i3d(args.detector_seed, 16, args.res,
                             resize224=False)

    jsonl = (args.out_jsonl if args.out_jsonl is not None
             else os.path.join(args.outdir, "metric-fvd2048_16f.jsonl"))
    have = set()
    if os.path.exists(jsonl) and not args.force:
        for line in open(jsonl):
            have.add(json.loads(line).get("snapshot"))

    from stylegan_v_tpu.io.checkpoint import load_snapshot, meta_decode
    from stylegan_v_tpu.metrics import metric_main
    from stylegan_v_tpu.models import (Generator, GeneratorConfig,
                                       MotionConfig, TimeEncConfig)
    from stylegan_v_tpu.models.config import SamplingConfig

    sampling = SamplingConfig(num_frames_per_video=3,
                              max_num_frames=args.dataset_frames)
    snaps = sorted(
        (int(m.group(1)), n) for n in os.listdir(args.outdir)
        if (m := re.match(r"network-snapshot-(\d+)$", n))
        and os.path.isdir(os.path.join(args.outdir, n)))
    for kimg, name in snaps:
        if name in have:
            print(f"{name}: already recorded, skip", flush=True)
            continue
        state, meta = load_snapshot(os.path.join(args.outdir, name))
        registry = {c.__name__: c for c in
                    (GeneratorConfig, MotionConfig, SamplingConfig,
                     TimeEncConfig)}
        G = Generator(meta_decode(meta["configs"]["G"], registry))
        ema_vars = {"params": state["params_Gema"],
                    **(state["extra_Gema"] or {})}
        r = metric_main.calc_metric(
            metric="fvd2048_16f", G=G, G_variables=ema_vars,
            dataset_kwargs=dict(path=args.data, sampling=sampling,
                                max_num_frames=args.dataset_frames),
            max_real_override=args.fvd_items,
            num_gen_override=args.fvd_items)
        rec = dict(r)
        rec["snapshot"] = name
        rec["snapshot_nimg"] = kimg * 1000
        rec["detector_seed"] = args.detector_seed
        rec["timestamp"] = __import__("time").time()
        with open(jsonl, "at") as f:
            f.write(json.dumps(rec, default=float) + "\n")
        print(f"{name}: {r['results']} (seed {args.detector_seed})", flush=True)


if __name__ == "__main__":
    main()
