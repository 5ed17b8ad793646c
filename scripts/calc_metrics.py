#!/usr/bin/env python
"""Metric evaluation for a checkpoint (reference src/scripts/calc_metrics.py).

    python scripts/calc_metrics.py --network runs/exp/network-snapshot-000123 \\
        --metrics fvd2048_16f,fid50k_full --data /data/ffs_256.zip
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--network", required=True, help="orbax snapshot dir")
    ap.add_argument("--metrics", default="fvd2048_16f",
                    help="comma-separated metric names")
    ap.add_argument("--data", required=True, help="dataset path (dir or zip)")
    ap.add_argument("--mirror", action="store_true")
    ap.add_argument("--detector-dir", default=None)
    ap.add_argument("--run-dir", default=None,
                    help="where to append metric jsonls (default: network dir)")
    ap.add_argument("--num-runs", type=int, default=1)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    from generate import load_any_checkpoint
    from stylegan_v_tpu.metrics import metric_main

    G, variables = load_any_checkpoint(args.network)
    run_dir = args.run_dir or os.path.dirname(os.path.abspath(args.network))

    dataset_kwargs = dict(path=args.data, sampling=G.cfg.sampling,
                          max_num_frames=G.cfg.sampling.max_num_frames,
                          xflip=args.mirror, resolution=G.cfg.img_resolution)

    for metric in args.metrics.split(","):
        metric = metric.strip()
        if not metric_main.is_valid_metric(metric):
            raise SystemExit(f"unknown metric {metric}; valid: "
                             f"{metric_main.list_valid_metrics()}")
        print(f"Computing {metric}...")
        # detector/synthesis batches shard over all local devices (flax
        # detector backends run under jit on the mesh; TorchScript/stub
        # backends ignore it)
        from stylegan_v_tpu.parallel import create_mesh
        result = metric_main.calc_metric(
            metric=metric, num_runs=args.num_runs, G=G, G_variables=variables,
            dataset_kwargs=dataset_kwargs, detector_dir=args.detector_dir,
            mesh=create_mesh(frame=1), verbose=args.verbose)
        metric_main.report_metric(result, run_dir=run_dir,
                                  snapshot_pkl=os.path.basename(args.network))
        print(f"  {metric}: {dict(result['results'])}  "
              f"({result['total_time']:.1f}s)")


if __name__ == "__main__":
    main()
