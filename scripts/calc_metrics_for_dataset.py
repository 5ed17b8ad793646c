#!/usr/bin/env python
"""FVD/FID between two frame datasets (real vs generated dirs/zips)
(reference src/scripts/calc_metrics_for_dataset.py).

    python scripts/calc_metrics_for_dataset.py \\
        --real-data /data/real_frames --fake-data /data/fake_frames \\
        --metrics fvd2048_16f,fid50k_full
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--real-data", required=True)
    ap.add_argument("--fake-data", required=True)
    ap.add_argument("--metrics", default="fvd2048_16f")
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--max-num-frames", type=int, default=1024)
    ap.add_argument("--mirror", action="store_true")
    ap.add_argument("--detector-dir", default=None)
    ap.add_argument("--run-dir", default=".")
    args = ap.parse_args()

    from stylegan_v_tpu.metrics import metric_main
    from stylegan_v_tpu.models.config import SamplingConfig

    sampling = SamplingConfig(max_num_frames=args.max_num_frames)
    common = dict(sampling=sampling, max_num_frames=args.max_num_frames,
                  xflip=args.mirror, resolution=args.resolution)

    for metric in args.metrics.split(","):
        metric = metric.strip()
        if not metric_main.is_valid_metric(metric):
            raise SystemExit(f"unknown metric {metric}")
        print(f"Computing {metric} (dataset vs dataset)...")
        from stylegan_v_tpu.parallel import create_mesh
        result = metric_main.calc_metric(
            metric=metric,
            dataset_kwargs=dict(path=args.real_data, **common),
            gen_dataset_kwargs=dict(path=args.fake_data, **common),
            generator_as_dataset=True,
            detector_dir=args.detector_dir,
            mesh=create_mesh(frame=1))
        metric_main.report_metric(result, run_dir=args.run_dir)
        print(f"  {metric}: {dict(result['results'])}")


if __name__ == "__main__":
    main()
