#!/usr/bin/env python
"""Crop/resize every frame of a frames-layout dataset
(reference src/scripts/crop_video_dataset.py).

    python scripts/crop_video_dataset.py -s /data/frames -t /data/frames_256 \\
        --target_size 256
"""
from __future__ import annotations

import argparse
import os
from concurrent.futures import ThreadPoolExecutor


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-s", "--source_dir", required=True)
    ap.add_argument("-t", "--target_dir", required=True)
    ap.add_argument("--target_size", type=int, required=True)
    ap.add_argument("--num_workers", type=int, default=16)
    ap.add_argument("--quality", type=int, default=95)
    args = ap.parse_args()

    import cv2

    def process(task):
        src, dst = task
        frame = cv2.imread(src)
        h, w = frame.shape[:2]
        s = min(h, w)
        frame = frame[(h - s) // 2:(h + s) // 2, (w - s) // 2:(w + s) // 2]
        frame = cv2.resize(frame, (args.target_size, args.target_size),
                           interpolation=cv2.INTER_AREA)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        cv2.imwrite(dst, frame, [cv2.IMWRITE_JPEG_QUALITY, args.quality])

    tasks = []
    for vdir in sorted(os.listdir(args.source_dir)):
        full = os.path.join(args.source_dir, vdir)
        if not os.path.isdir(full):
            continue
        for f in sorted(os.listdir(full)):
            tasks.append((os.path.join(full, f),
                          os.path.join(args.target_dir, vdir, f)))
    print(f"Processing {len(tasks)} frames...")
    with ThreadPoolExecutor(max_workers=args.num_workers) as ex:
        list(ex.map(process, tasks))
    print("done")


if __name__ == "__main__":
    main()
