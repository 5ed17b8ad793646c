#!/usr/bin/env python
"""Build a frozen-video control dataset: each output video repeats one frame
(reference src/scripts/construct_static_videos_dataset.py — used to measure
how much a metric rewards static content).

    python scripts/construct_static_videos_dataset.py -s /data/frames \\
        -t /data/frames_static --video_len 16
"""
from __future__ import annotations

import argparse
import os
import shutil


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-s", "--source_dir", required=True)
    ap.add_argument("-t", "--target_dir", required=True)
    ap.add_argument("--video_len", type=int, default=16)
    ap.add_argument("--frame_idx", type=int, default=0,
                    help="which source frame to freeze")
    args = ap.parse_args()

    vdirs = sorted(d for d in os.listdir(args.source_dir)
                   if os.path.isdir(os.path.join(args.source_dir, d)))
    for d in vdirs:
        frames = sorted(os.listdir(os.path.join(args.source_dir, d)))
        if not frames:
            continue
        src_frame = os.path.join(args.source_dir, d,
                                 frames[min(args.frame_idx, len(frames) - 1)])
        dst_dir = os.path.join(args.target_dir, d)
        os.makedirs(dst_dir, exist_ok=True)
        ext = os.path.splitext(src_frame)[1]
        for i in range(args.video_len):
            shutil.copyfile(src_frame, os.path.join(dst_dir, f"{i:06d}{ext}"))
    print(f"Wrote {len(vdirs)} static videos to {args.target_dir}")


if __name__ == "__main__":
    main()
