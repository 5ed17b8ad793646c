#!/usr/bin/env python
"""Convert a directory of video files into the depth-2 frames layout
(reference src/scripts/convert_videos_to_frames.py; cv2 instead of moviepy).

    python scripts/convert_videos_to_frames.py -s /data/videos -t /data/frames \\
        --target_size 256 --extensions mp4 avi
"""
from __future__ import annotations

import argparse
import os
from concurrent.futures import ProcessPoolExecutor



def convert_one(task):
    src, dst_dir, target_size, q = task
    import cv2
    os.makedirs(dst_dir, exist_ok=True)
    cap = cv2.VideoCapture(src)
    idx = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if target_size:
            h, w = frame.shape[:2]
            # center-crop to square then resize (standard video-GAN prep)
            s = min(h, w)
            y0, x0 = (h - s) // 2, (w - s) // 2
            frame = frame[y0:y0 + s, x0:x0 + s]
            frame = cv2.resize(frame, (target_size, target_size),
                               interpolation=cv2.INTER_AREA)
        cv2.imwrite(os.path.join(dst_dir, f"{idx:06d}.jpg"), frame,
                    [cv2.IMWRITE_JPEG_QUALITY, q])
        idx += 1
    cap.release()
    return src, idx


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-s", "--source_dir", required=True)
    ap.add_argument("-t", "--target_dir", required=True)
    ap.add_argument("--target_size", type=int, default=None)
    ap.add_argument("--extensions", nargs="+", default=["mp4", "avi", "mov", "webm"])
    ap.add_argument("--num_workers", type=int, default=8)
    ap.add_argument("--quality", type=int, default=95)
    args = ap.parse_args()

    exts = tuple("." + e.lower().lstrip(".") for e in args.extensions)
    tasks = []
    for name in sorted(os.listdir(args.source_dir)):
        if name.lower().endswith(exts):
            stem = os.path.splitext(name)[0]
            tasks.append((os.path.join(args.source_dir, name),
                          os.path.join(args.target_dir, stem),
                          args.target_size, args.quality))
    print(f"Converting {len(tasks)} videos with {args.num_workers} workers...")
    with ProcessPoolExecutor(max_workers=args.num_workers) as ex:
        for src, n in ex.map(convert_one, tasks):
            print(f"  {os.path.basename(src)}: {n} frames")


if __name__ == "__main__":
    main()
