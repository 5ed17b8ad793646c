#!/usr/bin/env python
"""FaceForensics preprocessing: crop face regions from raw FFS videos into
the frames layout (reference src/scripts/preprocess_ffs.py).

Crop boxes come from a JSON file mapping video id -> [x0, y0, x1, y1]
(per-video fixed box, the common FFS workflow), from per-frame boxes, or —
absent any boxes — a center square crop. Face DETECTION itself is out of
scope here (the reference relies on precomputed masks/landmarks shipped with
the dataset).

    python scripts/preprocess_ffs.py -s raw_videos/ -t ffs_frames/ \\
        --boxes boxes.json --target_size 256
"""
from __future__ import annotations

import argparse
import json
import os
from concurrent.futures import ProcessPoolExecutor


def process_video(task):
    src, dst_dir, box, target_size, q = task
    import cv2
    os.makedirs(dst_dir, exist_ok=True)
    cap = cv2.VideoCapture(src)
    idx = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        h, w = frame.shape[:2]
        if box is not None:
            b = box[idx] if isinstance(box[0], (list, tuple)) else box
            x0, y0, x1, y1 = [int(v) for v in b]
            x0, y0 = max(0, x0), max(0, y0)
            x1, y1 = min(w, x1), min(h, y1)
            crop = frame[y0:y1, x0:x1]
        else:
            s = min(h, w)
            crop = frame[(h - s) // 2:(h + s) // 2, (w - s) // 2:(w + s) // 2]
        crop = cv2.resize(crop, (target_size, target_size),
                          interpolation=cv2.INTER_AREA)
        cv2.imwrite(os.path.join(dst_dir, f"{idx:06d}.jpg"), crop,
                    [cv2.IMWRITE_JPEG_QUALITY, q])
        idx += 1
    cap.release()
    return src, idx


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-s", "--source_dir", required=True)
    ap.add_argument("-t", "--target_dir", required=True)
    ap.add_argument("--boxes", default=None, help="JSON: {video_id: box}")
    ap.add_argument("--target_size", type=int, default=256)
    ap.add_argument("--num_workers", type=int, default=8)
    ap.add_argument("--quality", type=int, default=95)
    args = ap.parse_args()

    boxes = {}
    if args.boxes:
        with open(args.boxes) as f:
            boxes = json.load(f)

    tasks = []
    for name in sorted(os.listdir(args.source_dir)):
        if not name.lower().endswith((".mp4", ".avi", ".mov")):
            continue
        stem = os.path.splitext(name)[0]
        tasks.append((os.path.join(args.source_dir, name),
                      os.path.join(args.target_dir, stem),
                      boxes.get(stem), args.target_size, args.quality))
    print(f"Processing {len(tasks)} videos...")
    with ProcessPoolExecutor(max_workers=args.num_workers) as ex:
        for src, n in ex.map(process_video, tasks):
            print(f"  {os.path.basename(src)}: {n} frames")


if __name__ == "__main__":
    main()
