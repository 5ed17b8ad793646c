#!/usr/bin/env python
"""Chunk ONE long video into fixed-length clips in the frames layout
(reference src/scripts/convert_video_to_dataset.py).

    python scripts/convert_video_to_dataset.py -s long.mp4 -t /data/clips \\
        --clip_len 128 --target_size 256
"""
from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-s", "--source", required=True, help="input video file")
    ap.add_argument("-t", "--target_dir", required=True)
    ap.add_argument("--clip_len", type=int, default=128)
    ap.add_argument("--target_size", type=int, default=None)
    ap.add_argument("--quality", type=int, default=95)
    args = ap.parse_args()

    import cv2
    cap = cv2.VideoCapture(args.source)
    clip_idx = frame_idx = 0
    clip_dir = None
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if frame_idx % args.clip_len == 0:
            clip_dir = os.path.join(args.target_dir, f"clip{clip_idx:05d}")
            os.makedirs(clip_dir, exist_ok=True)
            clip_idx += 1
        if args.target_size:
            h, w = frame.shape[:2]
            s = min(h, w)
            frame = frame[(h - s) // 2:(h + s) // 2, (w - s) // 2:(w + s) // 2]
            frame = cv2.resize(frame, (args.target_size, args.target_size),
                               interpolation=cv2.INTER_AREA)
        cv2.imwrite(os.path.join(clip_dir, f"{frame_idx % args.clip_len:06d}.jpg"),
                    frame, [cv2.IMWRITE_JPEG_QUALITY, args.quality])
        frame_idx += 1
    cap.release()
    print(f"Wrote {clip_idx} clips ({frame_idx} frames) to {args.target_dir}")


if __name__ == "__main__":
    main()
