#!/usr/bin/env python
"""Assemble several frame-folder videos into one grid mp4
(reference src/scripts/frames_to_video_grid.py).

    python scripts/frames_to_video_grid.py -s /data/frames -o grid.mp4 \\
        --num_videos 9 --fps 25
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import PIL.Image


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-s", "--source_dir", required=True)
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--num_videos", type=int, default=9)
    ap.add_argument("--num_frames", type=int, default=None)
    ap.add_argument("--fps", type=float, default=25.0)
    args = ap.parse_args()

    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from stylegan_v_tpu.training.video_io import save_video_frames_as_mp4, videos_as_grids

    vdirs = sorted(d for d in os.listdir(args.source_dir)
                   if os.path.isdir(os.path.join(args.source_dir, d)))[:args.num_videos]
    videos = []
    n_frames = args.num_frames
    for d in vdirs:
        frames = sorted(os.listdir(os.path.join(args.source_dir, d)))
        if n_frames is None:
            n_frames = len(frames)
        imgs = [np.array(PIL.Image.open(os.path.join(args.source_dir, d, f)))
                for f in frames[:n_frames]]
        videos.append(np.stack(imgs))
    videos = np.stack(videos).astype(np.float32) / 255.0
    save_video_frames_as_mp4(videos_as_grids(videos), args.fps, args.output)
    print(f"Wrote {args.output}")


if __name__ == "__main__":
    main()
