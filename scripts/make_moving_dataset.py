#!/usr/bin/env python
"""Procedural moving-pattern video dataset: anti-aliased sprites (discs /
squares) bouncing over per-video linear-gradient backgrounds, written in
the depth-2 `<video>/<frame>.jpg` layout VideoFramesFolderDataset reads
(dir or zip).

No reference counterpart — the reference trains on real datasets
(FaceForensics / SkyTimelapse, reference README.md). This exists so the
FULL production pipeline (zip -> TrainingDataLoader -> train loop -> FVD)
can be demonstrated end-to-end, with a learnable motion distribution, in a
sandbox with no video data and no egress (scripts/train_fvd_demo.py).

    python scripts/make_moving_dataset.py --out data/moving64.zip \\
        --videos 512 --frames 32 --res 64
"""
from __future__ import annotations

import argparse
import io
import os
import sys
import zipfile

import numpy as np
import PIL.Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _reflect(x: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """Triangle-wave reflection of x into [lo, hi] (elastic wall bounce)."""
    span = hi - lo
    if span <= 0:
        return np.full_like(x, lo)
    y = np.mod(x - lo, 2.0 * span)
    return lo + np.where(y > span, 2.0 * span - y, y)


def render_video(rng: np.random.RandomState, res: int, frames: int) -> np.ndarray:
    """[T, H, W, 3] uint8: gradient background + 1-3 bouncing AA sprites."""
    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32)
    ang = rng.uniform(0, 2 * np.pi)
    proj = (np.cos(ang) * xx + np.sin(ang) * yy)
    proj = (proj - proj.min()) / max(float(np.ptp(proj)), 1e-6)  # [H, W] in 0..1
    c0 = rng.uniform(0.05, 0.65, size=3).astype(np.float32)
    c1 = rng.uniform(0.35, 0.95, size=3).astype(np.float32)
    bg = c0 + proj[..., None] * (c1 - c0)                      # [H, W, 3]
    img = np.broadcast_to(bg, (frames, res, res, 3)).copy()

    t = np.arange(frames, dtype=np.float32)
    for _ in range(rng.randint(1, 4)):
        shape = rng.choice(["disc", "square"])
        color = rng.uniform(0.1, 1.0, size=3).astype(np.float32)
        r = rng.uniform(0.10, 0.22) * res
        speed = rng.uniform(0.8, 3.0) * res / 64.0             # px / frame
        theta = rng.uniform(0, 2 * np.pi)
        p0 = rng.uniform(r, res - 1 - r, size=2).astype(np.float32)
        cx = _reflect(p0[0] + speed * np.cos(theta) * t, r, res - 1 - r)
        cy = _reflect(p0[1] + speed * np.sin(theta) * t, r, res - 1 - r)
        dx = xx[None] - cx[:, None, None]                      # [T, H, W]
        dy = yy[None] - cy[:, None, None]
        if shape == "disc":
            d = np.sqrt(dx * dx + dy * dy)
        else:
            d = np.maximum(np.abs(dx), np.abs(dy))
        alpha = np.clip(r + 0.5 - d, 0.0, 1.0)[..., None]      # AA edge
        img = img * (1.0 - alpha) + color * alpha
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def write_dataset(out: str, num_videos: int, frames: int, res: int,
                  seed: int = 0, quality: int = 95) -> str:
    as_zip = out.endswith(".zip")
    zf = None
    if as_zip:
        os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
        zf = zipfile.ZipFile(out, "w", compression=zipfile.ZIP_STORED)
    for v in range(num_videos):
        rng = np.random.RandomState(seed * 1_000_003 + v)
        vid = render_video(rng, res, frames)
        name = f"video{v:05d}"
        for f in range(frames):
            buf = io.BytesIO()
            PIL.Image.fromarray(vid[f]).save(buf, format="JPEG",
                                             quality=quality)
            rel = f"{name}/{f:06d}.jpg"
            if zf is not None:
                zf.writestr(rel, buf.getvalue())
            else:
                path = os.path.join(out, rel)
                os.makedirs(os.path.dirname(path), exist_ok=True)
                with open(path, "wb") as fh:
                    fh.write(buf.getvalue())
    if zf is not None:
        zf.close()
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="output dir or .zip path")
    ap.add_argument("--videos", type=int, default=512)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--quality", type=int, default=95)
    args = ap.parse_args()
    out = write_dataset(args.out, args.videos, args.frames, args.res,
                        args.seed, args.quality)
    print(f"wrote {args.videos} videos x {args.frames} frames @ {args.res}^2 "
          f"-> {out}")


if __name__ == "__main__":
    main()
