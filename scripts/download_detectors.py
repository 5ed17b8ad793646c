#!/usr/bin/env python
"""Fetch the reference metric detectors (run on a machine WITH network access;
the TPU sandbox has zero egress).

Detector files (the same ones the reference downloads lazily,
reference metric files *_distance.py / *_score.py):
  inception-2015-12-05.pt  — InceptionV3 TorchScript (FID/KID/IS)
  i3d_torchscript.pt       — I3D Kinetics-400 (FVD), bit-exact TF port
  c3d_ucf101.pt            — C3D UCF-101 (Video IS)

Usage:  python scripts/download_detectors.py --out ./detectors
Then set SGV_DETECTOR_DIR=./detectors (or pass --detector-dir to the CLIs).
"""
import argparse
import os
import urllib.request

URLS = {
    "inception-2015-12-05.pt":
        "https://nvlabs-fi-cdn.nvidia.com/stylegan2-ada-pytorch/pretrained/metrics/inception-2015-12-05.pt",
    "i3d_torchscript.pt":
        "https://www.dropbox.com/s/ge9e5ujwgetktms/i3d_torchscript.pt?dl=1",
    "c3d_ucf101.pt":
        "https://www.dropbox.com/s/jxpu7avzdc9n97q/c3d_ucf101.pt?dl=1",
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="detectors")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for fname, url in URLS.items():
        dst = os.path.join(args.out, fname)
        if os.path.exists(dst):
            print(f"exists: {dst}")
            continue
        print(f"downloading {url} -> {dst}")
        urllib.request.urlretrieve(url, dst)
    print("done. export SGV_DETECTOR_DIR=" + os.path.abspath(args.out))


if __name__ == "__main__":
    main()
