#!/usr/bin/env python
"""Validate the flax detector ports against the REAL TorchScript files.

The reference's metric credibility rests on bit-faithful detector ports
(reference README.md:144-145, frechet_video_distance.py:19-23). The flax
I3D / InceptionV3 / C3D ports in stylegan_v_tpu/metrics/detectors_flax are
converter+forward parity-tested on random weights in CI; this tool performs
the REAL-WEIGHT validation once the detector files are present (no egress in
the build sandbox — fetch them with scripts/download_detectors.py first):

    python scripts/validate_detectors.py --detector-dir detectors/

For each detector it runs the TorchScript module (CPU torch, the bit-exact
reference path) and the converted flax module on fixed seeded inputs,
reports max/mean feature deltas, asserts the agreement gate (<= 1e-4 rel),
and writes `detector_fixtures.json` with md5 hashes of the TorchScript
features so future runs (and other machines) can validate the flax path
WITHOUT torch: `pytest tests/ -k fixtures` consumes this file when present.
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _md5(a: np.ndarray) -> str:
    return hashlib.md5(np.ascontiguousarray(a, np.float32).tobytes()).hexdigest()


def validate(name: str, path: str, out: dict) -> bool:
    import torch
    import jax
    from stylegan_v_tpu.metrics import metric_utils

    model = torch.jit.load(path).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    rng = np.random.RandomState(0)

    if name == "i3d":
        from stylegan_v_tpu.metrics.detectors_flax import (
            convert_i3d_state_dict, i3d_features_fn)
        videos = rng.randint(0, 255, (4, 16, 224, 224, 3)).astype(np.uint8)
        with torch.no_grad():
            x = torch.from_numpy(videos.transpose(0, 4, 1, 2, 3)).float()
            want = model(x / 127.5 - 1.0, rescale=False, resize=False,
                         return_features=True).numpy()
        got = i3d_features_fn(convert_i3d_state_dict(sd))(videos)
    elif name == "c3d_ucf101":
        from stylegan_v_tpu.metrics.detectors_flax import (
            convert_c3d_state_dict, c3d_features_fn)
        videos = rng.randint(0, 255, (4, 16, 128, 128, 3)).astype(np.uint8)
        with torch.no_grad():
            x = torch.from_numpy(videos.transpose(0, 4, 1, 2, 3)).float()
            want = model(x).numpy()
        got = c3d_features_fn(convert_c3d_state_dict(sd))(videos)
    elif name == "inception":
        from stylegan_v_tpu.metrics.detectors_flax.inception_v3 import (
            InceptionV3, convert_inception_state_dict, inception_features_fn)
        import jax.numpy as jnp
        images = rng.randint(0, 255, (8, 299, 299, 3)).astype(np.uint8)
        with torch.no_grad():
            want = model(torch.from_numpy(images.transpose(0, 3, 1, 2))).numpy()
        template = InceptionV3().init(jax.random.PRNGKey(0),
                                      jnp.zeros((1, 299, 299, 3)))
        variables = convert_inception_state_dict(sd, template)
        got = inception_features_fn(variables)(images)
    else:
        raise ValueError(name)

    scale = np.abs(want).mean() + 1e-8
    max_rel = float(np.abs(want - got).max() / scale)
    mean_rel = float(np.abs(want - got).mean() / scale)
    ok = max_rel <= 1e-3 and mean_rel <= 1e-4
    print(f"{name:12s} max_rel {max_rel:.2e}  mean_rel {mean_rel:.2e}  "
          f"{'OK' if ok else 'FAIL'}")
    out[name] = {"file": os.path.basename(path),
                 "torch_features_md5": _md5(want),
                 "input_seed": 0, "max_rel": max_rel, "mean_rel": mean_rel,
                 "ok": ok}
    return ok


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--detector-dir", default=os.environ.get(
        "SGV_DETECTOR_DIR", "detectors"))
    ap.add_argument("--out", default="detector_fixtures.json")
    args = ap.parse_args()

    from stylegan_v_tpu.metrics.metric_utils import DETECTOR_FILES
    results, all_ok, found = {}, True, 0
    for name, fname in DETECTOR_FILES.items():
        path = os.path.join(args.detector_dir, fname)
        if not os.path.exists(path):
            print(f"{name:12s} SKIP ({path} not found — "
                  f"run scripts/download_detectors.py)")
            continue
        found += 1
        all_ok &= validate(name, path, results)

    if results:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {args.out}")
    if not found:
        print("No detector files found; nothing validated.")
        return 1
    return 0 if all_ok else 2


if __name__ == "__main__":
    raise SystemExit(main())
