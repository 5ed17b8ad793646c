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
reports max/mean feature deltas, asserts the agreement gate, and writes
`detector_fixtures.json` with md5 hashes + feature samples of the
TorchScript outputs so future runs (and other machines) can re-validate the
flax ports against the RECORDED reference features:
`pytest tests/test_detector_fixtures.py` consumes this file when both it
and the detector files are present (skipped otherwise).
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


def fixture_inputs(name: str):
    """Deterministic per-case uint8 inputs, shared by this script and
    tests/test_detector_fixtures.py so recorded reference features stay
    reproducible byte-for-byte."""
    rng = np.random.RandomState(0)
    if name == "i3d":
        return [(f"{r}^2", rng.randint(0, 255, (4, 16, r, r, 3))
                 .astype(np.uint8)) for r in (224, 256)]
    if name == "c3d_ucf101":
        return [(f"{r}^2", rng.randint(0, 255, (4, 16, r, r, 3))
                 .astype(np.uint8)) for r in (112, 256)]
    if name == "inception":
        cases = [(f"{r}^2 feats", rng.randint(0, 255, (8, r, r, 3))
                  .astype(np.uint8)) for r in (299, 256)]
        cases.append(("256^2 probs",
                      rng.randint(0, 255, (8, 256, 256, 3)).astype(np.uint8)))
        return cases
    raise ValueError(name)


def validate(name: str, path: str, out: dict) -> bool:
    """Gate the flax port against the TorchScript at NATIVE resolution (the
    detector's internal operating size, where any resize is a no-op) AND at a
    NON-NATIVE one (256^2, every BASELINE dataset's shape family), invoking
    the TorchScript exactly as the metrics do — raw uint8, reference kwargs —
    so the gate exercises the internal rescale+resize preprocessing too."""
    import torch
    import jax
    from stylegan_v_tpu.metrics import metric_utils

    model = torch.jit.load(path).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    def torch_raw(arr, **kwargs):
        perm = (0, 4, 1, 2, 3) if arr.ndim == 5 else (0, 3, 1, 2)
        with torch.no_grad():
            return model(torch.from_numpy(
                np.ascontiguousarray(arr.transpose(perm))), **kwargs).numpy()

    flax_fns = build_flax_case_fns(name, sd)
    case_kwargs = CASE_TORCH_KWARGS[name]
    cases = []   # (label, want, got)
    for (label, inp), kw in zip(fixture_inputs(name), case_kwargs):
        cases.append((label, torch_raw(inp, **kw), flax_fns[label](inp)))
    if name == "c3d_ucf101" and "preprocess" not in convert_c3d_sd_cache[0]:
        print(f"{name:12s} NOTE: no mean buffer found in the TorchScript "
              f"state_dict — flax path uses the channel-mean fallback")

    ok = True
    out[name] = {"file": os.path.basename(path), "input_seed": 0, "cases": {}}
    for label, want, got in cases:
        scale = np.abs(want).mean() + 1e-8
        max_rel = float(np.abs(want - got).max() / scale)
        mean_rel = float(np.abs(want - got).mean() / scale)
        case_ok = max_rel <= 1e-3 and mean_rel <= 1e-4
        ok &= case_ok
        print(f"{name:12s} {label:12s} max_rel {max_rel:.2e}  "
              f"mean_rel {mean_rel:.2e}  {'OK' if case_ok else 'FAIL'}")
        out[name]["cases"][label] = {
            "torch_features_md5": _md5(want),
            "want_sample": [round(float(v), 6) for v in
                            np.asarray(want, np.float64).ravel()[:16]],
            "want_mean_abs": float(np.abs(want).mean()),
            "max_rel": max_rel, "mean_rel": mean_rel, "ok": case_ok}
    out[name]["ok"] = ok
    return ok


# reference detector kwargs per case, in fixture_inputs order (FVD:
# frechet_video_distance.py:23; FID: return_features; IS: no_output_bias)
CASE_TORCH_KWARGS = {
    "i3d": [dict(rescale=True, resize=True, return_features=True)] * 2,
    "c3d_ucf101": [{}] * 2,
    "inception": [dict(return_features=True), dict(return_features=True),
                  dict(no_output_bias=True)],
}
convert_c3d_sd_cache = [{}]


def build_flax_case_fns(name: str, sd: dict):
    """label -> flax features fn, invoked with the SAME reference kwargs the
    TorchScript gets (shared by validate() and the fixtures test)."""
    import jax
    if name == "i3d":
        from stylegan_v_tpu.metrics.detectors_flax import (
            convert_i3d_state_dict, i3d_features_fn)
        fn = i3d_features_fn(convert_i3d_state_dict(sd), rescale=True,
                             resize=True, return_features=True)
        return {"224^2": fn, "256^2": fn}
    if name == "c3d_ucf101":
        from stylegan_v_tpu.metrics.detectors_flax import (
            convert_c3d_state_dict, c3d_features_fn)
        variables = convert_c3d_state_dict(sd)
        convert_c3d_sd_cache[0] = variables
        fn = c3d_features_fn(variables)
        return {"112^2": fn, "256^2": fn}
    if name == "inception":
        from stylegan_v_tpu.metrics.detectors_flax.inception_v3 import (
            InceptionV3, convert_inception_state_dict, inception_features_fn)
        import jax.numpy as jnp
        template = InceptionV3().init(jax.random.PRNGKey(0),
                                      jnp.zeros((1, 299, 299, 3)))
        variables = convert_inception_state_dict(sd, template)
        feats = inception_features_fn(variables, return_features=True)
        probs = inception_features_fn(variables, no_output_bias=True)
        return {"299^2 feats": feats, "256^2 feats": feats,
                "256^2 probs": probs}
    raise ValueError(name)


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
