"""Re-validate the flax detector ports against RECORDED reference features.

scripts/validate_detectors.py writes detector_fixtures.json after running the
real TorchScript files (impossible in the no-egress build sandbox); when that
file AND the detector weight files are present, this test rebuilds the flax
ports and asserts they still reproduce the recorded TorchScript features —
the standing real-weight gate of VERDICT r2 task 10. Skipped otherwise.
"""
import importlib.util
import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.environ.get("SGV_DETECTOR_FIXTURES",
                          os.path.join(REPO, "detector_fixtures.json"))
DETECTOR_DIR = os.environ.get("SGV_DETECTOR_DIR",
                              os.path.join(os.getcwd(), "detectors"))


def _load_validator():
    spec = importlib.util.spec_from_file_location(
        "validate_detectors",
        os.path.join(REPO, "scripts", "validate_detectors.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not os.path.isfile(FIXTURES),
                    reason="no detector_fixtures.json recorded yet "
                           "(run scripts/validate_detectors.py)")
def test_flax_ports_match_recorded_reference_features():
    torch = pytest.importorskip("torch")
    from stylegan_v_tpu.metrics.metric_utils import DETECTOR_FILES
    val = _load_validator()
    with open(FIXTURES) as f:
        fixtures = json.load(f)

    checked = 0
    for name, rec in fixtures.items():
        path = os.path.join(DETECTOR_DIR, DETECTOR_FILES.get(name, name))
        if not os.path.isfile(path):
            continue
        sd = {k: v.numpy() for k, v in
              torch.jit.load(path).state_dict().items()}
        fns = val.build_flax_case_fns(name, sd)
        for label, inp in val.fixture_inputs(name):
            case = rec["cases"][label]
            got = np.asarray(fns[label](inp), np.float64)
            want_sample = np.asarray(case["want_sample"], np.float64)
            scale = case["want_mean_abs"] + 1e-8
            max_rel = np.abs(got.ravel()[:len(want_sample)]
                             - want_sample).max() / scale
            assert max_rel <= 2e-3, (name, label, max_rel)
            checked += 1
    if checked == 0:
        pytest.skip("fixtures recorded but no detector files present")
