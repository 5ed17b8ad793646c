#!/usr/bin/env python
"""Detector-seed stability check for the random-feature FVD witness.

The FVD-demo metric uses the production flax I3D under FIXED random
weights; a single random projection could in principle rank snapshots by
noise. This tool reads 2+ per-seed metric jsonl series (produced by
scripts/fvd_demo_backfill.py --detector-seed N --out-jsonl <file> --force)
and reports the pairwise Spearman rank correlation of the FVD-vs-snapshot
series. Rankings agreeing (rho >= ~0.8) across independent detector seeds
means the convergence witness tracks the generated distribution, not one
projection's noise (the random-feature analog of the reference's
detector-credibility chain, reference README.md:144-145).

    python scripts/fvd_seed_agreement.py runs/fvd_demo/metric-fvd2048_16f.jsonl \
        runs/fvd_demo/metric-fvd2048_16f.seed18.jsonl [...]
"""
from __future__ import annotations

import json
import sys

import numpy as np


def load_series(path: str, metric: str = "fvd2048_16f"):
    rows = [json.loads(l) for l in open(path)]
    out = {}
    for r in rows:
        # Key by snapshot NAME: the in-training series records the true
        # nimg at snapshot time (e.g. 16032) while backfill rescoring
        # records the name-derived kimg (16000) — names are the join key.
        if r.get("snapshot") and metric in r.get("results", {}):
            out[r["snapshot"]] = float(r["results"][metric])
    return out


def spearman(a: np.ndarray, b: np.ndarray) -> float:
    def rank(x):
        order = np.argsort(x)
        r = np.empty_like(order, dtype=np.float64)
        r[order] = np.arange(len(x))
        # average ties
        for v in np.unique(x):
            m = x == v
            if m.sum() > 1:
                r[m] = r[m].mean()
        return r
    ra, rb = rank(a), rank(b)
    ra -= ra.mean()
    rb -= rb.mean()
    denom = np.sqrt((ra ** 2).sum() * (rb ** 2).sum())
    return float((ra * rb).sum() / denom) if denom > 0 else float("nan")


def main():
    paths = sys.argv[1:]
    assert len(paths) >= 2, __doc__
    series = {p: load_series(p) for p in paths}
    common = sorted(set.intersection(*(set(s) for s in series.values())))
    assert len(common) >= 3, f"only {len(common)} common snapshots"
    print(f"{len(common)} common snapshots: {common[0]}..{common[-1]}")
    vals = {p: np.array([series[p][k] for k in common]) for p in paths}
    ok = True
    for i in range(len(paths)):
        for j in range(i + 1, len(paths)):
            rho = spearman(vals[paths[i]], vals[paths[j]])
            tag = "OK" if rho >= 0.8 else "DISAGREE"
            ok = ok and rho >= 0.8
            print(f"spearman({paths[i].split('/')[-1]}, "
                  f"{paths[j].split('/')[-1]}) = {rho:+.3f}  [{tag}]")
    print("rank agreement:", "PASS (>=0.8 pairwise)" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
