"""Padding-aware MXU roofline from (unoptimized) HLO text.

The naive roofline (XLA cost-analysis flops / MXU peak) is unreachable for
narrow-channel convolutions: the v5e MXU is a 128x128 systolic array, so a
conv with 64 output features occupies half the lanes and a 3x3x64
contraction fills half the depth per tap — the hardware runs the same
wall-clock as the padded-to-128 problem. This module parses HLO text
(`jit(f).lower(...).as_text(dialect="hlo")`), extracts every `convolution`
and `dot` op, and charges each at its TILE-PADDED cost:

    eff_flops(conv) = 2 * up(M, 8) * ksp * up(Cin_g, 128) * up(N, 128)
    eff_flops(dot)  = 2 * B * up(M, 8) * up(K, 128) * up(N, 128)

where up(x, t) rounds up to the tile, M = batch*spatial rows, ksp = kernel
spatial taps, Cin_g = input features per group, N = output features.
Grouped/depthwise convolutions (feature_group_count > 1, e.g. the FIR
resampling passes) do not run as dense MXU GEMMs — they are bandwidth-bound
and charged zero MXU time (their bytes are already in the cost-analysis
HBM term).

Operand shapes are resolved through a first pass that maps every
instruction name to its result shape (HLO prints operands by name only).

Caveats (documented): ops outside a `lax.scan` loop body are counted once
per program even though they run once per call; pre-optimization HLO may
contain ops XLA later eliminates (both effects OVER-estimate the padded
roofline, so ratios computed against it are lower bounds on headroom);
tiny-Cin convs (e.g. fromrgb, Cin=3) are charged the full 128-deep tap
even though XLA may reassociate them.

No reference counterpart (the reference reports raw profiler output,
src/scripts/profile_model.py); this is the TPU-side analog of a
speed-of-light audit.
"""
from __future__ import annotations

import re
from typing import Dict, List

_DEF_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*([a-z0-9]+)\[([\d,]*)\]")
_CONV_RE = re.compile(r"convolution\(([^)]*)\)(.*)$")
_DOT_RE = re.compile(r"\bdot\(([^)]*)\)(.*)$")
_WINDOW_SIZE_RE = re.compile(r"window=\{[^}]*size=([\dx]+)")
_DIM_LABELS_RE = re.compile(r"dim_labels=(\S+?)(?:,|\s|$)")
_FGC_RE = re.compile(r"feature_group_count=(\d+)")
_BGC_RE = re.compile(r"batch_group_count=(\d+)")
_LHS_CONTRACT_RE = re.compile(r"lhs_contracting_dims=\{([\d,]*)\}")
_LHS_BATCH_RE = re.compile(r"lhs_batch_dims=\{([\d,]*)\}")
_RHS_BATCH_RE = re.compile(r"rhs_batch_dims=\{([\d,]*)\}")
_RHS_CONTRACT_RE = re.compile(r"rhs_contracting_dims=\{([\d,]*)\}")


def _up(x: int, tile: int) -> int:
    return max((x + tile - 1) // tile, 1) * tile


def _dims(csv: str) -> List[int]:
    return [int(d) for d in csv.split(",") if d]


_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1, "f8e4m3": 1,
                "f8e5m2": 1, "s64": 8, "u64": 8, "c64": 8}


def tile_padded_bytes(dtype: str, dims: List[int]) -> float:
    """HBM footprint of an array in the TPU tiled layout: minor dim padded
    to 128 lanes, second-minor to 8 sublanes x (4 / bytewidth) — i.e. (8,128)
    tiles for f32, (16,128) for bf16, (32,128) for u8. A [N,256,256,64] bf16
    activation therefore occupies 2x its logical bytes; a [N,256,256,3] f32
    image ~42x. Rank-0/1 arrays are charged logically (negligible)."""
    nbytes = _DTYPE_BYTES.get(dtype, 4)
    if len(dims) == 0:
        return float(nbytes)
    if len(dims) == 1:
        return float(nbytes * _up(dims[0], 128))
    sub = 8 * max(4 // nbytes, 1)
    elems = 1
    for d in dims[:-2]:
        elems *= d
    elems *= _up(dims[-2], sub) * _up(dims[-1], 128)
    return float(nbytes * elems)


def _operand_names(argstr: str) -> List[str]:
    names = []
    for tok in argstr.split(","):
        tok = tok.strip()
        if not tok:
            continue
        names.append(tok.split()[-1].lstrip("%"))
    return names


def _shape_map(hlo_text: str) -> Dict[str, tuple]:
    shapes: Dict[str, tuple] = {}
    for line in hlo_text.splitlines():
        m = _DEF_RE.match(line)
        if m is not None:
            shapes[m.group(1)] = (m.group(2), _dims(m.group(3)))
    return shapes


def parse_contractions(hlo_text: str) -> List[Dict]:
    """All convolution/dot ops in the HLO text with naive and tile-padded
    flop counts. Returns dicts with keys: kind, out_dtype, m/k/n/ksp/groups,
    flops, eff_flops."""
    shapes = _shape_map(hlo_text)
    out: List[Dict] = []
    for line in hlo_text.splitlines():
        d = _DEF_RE.match(line)
        if d is None:
            continue
        oname, odt, oshape_csv = d.groups()
        oshape = _dims(oshape_csv)

        m = _CONV_RE.search(line)
        if m is not None and "dim_labels=" in line:
            argstr, attrs = m.groups()
            ops_names = _operand_names(argstr)
            dl = _DIM_LABELS_RE.search(attrs)
            if dl is None or len(ops_names) < 2 or not oshape:
                continue
            lhs_spec, rest = dl.group(1).split("_", 1)
            rhs_spec, out_spec = rest.split("->")
            groups = int(g.group(1)) if (g := _FGC_RE.search(attrs)) else 1
            bgc = int(g.group(1)) if (g := _BGC_RE.search(attrs)) else 1
            n_feat = oshape[out_spec.index("f")]
            rows = 1
            for i, c in enumerate(out_spec):
                if c != "f":
                    rows *= oshape[i]
            ldt, lshape = shapes.get(ops_names[0], (None, None))
            rdt, rshape = shapes.get(ops_names[1], (None, None))
            if rshape is not None and len(rshape) == len(rhs_spec):
                cin_g = rshape[rhs_spec.index("i")]
                ksp = 1
                for i, c in enumerate(rhs_spec):
                    if c not in ("i", "o"):
                        ksp *= rshape[i]
            else:                       # fall back to the window attribute
                w = _WINDOW_SIZE_RE.search(attrs)
                ksp = 1
                if w is not None:
                    for s in w.group(1).split("x"):
                        ksp *= int(s)
                cin_g = (lshape[lhs_spec.index("f")] // max(groups, 1)
                         if lshape and len(lshape) == len(lhs_spec) else 0)
            k = ksp * cin_g
            flops = 2.0 * rows * k * n_feat
            if groups > 1 or bgc > 1:
                eff = 0.0       # depthwise/grouped: not a dense MXU GEMM
            else:
                eff = 2.0 * _up(rows, 8) * ksp * _up(cin_g, 128) * _up(n_feat, 128)
            eff_bytes = tile_padded_bytes(odt, oshape)
            for dt, sh in ((ldt, lshape), (rdt, rshape)):
                if sh is not None:
                    eff_bytes += tile_padded_bytes(dt, sh)
            out.append(dict(kind="conv", out_dtype=odt, m=rows, k=k,
                            n=n_feat, ksp=ksp, groups=groups, flops=flops,
                            eff_flops=eff, eff_bytes=eff_bytes, name=oname))
            continue

        m = _DOT_RE.search(line)
        if m is not None and "contracting_dims=" in line:
            argstr, attrs = m.groups()
            ops_names = _operand_names(argstr)
            if len(ops_names) < 2:
                continue
            ldt, lshape = shapes.get(ops_names[0], (None, None))
            rdt, rshape = shapes.get(ops_names[1], (None, None))
            if lshape is None or rshape is None:
                continue
            lc = _dims(g.group(1)) if (g := _LHS_CONTRACT_RE.search(attrs)) else []
            rc = _dims(g.group(1)) if (g := _RHS_CONTRACT_RE.search(attrs)) else []
            lb = _dims(g.group(1)) if (g := _LHS_BATCH_RE.search(attrs)) else []
            rb = _dims(g.group(1)) if (g := _RHS_BATCH_RE.search(attrs)) else []
            kdim = 1
            for i in lc:
                kdim *= lshape[i]
            bdim = 1
            for i in lb:
                bdim *= lshape[i]
            mdim = 1
            for i in range(len(lshape)):
                if i not in lc and i not in lb:
                    mdim *= lshape[i]
            ndim = 1
            for i in range(len(rshape)):
                if i not in rc and i not in rb:
                    ndim *= rshape[i]
            flops = 2.0 * bdim * mdim * kdim * ndim
            eff = 2.0 * bdim * _up(mdim, 8) * _up(kdim, 128) * _up(ndim, 128)
            eff_bytes = (tile_padded_bytes(odt, oshape)
                         + tile_padded_bytes(ldt, lshape)
                         + tile_padded_bytes(rdt, rshape))
            out.append(dict(kind="dot", out_dtype=odt, m=mdim, k=kdim,
                            n=ndim, ksp=1, groups=1, flops=flops,
                            eff_flops=eff, eff_bytes=eff_bytes, name=oname))
    return out


def effective_mxu_seconds(hlo_text: str, peak_flops: float = 197.3e12,
                          hbm_bw: float = 820e9) -> Dict:
    """Summarize: naive vs tile-padded MXU seconds, plus the tile-padded IO
    bytes of the contraction ops alone (a LOWER bound on HBM traffic —
    elementwise chains between contractions add more), for one execution of
    the program text (scan bodies counted once — i.e. per-iteration when
    the program is a K-iteration scan)."""
    ops = parse_contractions(hlo_text)
    naive = sum(o["flops"] for o in ops) / peak_flops
    eff = sum(o["eff_flops"] for o in ops) / peak_flops
    eff_bytes = sum(o.get("eff_bytes", 0.0) for o in ops)
    return dict(naive_s=naive, eff_s=eff, eff_bytes=eff_bytes,
                eff_hbm_s=eff_bytes / hbm_bw, num_ops=len(ops), ops=ops)
