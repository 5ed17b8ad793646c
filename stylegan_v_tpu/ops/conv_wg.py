"""Space-to-batch weight-gradient reformulation for stride-1 dense convs.

Why: the round-4 tile-padded MXU roofline audit (docs/PERF.md, reproduced
with `scripts/bench_phases.py --hlo-audit`) showed the single most padded
ops in the training backward are the WEIGHT-GRADIENT convolutions of the
high-resolution blocks: XLA lowers dW for a stride-1 conv as a convolution
whose per-tap contraction depth is the BATCH dimension.  At the production
shape (batch 16 videos x 3 frames = 48) that depth pads 48 -> 128 on the
v5e's 128x128 systolic array, a 2.7x waste on the largest ops.

The fix is a problem-shape rewrite, not a schedule change: partition the
OUTPUT spatial domain into sh x sw quadrants, stack the quadrants along the
contraction (batch) axis, and compute ONE weight-grad conv with depth
sh*sw*N and 1/(sh*sw) of the spatial taps.  Summing over output positions
is associative, so the result is bit-identical up to f32 accumulation
order.  With N=48 and sh*sw=8 the depth is 384 = 3 full 128-lane tiles:
ZERO depth padding, a 2.67x padded-cost reduction on these ops (the 2x2
estimate in the audit was conservative).  The lhs quadrants only duplicate
a (k-1)-pixel halo (~3% at 256^2), unlike the naive phase-decomposition
(rhs_dilation form) which replicates the whole input sh*sw times.

This mirrors what XLA's own space-to-batch pass does for large-spatial
FORWARD convs; as of the audited toolchain it does not apply it to the
weight-grad convs AD emits, so we reformulate at the AD level with a
custom VJP.  The data-grad (dx) and forward keep their natural lowering.

Reference analog: the reference leaves this to cuDNN algo selection
(wgrad kernels pick tile shapes per problem), reference
src/torch_utils/ops/conv2d_gradfix.py:1-26 routes torch's backward.

MEASURED NEGATIVE RESULT (v5e, docs/PERF.md round-5 table): at the
production shape (256^2, batch 16x3) the quadrant-stacked program is
SLOWER end-to-end — full step 284.7 ms vs 247.7 ms naive (Gmain grad
113.1 -> 137.2 ms, Dmain 139.3 -> 156.5 ms).  The padded-MXU win is real
but the reformulation's lhs concatenate + rhs transpose materializations
raise the op's HBM traffic past the MXU saving (the audit's own HBM
roofline for Gmain rises 57.8 -> 90.7 ms), flipping the op HBM-bound.
The cost model here counts only padded MXU flops, so "auto" mispredicts;
the implementation is kept (correct to 1e-3 through second order on
chip, `scripts/drive_conv_wg_onchip.py`) for shapes where depth padding
dominates, but it is NOT the default.

Selection: `SGV_CONV_WG_S2B` = "0" (DEFAULT: off — see the measured
negative result above), "auto" (apply whenever the padded MXU cost
strictly improves — mispredicts HBM-bound shapes), or "force" (apply
whenever shapes divide — for tests).
"""
from __future__ import annotations

import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_MODE = os.environ.get("SGV_CONV_WG_S2B", "0")

_LANE = 128          # MXU contraction tile depth (v5e)


def _up(n: int, m: int) -> int:
    return -(-n // m) * m


def choose_s2b_factors(N: int, Ho: int, Wo: int, kh: int, kw: int
                       ) -> Optional[Tuple[int, int]]:
    """Pick (sh, sw) minimizing padded weight-grad cost, or None if the
    naive lowering is already optimal (or shapes don't divide).

    Padded cost model (utils/roofline.py): taps * up(depth, 128) with
    taps = (Ho/sh)*(Wo/sw), depth = sh*sw*N. Only exact divisors are
    considered, and quadrants must stay at least kernel-sized.
    """
    if _MODE == "0":
        return None
    best, best_cost = None, Ho * Wo * _up(N, _LANE)  # naive (sh=sw=1)
    if _MODE == "force":
        best_cost = float("inf")
    for sh in (1, 2, 4):
        for sw in (1, 2, 4):
            s = sh * sw
            if s == 1 or Ho % sh or Wo % sw:
                continue
            if Ho // sh < kh or Wo // sw < kw:
                continue
            cost = (Ho // sh) * (Wo // sw) * _up(s * N, _LANE)
            if cost < best_cost:
                best, best_cost = (sh, sw), cost
    return best


def _wg_s2b(xp: jax.Array, dy: jax.Array, kh: int, kw: int,
            sh: int, sw: int) -> jax.Array:
    """dW [kh,kw,I,O] of y = convVALID(xp, w) via quadrant-stacked conv.

    xp: [N, Hp, Wp, I] (already padded), dy: [N, Ho, Wo, O] with
    Ho = Hp-kh+1, Wo = Wp-kw+1, Ho % sh == 0, Wo % sw == 0.
    """
    N, Hp, Wp, I = xp.shape
    _, Ho, Wo, O = dy.shape
    hq, wq = Ho // sh, Wo // sw
    # lhs quadrants with a (k-1) halo, stacked i-major/j-minor along the
    # contraction axis; rhs is a pure reshape/transpose in the same order.
    lhs = jnp.concatenate(
        [xp[:, i * hq: i * hq + hq + kh - 1, j * wq: j * wq + wq + kw - 1, :]
         for i in range(sh) for j in range(sw)], axis=0)
    rhs = dy.reshape(N, sh, hq, sw, wq, O).transpose(1, 3, 0, 2, 4, 5)
    rhs = rhs.reshape(sh * sw * N, hq, wq, O)
    # Contraction over the stacked axis: lhs dim0 is 'C', rhs dim0 is 'I';
    # the dataset batch I rides as conv-batch 'N', O as out features 'C'.
    return lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("CHWN", "IHWO", "HWNC"))


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv_valid_s2b(xp: jax.Array, w: jax.Array,
                   factors: Tuple[int, int]) -> jax.Array:
    """VALID stride-1 dense conv (NHWC x HWIO) whose weight-grad lowers via
    space-to-batch quadrant stacking. Forward and data-grad are the natural
    XLA lowerings; only dW's program changes (same math, associativity)."""
    return lax.conv_general_dilated(
        xp, w, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _fwd(xp, w, factors):
    return conv_valid_s2b(xp, w, factors), (xp, w)


def _bwd(factors, res, dy):
    xp, w = res
    kh, kw, _, _ = w.shape
    sh, sw = factors
    # dx: full-correlation with the spatially-flipped, I/O-swapped kernel —
    # the standard transpose, left on its natural lowering.
    wt = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
    dxp = lax.conv_general_dilated(
        dy, wt, window_strides=(1, 1),
        padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    dw = _wg_s2b(xp, dy, kh, kw, sh, sw).astype(w.dtype)
    return dxp, dw


conv_valid_s2b.defvjp(_fwd, _bwd)
