"""Two-pass shear/scale affine warp — the TPU-native fast path for ADA's
anti-aliased geometric transform (reference augment.py:188-300).

Why: the single-gather bilinear warp is INDEX-COUNT bound on TPU (no texture
unit; measured 218 ms of a 244 ms AA-warp at the production FFS-256 training
shape, B=16 C=9 on v5e — see BENCH notes). A classic two-pass resampling
(Catmull/Smith) factors the affine map into a vertical pass and a horizontal
pass; each pass decomposes into
    * a per-line INTEGER shift  -> one contiguous dynamic-slice per line
      (O(B*(H+W)) gather indices instead of O(B*H*W)),
    * a dense 2-tap fractional-shift lerp (pure VPU),
    * a per-sample UNIFORM scale resample -> shared row indices
      (take_along_axis on [B, L, W*C] rows: O(B*L) indices moving full lines).
All heavy data movement is contiguous lines, so the pass is bandwidth-, not
index-, limited.

Math. Output pixel v=(x,y) samples input at M v + t (pixel space). Factor
    M = [[a, b], [c, d]] = H_x * V_y,
    V_y: y_in = (c/a)*x_mid + (d - c*b/a)*y_mid + e   (vertical resample)
    H_x: x_mid = a*x_out + b*y_out + tx               (horizontal resample)
with e = ty - (c/a)*tx. When |a| < |c| the factorization is ill-conditioned
(near +-90 deg rotations); those samples are pre-rotated by an EXACT rot90
blit of the source (transpose+flip, dense) and their matrix is re-derived, so
every sample is warped with a well-conditioned pair of passes.

Differences vs the single-gather path (documented divergence, same spirit as
the static-shape notes in training/augment.py): two sequential bilinear
interpolations instead of one 2-D bilinear tap (slightly smoother; the ADA
pipeline applies this on the 2x-supersampled canvas where the difference is
sub-LSB for natural images), and per-sample |shear|/|scale| are clamped to
the static margins (SHEAR_MAX/SCALE_MAX) — beyond-3-sigma outlier transforms
saturate instead of wrapping. Boundaries are reflect (mirrored), matching
ops/grid_sample.py.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

SCALE_MAX = 4.0     # |per-axis scale| clamp (ADA 3-sigma scale*aniso < 2.4)
SHEAR_MAX = 2.0     # |shear slope| clamp after the rot90 conditioning

# Stage executors, A/B-selectable for benchmarking (scripts/
# bench_shear_stages.py). Defaults are the on-chip v5e winners (docs/PERF.md
# round-3 table): the one-hot-matmul resample halves stage-1 fwd+bwd (the
# VJP becomes a transposed matmul instead of a scatter-add), and the
# grouped-slice+residual-FIR shift cuts stage-2 fwd+bwd ~1.6x (4 coarse
# dynamic slices per group + a dense bounded-window select instead of
# per-line gathers).
STAGE1_IMPL = os.environ.get("SGV_SHEAR_STAGE1", "onehot")   # onehot | gather
# dense | grouped | slice — "dense" is the round-5 lane-dense executor (see
# _shift_lines_dense): the grouped executor's select/lerp tensors end in
# C=9 lanes (7% of the 128-lane VPU tile), which dominated the measured
# warp cost; dense keeps the payload packed [B, L, N*C] (full lanes),
# resolves the WHOLE integer shift as a barrel over the sublane axis, and
# needs no pre/post transposes in the shear passes. DEFAULT since the
# round-5 on-chip A/B (docs/PERF.md): full warp fwd 26.8 vs 36.4 ms,
# fwd+bwd 71.9 vs 82.0 ms at the production shape, and
# validate_shear_onchip.py passes all of 32..1024^2 fwd+bwd under it.
STAGE2_IMPL = os.environ.get("SGV_SHEAR_STAGE2", "dense")
# residual-shift executor inside the grouped stage-2: "barrel" resolves the
# bounded residual in ceil(log2(rmax+1)) two-way select passes (a barrel
# shifter over the coarse window); "loop" is the round-3 dense
# masked-accumulate over all rmax+1 positions (rmax+1 full-tensor passes).
STAGE2_SELECT = os.environ.get("SGV_SHEAR_SELECT", "barrel")  # barrel | loop


def _reflect_pad_len(L: int) -> int:
    return L // 2


def _mirror_idx(i: jax.Array, size: int) -> jax.Array:
    """Mirror integer indices into [0, size) (reflect, no edge repeat)."""
    period = 2 * size
    i = jnp.mod(i, period)
    return jnp.where(i < size, i, period - 1 - i)


def _line_pass(x: jax.Array, shift: jax.Array, scale: jax.Array,
               out_len: int) -> jax.Array:
    """Resample the SECOND axis of x [B, L, R] (R = folded line payload):
    out[b, i, :] = x[b, scale[b]*i + shift[b, ?], :] with bilinear taps.

    shift/scale: [B] per-sample scalars (per-line offsets are handled by the
    caller's integer-shift stage). This is the shared uniform-scale resample:
    indices depend on (b, i) alone -> O(B*out_len) gather indices, each
    moving a full [R] row.
    """
    B, L, R = x.shape
    pos = scale[:, None] * jnp.arange(out_len, dtype=jnp.float32)[None, :] \
        + shift[:, None]                                       # [B, out]
    i0 = jnp.floor(pos).astype(jnp.int32)
    f = (pos - i0.astype(jnp.float32))[..., None]
    i0m = _mirror_idx(i0, L)
    i1m = _mirror_idx(i0 + 1, L)
    g0 = jnp.take_along_axis(x, i0m[:, :, None], axis=1)
    g1 = jnp.take_along_axis(x, i1m[:, :, None], axis=1)
    f = f.astype(x.dtype)          # keep the payload dtype (bf16 fast path)
    return g0 * (1 - f) + g1 * f


def _line_pass_onehot(x: jax.Array, shift: jax.Array, scale: jax.Array,
                      out_len: int) -> jax.Array:
    """MXU formulation of `_line_pass`: the shared-scale 2-tap resample is a
    banded row-mixing matrix S [out, L] (two nonzeros per row, mirror
    indexing folded into the band positions), applied as one batched matmul
    S @ x. Forward rides the MXU instead of row gathers, and the VJP is the
    TRANSPOSED matmul instead of a scatter-add — measured 2.0x faster
    fwd+bwd than take_along_axis at the production shape on v5e."""
    B, L, R = x.shape
    pos = scale[:, None] * jnp.arange(out_len, dtype=jnp.float32)[None, :] \
        + shift[:, None]                                       # [B, out]
    i0 = jnp.floor(pos).astype(jnp.int32)
    f = pos - i0.astype(jnp.float32)
    i0m = _mirror_idx(i0, L)
    i1m = _mirror_idx(i0 + 1, L)
    rows = jnp.arange(L, dtype=jnp.int32)[None, None, :]
    S = ((rows == i0m[:, :, None]) * (1.0 - f)[:, :, None]
         + (rows == i1m[:, :, None]) * f[:, :, None])          # [B, out, L]
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    out = jax.lax.dot_general(
        S.astype(x.dtype), x, (((2,), (1,)), ((0,), (0,))),
        precision=prec, preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def _resample_lines(x, shift, scale, out_len):
    impl = _line_pass_onehot if STAGE1_IMPL == "onehot" else _line_pass
    return impl(x, shift, scale, out_len)


def _integer_shift_lines(x: jax.Array, k: jax.Array, frac: jax.Array,
                         out_len: int) -> jax.Array:
    """Fractional per-line shift along the LAST-but-one axis.

    x [B, N, L, C]; k [B, N] integer starts; frac [B, N] in [0,1).
    Returns [B, N, out_len, C] = x[b, n, k + j (+1)] lerped — one contiguous
    dynamic-slice per line (O(B*N) gather indices)."""
    B, N, L, C = x.shape
    k = jnp.clip(k, 0, L - out_len - 1)

    def slice_one(line, start):                   # [L, C] -> [out_len + 1, C]
        return jax.lax.dynamic_slice(line, (start, 0), (out_len + 1, C))

    sl = jax.vmap(jax.vmap(slice_one))(x, k)      # [B, N, out_len+1, C]
    f = frac[:, :, None, None].astype(x.dtype)    # keep the payload dtype
    return sl[:, :, :-1] * (1 - f) + sl[:, :, 1:] * f


def _shift_lines_grouped_impl(x: jax.Array, k: jax.Array, frac: jax.Array,
                              out_len: int, slope_bound: float,
                              group: int = 4) -> jax.Array:
    """EXACT reformulation of `_integer_shift_lines` with O(B*N/group)
    gather work: per-line starts k vary (at most) linearly across lines with
    |dk/dline| <= slope_bound (the shear slope after the static clamps), so
    a GROUP of `group` adjacent lines shares one coarse dynamic slice at
    k0 = min(k in group), and the bounded residual k - k0 <= rmax is applied
    as a dense masked 2-tap select over the rmax+1-row window (pure VPU, no
    per-line gathers). Zero-padding on the L axis keeps the coarse slice
    in-bounds; padded rows are never selected because resid <= rmax by
    construction. Measured 1.6x faster fwd+bwd than the per-line
    dynamic-slice form at the production shape on v5e."""
    B, N, L, C = x.shape
    k = jnp.clip(k, 0, L - out_len - 1)
    rmax = int(slope_bound) * (group - 1) + 2
    Np = -(-N // group) * group
    if Np != N:
        x = jnp.pad(x, ((0, 0), (0, Np - N), (0, 0), (0, 0)))
        # edge-pad k: a zero-padded line would drag the group min down and
        # push real residuals past rmax
        k = jnp.pad(k, ((0, 0), (0, Np - N)), mode="edge")
        frac = jnp.pad(frac, ((0, 0), (0, Np - N)))
    G = Np // group
    kg = k.reshape(B, G, group)
    k0 = kg.min(axis=2)                                   # [B, G]
    resid = jnp.clip(kg - k0[:, :, None], 0, rmax)        # [B, G, group]
    # window margin: the barrel shifter needs the next power of two so every
    # bit-level slice stays statically in-bounds (rpad >= rmax; padded rows
    # are zeros and never reachable since resid <= rmax)
    rpad = (1 << rmax.bit_length()) - 1 if STAGE2_SELECT == "barrel" else rmax
    # pad L so the coarse slice (size out_len + rpad + 1) never clamps
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, rpad + 1), (0, 0)))
    zg = xp.reshape(B, G, group, L + rpad + 1, C)

    def coarse(lines, start):        # [group, Lp, C], scalar
        return jax.lax.dynamic_slice(
            lines, (0, start, 0), (group, out_len + rpad + 1, C))

    zc = jax.vmap(jax.vmap(coarse))(zg, k0)   # [B, G, group, out+rpad+1, C]
    f = frac.reshape(B, G, group)[..., None, None].astype(x.dtype)
    if STAGE2_SELECT == "barrel":
        # resolve resid bit by bit, high to low: at bit j the window either
        # drops its first 2^j rows or keeps its head, then shrinks to
        # out_len + 2^j rows — ceil(log2(rmax+1)) two-way selects instead of
        # rmax+1 masked accumulations. Window length before bit j is exactly
        # out_len + 2^(j+1), so both slices are statically in-bounds.
        cur = zc
        for j in reversed(range(rmax.bit_length())):
            step = 1 << j
            newlen = out_len + step
            bit = (resid & step) != 0                     # [B, G, group]
            hi = jax.lax.slice_in_dim(cur, step, step + newlen, axis=3)
            lo = jax.lax.slice_in_dim(cur, 0, newlen, axis=3)
            cur = jnp.where(bit[..., None, None], hi, lo)
        out = cur[:, :, :, :-1] * (1 - f) + cur[:, :, :, 1:] * f
    else:
        out = jnp.zeros((B, G, group, out_len, C), x.dtype)
        for j in range(rmax + 1):             # static starts — no gathers
            w = (resid == j).astype(x.dtype)[..., None, None]
            sl = jax.lax.dynamic_slice_in_dim(zc, j, out_len + 1, axis=3)
            out = out + w * (sl[:, :, :, :-1] * (1 - f)
                             + sl[:, :, :, 1:] * f)
    return out.reshape(B, Np, out_len, C)[:, :N]


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _shift_lines_grouped(x, k, frac, out_len, slope_bound):
    """Grouped shift with a TRANSPOSED-SHIFT custom VJP.

    The op is linear in x: out = A_k,f @ x with A a per-line 2-tap band, so
    dx = A^T @ g — itself a per-line 2-tap band shift with start
    (L-out-1 - k) and swapped taps (frac' = 1 - frac) on the zero-padded
    cotangent. Autodiff of the forward instead accumulates rmax+1 full-size
    dynamic-update-slices (measured 382 ms fwd+bwd at the production shape
    vs 43 ms fwd); the transposed-shift backward is just one more grouped
    shift. dfrac is the true derivative (the shifted window of the first
    difference of x — one more grouped shift, DCE'd by XLA whenever frac's
    cotangent is unused, as in training where frac derives from the ADA
    RNG draw); k is integer-valued (float0)."""
    return _shift_lines_grouped_impl(x, k, frac, out_len, slope_bound)


def _shift_lines_grouped_fwd(x, k, frac, out_len, slope_bound):
    out = _shift_lines_grouped_impl(x, k, frac, out_len, slope_bound)
    return out, (x, k, frac)


def _shift_lines_grouped_bwd(out_len, slope_bound, res, g):
    x, k, frac = res
    import numpy as np
    L = x.shape[2]
    pad = L - out_len
    kc = jnp.clip(k, 0, L - out_len - 1)      # same clip as the forward
    gpad = jnp.pad(g, ((0, 0), (0, 0), (pad, pad), (0, 0)))
    dx = _shift_lines_grouped_impl(gpad, (pad - 1) - kc, 1.0 - frac, L,
                                   slope_bound)
    # d out / d frac = sl[1:] - sl[:-1] = Δx[k : k+out] (Δx = first diff
    # along the shifted axis): a frac=0 grouped shift of Δx, contracted
    # against the cotangent
    dxd = jnp.pad(jnp.diff(x, axis=2), ((0, 0), (0, 0), (0, 1), (0, 0)))
    win = _shift_lines_grouped_impl(dxd, kc, jnp.zeros_like(frac), out_len,
                                    slope_bound)
    dfrac = jnp.sum((g * win).astype(jnp.float32), axis=(2, 3)).astype(
        frac.dtype)
    dk = np.zeros(k.shape, jax.dtypes.float0)
    return dx, dk, dfrac


_shift_lines_grouped.defvjp(_shift_lines_grouped_fwd, _shift_lines_grouped_bwd)


def _shift_lines(x, k, frac, out_len, slope_bound):
    if STAGE2_IMPL == "grouped":
        return _shift_lines_grouped(x, k, frac, out_len, slope_bound)
    if STAGE2_IMPL == "grouped_ad":     # autodiff backward, for benchmarking
        return _shift_lines_grouped_impl(x, k, frac, out_len, slope_bound)
    return _integer_shift_lines(x, k, frac, out_len)


# --------------- lane-dense per-line shift (round-5 executor) ---------------

def _shift_lines_dense_impl(x: jax.Array, k: jax.Array, frac: jax.Array,
                            out_len: int) -> jax.Array:
    """EXACT per-line fractional shift in the LANE-DENSE layout.

    x [B, L, N, C] — shift runs along axis 1 (L); each line n has its own
    integer start k [B, N] and fractional tap frac [B, N]. Semantics match
    `_integer_shift_lines` on the transposed tensor:
        out[b, i, n, :] = lerp(x[b, kc+i, n, :], x[b, kc+i+1, n, :], frac),
        kc = clip(k, 0, L - out_len - 1).

    Why this layout: TPU vector tiles are (sublane=8, lane=128) over the two
    minor axes. The grouped executor's tensors end in C (= 3..9 folded RGB
    channels), so every select/lerp moves 119/128 dead lanes; here the two
    minor axes are (N, C) packed to N*C (thousands of full lanes) and the
    shift axis L sits on sublanes. The whole integer shift resolves as a
    barrel shifter over L — ceil(log2(kmax+1)) two-way selects between two
    STATIC slices of the same tensor, with the per-line predicate broadcast
    along lanes — so there are no gathers, no per-line dynamic slices, and
    no slope-bound/grouping assumptions at all (any k in range is exact).
    """
    B, L, N, C = x.shape
    kmax = max(L - out_len - 1, 0)
    k = jnp.clip(k, 0, kmax)
    nbits = max(kmax.bit_length(), 1) if kmax > 0 else 0
    xf = x.reshape(B, L, N * C)
    # lane vectors: repeat per-line scalars across the C channels
    k_l = jnp.repeat(k, C, axis=1)[:, None, :]                   # [B, 1, N*C]
    f_l = jnp.repeat(frac, C, axis=1)[:, None, :].astype(x.dtype)
    # pad L so every barrel slice is statically in-bounds: the window before
    # resolving bit j is out_len + 1 + (2^(j+1) - 1)
    Lpad = out_len + 1 + ((1 << nbits) - 1)
    if Lpad > L:
        xf = jnp.pad(xf, ((0, 0), (0, Lpad - L), (0, 0)))
    cur = xf
    for j in reversed(range(nbits)):
        step = 1 << j
        newlen = out_len + 1 + (step - 1)
        bit = (k_l & step) != 0
        hi = jax.lax.slice_in_dim(cur, step, step + newlen, axis=1)
        lo = jax.lax.slice_in_dim(cur, 0, newlen, axis=1)
        cur = jnp.where(bit, hi, lo)
    out = cur[:, :out_len] * (1 - f_l) + cur[:, 1:out_len + 1] * f_l
    return out.reshape(B, out_len, N, C)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def shift_lines_dense(x, k, frac, out_len):
    """Lane-dense shift with the transposed-shift custom VJP (same linear-
    operator argument as `_shift_lines_grouped`: out = A_{k,f} x with A a
    per-line 2-tap band, so dx = A^T g — one more dense shift of the
    zero-padded cotangent with start (pad-1) - k and swapped taps; dfrac is
    the first-difference window contracted against g)."""
    return _shift_lines_dense_impl(x, k, frac, out_len)


def _shift_lines_dense_fwd(x, k, frac, out_len):
    return _shift_lines_dense_impl(x, k, frac, out_len), (x, k, frac)


def _shift_lines_dense_bwd(out_len, res, g):
    import numpy as np
    x, k, frac = res
    L = x.shape[1]
    pad = L - out_len
    kc = jnp.clip(k, 0, L - out_len - 1)
    gpad = jnp.pad(g, ((0, 0), (pad, pad), (0, 0), (0, 0)))
    dx = _shift_lines_dense_impl(gpad, (pad - 1) - kc, 1.0 - frac, L)
    dxd = jnp.pad(jnp.diff(x, axis=1), ((0, 0), (0, 1), (0, 0), (0, 0)))
    win = _shift_lines_dense_impl(dxd, kc, jnp.zeros_like(frac), out_len)
    dfrac = jnp.sum((g * win).astype(jnp.float32), axis=(1, 3)).astype(
        frac.dtype)
    dk = np.zeros(k.shape, jax.dtypes.float0)
    return dx, dk, dfrac


shift_lines_dense.defvjp(_shift_lines_dense_fwd, _shift_lines_dense_bwd)


def shear_affine_grid_sample(images: jax.Array, G_inv: jax.Array,
                             out_h: int, out_w: int) -> jax.Array:
    """Drop-in for ops.grid_sample.affine_grid_sample(mode='reflect') built
    from two shear/scale passes. images [B, H, W, C]; G_inv [B, 3, 3] in the
    normalized align_corners=False convention."""
    B, H, W, C = images.shape
    assert G_inv.shape == (B, 3, 3)
    dtype = images.dtype
    G = G_inv.astype(jnp.float32)

    # normalized -> pixel-space affine: p_in = M @ p_out + t
    def pix_row(g0, g1, g2, in_size):
        # coeffs for: p = A*j + B*i + T  (j = x_out, i = y_out)
        A = g0 * (in_size / out_w)
        Bc = g1 * (in_size / out_h)
        T = (in_size / 2.0) * (g0 * (1.0 / out_w - 1.0)
                               + g1 * (1.0 / out_h - 1.0) + g2) \
            + (in_size - 1.0) / 2.0
        return A, Bc, T

    a, b, tx = pix_row(G[:, 0, 0], G[:, 0, 1], G[:, 0, 2], W)
    c, d, ty = pix_row(G[:, 1, 0], G[:, 1, 1], G[:, 1, 2], H)

    # ---- conditioning: pre-rot90 samples where |a| < |c| ------------------
    # rot[y_r, x_r] = img[x_r, W-1-y_r] (swap + flip on the row axis), i.e.
    # sampling rot at (x_r, y_r) samples img at (x_img, y_img) with
    #   y_r = (W-1) - x_img,  x_r = y_img.
    # Substituting x_img = a j + b i + tx, y_img = c j + d i + ty gives the
    # re-derived coefficients below; the new |a| equals the old |c|, making
    # the H_x o V_y factorization well-conditioned for every sample.
    assert H == W, "shear warp expects a square canvas (ADA always is)"
    use_rot = jnp.abs(a) < jnp.abs(c)                       # [B]
    rot = jnp.flip(jnp.swapaxes(images, 1, 2), axis=1)      # [B, W, H, C]
    src = jnp.where(use_rot[:, None, None, None], rot, images)
    a2 = jnp.where(use_rot, c, a)
    b2 = jnp.where(use_rot, d, b)
    t2 = jnp.where(use_rot, ty, tx)
    c2 = jnp.where(use_rot, -a, c)
    d2 = jnp.where(use_rot, -b, d)
    u2 = jnp.where(use_rot, (W - 1.0) - tx, ty)
    a, b, tx, c, d, ty = a2, b2, t2, c2, d2, u2

    # ---- factor M = H_x o V_y --------------------------------------------
    sgn_a = jnp.where(a < 0, -1.0, 1.0)
    a_safe = sgn_a * jnp.maximum(jnp.abs(a), 1e-3)
    c1 = jnp.clip(c / a_safe, -SHEAR_MAX, SHEAR_MAX)        # vertical shear
    d1 = jnp.clip(d - c1 * b, -SCALE_MAX, SCALE_MAX)        # vertical scale
    e = ty - c1 * tx
    a_h = jnp.clip(a, -SCALE_MAX, SCALE_MAX)                # horizontal scale
    b_h = jnp.clip(b, -SHEAR_MAX, SHEAR_MAX)                # horizontal shear

    x = src                    # payload stays in the input dtype (bf16-safe);
    #                            all index/coefficient math above is fp32

    # Stage order inside each pass: the SHARED-SCALE resample runs FIRST
    # against the full reflect-padded source (so out-of-range positions
    # mirror at the true padded edges), then the bounded per-line shear
    # shift realigns lines. Residual per-line shifts q are expressed in the
    # post-scale grid: |q| <= |shear| * L / (2 |scale|), clamped to J0.
    d1 = jnp.where(jnp.abs(d1) < 1.0 / SCALE_MAX,
                   jnp.where(d1 < 0, -1.0 / SCALE_MAX, 1.0 / SCALE_MAX), d1)
    a_h = jnp.where(jnp.abs(a_h) < 1.0 / SCALE_MAX,
                    jnp.where(a_h < 0, -1.0 / SCALE_MAX, 1.0 / SCALE_MAX), a_h)

    # ======================= PASS V (vertical) ============================
    # p(x, y) = d1*y + s_x,  s_x = c1*x + e (+pad);  s_mid = per-sample mean
    Mv = _reflect_pad_len(H)
    xp = jnp.pad(x, ((0, 0), (Mv, Mv), (0, 0), (0, 0)), mode="reflect")
    Hp = H + 2 * Mv
    J0 = H // 2
    Lz = out_h + 2 * J0

    s_mid = e + Mv + c1 * (W - 1.0) / 2.0                       # [B]
    # stage 1: z[j] = src[d1*(j - J0) + s_mid]   (shared indices, mirrored)
    zf = _resample_lines(xp.reshape(B, Hp, W * C),
                         shift=s_mid - d1 * J0, scale=d1, out_len=Lz)
    z = zf.reshape(B, Lz, W, C)

    # stage 2: mid[y, x] = z[y + J0 + q_x, x],  q_x = c1*(x - (W-1)/2)/d1
    cols = jnp.arange(W, dtype=jnp.float32)[None, :]            # [1, W]
    q = (c1 / d1)[:, None] * (cols - (W - 1.0) / 2.0)           # [B, W]
    q = jnp.clip(q, -float(J0), float(J0))
    pos = q + J0
    k = jnp.floor(pos).astype(jnp.int32)
    frac = pos - jnp.floor(pos)
    if STAGE2_IMPL == "dense":
        # lane-dense: shift along axis 1 of z directly — no transposes
        mid = shift_lines_dense(z, k, frac, out_h)              # [B, out_h, W, C]
    else:
        zt = jnp.swapaxes(z, 1, 2)                              # [B, W, Lz, C]
        # pass-V shift slope |dq/dx| = |c1/d1| <= 1 * SCALE_MAX (conditioning
        # guarantees |c1| <= 1; 1/|d1| floored at 1/SCALE_MAX)
        mid = _shift_lines(zt, k, frac, out_h, slope_bound=SCALE_MAX)
        mid = jnp.swapaxes(mid, 1, 2)                           # [B, out_h, W, C]

    # ======================= PASS H (horizontal) ==========================
    # p(x_out, y) = a_h*x_out + r_y,  r_y = b_h*y + tx (+pad)
    Mh = _reflect_pad_len(W)
    mp = jnp.pad(mid, ((0, 0), (0, 0), (Mh, Mh), (0, 0)), mode="reflect")
    Wp = W + 2 * Mh
    J0h = W // 2
    Lz2 = out_w + 2 * J0h

    r_mid = tx + Mh + b_h * (out_h - 1.0) / 2.0                 # [B]
    # stage 1 needs x as the indexed axis with shared idx: [B, Wp, out_h*C]
    mt = jnp.swapaxes(mp, 1, 2).reshape(B, Wp, out_h * C)
    z2 = _resample_lines(mt, shift=r_mid - a_h * J0h, scale=a_h, out_len=Lz2)

    rows = jnp.arange(out_h, dtype=jnp.float32)[None, :]        # [1, out_h]
    q2 = (b_h / a_h)[:, None] * (rows - (out_h - 1.0) / 2.0)    # [B, out_h]
    q2 = jnp.clip(q2, -float(J0h), float(J0h))
    pos2 = q2 + J0h
    k2 = jnp.floor(pos2).astype(jnp.int32)
    frac2 = pos2 - jnp.floor(pos2)
    if STAGE2_IMPL == "dense":
        # shift along the x axis (axis 1) of the untransposed resample
        # output; the single remaining transpose runs on the final out-size
        # tensor
        z2d = z2.reshape(B, Lz2, out_h, C)
        out = shift_lines_dense(z2d, k2, frac2, out_w)          # [B, out_w, out_h, C]
        out = jnp.swapaxes(out, 1, 2)                           # [B, out_h, out_w, C]
    else:
        z2t = jnp.swapaxes(z2.reshape(B, Lz2, out_h, C), 1, 2)  # [B, out_h, Lz2, C]
        # pass-H shift slope |dq2/dy| = |b_h/a_h| <= SHEAR_MAX * SCALE_MAX
        out = _shift_lines(z2t, k2, frac2, out_w,
                           slope_bound=SHEAR_MAX * SCALE_MAX)
    return out.astype(dtype)
