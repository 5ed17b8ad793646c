"""Adaptive discriminator augmentation (ADA) pipeline.

Behavioral parity with reference src/training/augment.py (the 18-transform
differentiable pipeline from "Training GANs with Limited Data"), re-designed
for static-shape XLA execution:

  * Pixel blitting + geometric transforms accumulate ONE inverse homography
    per sample and execute as a single pad -> 2x upsample -> bilinear warp ->
    2x downsample pass (reference augment.py:188-300).
  * STATIC-SHAPE DIVERGENCE: the reference pads by a data-dependent margin
    computed from the transformed corners, clamped to the image size, and
    zero-fills beyond (augment.py:271-285). Dynamic shapes are impossible
    under jit, so we reflect-pad by the fixed filter support (Hz_pad*2) and
    use mirrored-coordinate sampling in the warp — identical in the interior,
    artifact-free (instead of zero-bleed) for extreme transforms, and ~10x
    cheaper at 256^2 than the reference's worst-case margins.
  * Color transforms are a per-sample homogeneous 4x4 matrix applied to RGB
    (with the frame-folded F*3-channel layout of video-consistent
    augmentation handled exactly as the reference, augment.py:359-362).
  * Image-space filtering amplifies 4 wavelet frequency bands with a
    per-sample separable filter (augment.py:373-405).
  * noise/cutout corruptions (augment.py:407-432).

All randomness comes from an explicit jax PRNG key; `p` is a traced scalar so
the ADA feedback loop never triggers recompilation. `debug_percentile`
reproduces the reference's deterministic debug mode (erfinv-based) for tests.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple
import os

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal

from ..ops import downsample2d, setup_filter, upsample2d
from ..ops.grid_sample import affine_grid_sample

# Wavelet low-pass decomposition coefficients (public constants;
# reference augment.py:21-38 uses the same standard tables).
try:
    import pywt  # not in the image; fall back to the standard constants
    _SYM6 = pywt.Wavelet("sym6").dec_lo
except Exception:
    _SYM6 = [0.015404109327027373, 0.0034907120842174702, -0.11799011114819057,
             -0.048311742585633, 0.4910559419267466, 0.787641141030194,
             0.3379294217276218, -0.07263752278646252, -0.021060292512300564,
             0.04472490177066578, 0.0017677118642428036, -0.007800708325034148]
_SYM2 = [-0.12940952255092145, 0.22414386804185735, 0.836516303737469,
         0.48296291314469025]


@dataclass(frozen=True)
class AugmentConfig:
    """Probability multipliers + shape parameters (reference augment.py:118-164).
    All zero by default; augpipe presets in utils/config resolve 'bgc' etc."""
    # pixel blitting
    xflip: float = 0.0
    rotate90: float = 0.0
    xint: float = 0.0
    xint_max: float = 0.125
    # geometric
    scale: float = 0.0
    rotate: float = 0.0
    aniso: float = 0.0
    xfrac: float = 0.0
    scale_std: float = 0.2
    rotate_max: float = 1.0
    aniso_std: float = 0.2
    xfrac_std: float = 0.125
    # color
    brightness: float = 0.0
    contrast: float = 0.0
    lumaflip: float = 0.0
    hue: float = 0.0
    saturation: float = 0.0
    brightness_std: float = 0.2
    contrast_std: float = 0.5
    hue_max: float = 1.0
    saturation_std: float = 1.0
    # image-space filtering
    imgfilter: float = 0.0
    imgfilter_bands: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    imgfilter_std: float = 1.0
    # corruptions
    noise: float = 0.0
    cutout: float = 0.0
    noise_std: float = 0.1
    cutout_size: float = 0.5
    # geometric execution: 2 = the reference's anti-aliased pad -> 2x
    # upsample -> warp -> 2x downsample pipeline; 1 = direct warp with
    # mirrored sampling (4x fewer TPU gather indices; slight aliasing under
    # rotation). Throughput-critical training runs may prefer 1.
    warp_upsample: int = 2
    # warp executor for the AA pipeline:
    #   "auto"   (default) — shear where validated on the TPU backend
    #            (SHEAR_TPU_VALIDATED_RES allowlist, incl. 64 since the
    #            round-3 executors; always shear on CPU), gather elsewhere.
    #   "shear"  — force the two-pass shear/scale decomposition. Round 3
    #            executes each pass as a one-hot-matmul resample (MXU) +
    #            grouped per-line shift with a transposed-shift custom VJP:
    #            43 ms fwd / 107 ms fwd+bwd at B=16 C=9 256^2 on v5e vs
    #            239/1014 ms for the per-pixel gather (docs/PERF.md).
    #   "gather" — force the single bilinear gather (geometry reference).
    warp_mode: str = "auto"
    # geometric-stage payload dtype: "auto" = bfloat16 on TPU (the resample
    # chain is bandwidth/gather bound and ~halves in bf16; the reference
    # runs its whole D tower in fp16 at these resolutions so half-precision
    # augmented inputs are within its numeric envelope), float32 on CPU
    # (keeps the torch-oracle parity tests exact). Explicit "float32" /
    # "bfloat16" forces it.
    geom_dtype: str = "auto"
    # data-parallel shard count of the batch axis (the training loop sets
    # this to the mesh's 'data' size). Warp chunking is derived from the
    # PER-SHARD batch so every scan iteration keeps all devices busy: with
    # the default 1, a global batch of 16 runs as 4 chunks of 4; on an
    # 8-way mesh a global batch of 64 runs as 2 chunks of 32 (4 per chip)
    # instead of 16 device-serializing chunks of 4.
    data_shards: int = 1


# Augpipe presets (reference train.py:36-50 augpipe_specs).
AUGPIPE_SPECS = {
    "blit":   dict(xflip=1, rotate90=1, xint=1),
    "geom":   dict(scale=1, rotate=1, aniso=1, xfrac=1),
    "color":  dict(brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1),
    "filter": dict(imgfilter=1),
    "noise":  dict(noise=1),
    "cutout": dict(cutout=1),
    "bg":     dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1, xfrac=1),
    "bgc":    dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1, xfrac=1,
                   brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1),
    "bgcf":   dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1, xfrac=1,
                   brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1,
                   imgfilter=1),
    "bgcfn":  dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1, xfrac=1,
                   brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1,
                   imgfilter=1, noise=1),
    "bgcfnc": dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1, xfrac=1,
                   brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1,
                   imgfilter=1, noise=1, cutout=1),
}


# ---------------- batched matrix helpers (reference augment.py:43-107) --------

def _eye3(B):
    return jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3))


def _eye4(B):
    return jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))


def translate2d(tx, ty):
    B = tx.shape[0]
    m = _eye3(B)
    return m.at[:, 0, 2].set(tx).at[:, 1, 2].set(ty)


def scale2d(sx, sy):
    B = sx.shape[0]
    m = _eye3(B)
    return m.at[:, 0, 0].set(sx).at[:, 1, 1].set(sy)


def rotate2d(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    B = theta.shape[0]
    m = _eye3(B)
    return (m.at[:, 0, 0].set(c).at[:, 0, 1].set(-s)
             .at[:, 1, 0].set(s).at[:, 1, 1].set(c))


def translate3d(tx, ty, tz):
    B = tx.shape[0]
    m = _eye4(B)
    return m.at[:, 0, 3].set(tx).at[:, 1, 3].set(ty).at[:, 2, 3].set(tz)


def scale3d(sx, sy, sz):
    B = sx.shape[0]
    m = _eye4(B)
    return m.at[:, 0, 0].set(sx).at[:, 1, 1].set(sy).at[:, 2, 2].set(sz)


def rotate3d(v, theta):
    """Rotation of homogeneous color space around axis v (reference augment.py:90-98)."""
    vx, vy, vz = v[0], v[1], v[2]
    s, c = jnp.sin(theta), jnp.cos(theta)
    cc = 1 - c
    B = theta.shape[0]
    m = _eye4(B)
    m = (m.at[:, 0, 0].set(vx * vx * cc + c)
          .at[:, 0, 1].set(vx * vy * cc - vz * s)
          .at[:, 0, 2].set(vx * vz * cc + vy * s)
          .at[:, 1, 0].set(vy * vx * cc + vz * s)
          .at[:, 1, 1].set(vy * vy * cc + c)
          .at[:, 1, 2].set(vy * vz * cc - vx * s)
          .at[:, 2, 0].set(vz * vx * cc - vy * s)
          .at[:, 2, 1].set(vz * vy * cc + vx * s)
          .at[:, 2, 2].set(vz * vz * cc + c))
    return m


def _build_fbank() -> np.ndarray:
    """4-band wavelet filter bank (reference augment.py:169-179)."""
    Hz_lo = np.asarray(_SYM2)
    Hz_hi = Hz_lo * ((-1) ** np.arange(Hz_lo.size))
    Hz_lo2 = np.convolve(Hz_lo, Hz_lo[::-1]) / 2
    Hz_hi2 = np.convolve(Hz_hi, Hz_hi[::-1]) / 2
    fbank = np.eye(4, 1)
    for i in range(1, fbank.shape[0]):
        fbank = np.dstack([fbank, np.zeros_like(fbank)]).reshape(fbank.shape[0], -1)[:, :-1]
        fbank = scipy.signal.convolve(fbank, [Hz_lo2])
        fbank[i, (fbank.shape[1] - Hz_hi2.size) // 2:
                 (fbank.shape[1] + Hz_hi2.size) // 2] += Hz_hi2
    return fbank.astype(np.float32)


# Image resolutions whose AA-warp canvases are validated fault-free for the
# shear executor on the v5e TPU backend (scripts/validate_shear_onchip.py:
# fwd + grad finite, >28 dB PSNR vs the fp32 gather executor). Round 2's
# per-line dynamic-slice executor hit a canvas-size-specific Mosaic
# miscompile at 64^2; the round-3 stage executors (one-hot-matmul resample +
# grouped shift with transposed-shift VJP) no longer emit that lowering and
# 32/64/128/256/512/1024 ALL pass on-chip (barrel select, fwd + grad, v5e)
# — 64 is back on the allowlist and 1024 is validated, not assumed. Extend
# only with on-chip evidence; "auto" falls back to gather elsewhere.
SHEAR_TPU_VALIDATED_RES = frozenset({32, 64, 128, 256, 512, 1024})


def _resolve_geom_dtype(geom_dtype: str):
    """One place for the payload-dtype policy: bf16 on accelerator backends
    (bandwidth/gather bound resample chain), fp32 on CPU (oracle-exact)."""
    if geom_dtype == "auto":
        geom_dtype = ("bfloat16" if jax.default_backend() != "cpu"
                      else "float32")
    return jnp.dtype(geom_dtype)


def _warp_antialiased(images, G_inv, Hz_geom, Hz_pad, warp_mode="auto",
                      data_shards=1, geom_dtype="auto"):
    """The reference's anti-aliased geometric execution: symmetric static pad
    (no origin shift since mx0==mx1, reference augment.py:286), 2x upsample,
    bilinear warp on the (H + Hz_pad*2)*2 canvas (augment.py:294), then
    downsample + crop (augment.py:300). Chunked over batch with per-chunk
    rematerialization: the upsampled lane-padded intermediates are ~100x the
    image size at C=3..9, so bounding the chunk keeps peak HBM sane at
    256^2+ training shapes."""
    B, H, W, C = images.shape
    if warp_mode == "auto":
        warp_mode = ("shear" if (jax.default_backend() == "cpu"
                                 or H in SHEAR_TPU_VALIDATED_RES)
                     else "gather")
    dt = _resolve_geom_dtype(geom_dtype)
    m = Hz_pad * 2
    ones = jnp.ones((B,))
    # account for 2x upsample + half-pixel origin (augment.py:290-291)
    G_inv = scale2d(2 * ones, 2 * ones) @ G_inv @ scale2d(ones / 2, ones / 2)
    G_inv = (translate2d(-0.5 * ones, -0.5 * ones) @ G_inv
             @ translate2d(0.5 * ones, 0.5 * ones))
    out_h, out_w = (H + Hz_pad * 2) * 2, (W + Hz_pad * 2) * 2
    in_h, in_w = (H + 2 * m) * 2, (W + 2 * m) * 2
    G_inv = (scale2d(2 / in_w * ones, 2 / in_h * ones) @ G_inv
             @ scale2d(out_w / 2 * ones, out_h / 2 * ones))

    def warp_chunk(args):
        x_c, g_c = args
        in_dtype = x_c.dtype
        x_c = jnp.pad(x_c.astype(dt), ((0, 0), (m, m), (m, m), (0, 0)),
                      mode="reflect")
        x_c = upsample2d(x_c, Hz_geom.astype(dt), up=2)
        if warp_mode == "shear":
            from ..ops.shear_warp import shear_affine_grid_sample
            x_c = shear_affine_grid_sample(x_c, g_c, out_h, out_w)
        else:
            x_c = affine_grid_sample(x_c, g_c, out_h, out_w, mode="reflect")
        x_c = downsample2d(x_c, Hz_geom.astype(dt), down=2,
                           padding=-Hz_pad * 2, flip_filter=True)
        return x_c.astype(in_dtype)

    if warp_mode == "gather" or os.environ.get("SGV_SHEAR_REMAT",
                                               "") not in ("", "0"):
        # remat: the gather path's saved residuals (per-pixel 4C-packed
        # neighborhoods + 4.4M scatter indices on the 2x canvas) are ~100x
        # the image; recompute them in the backward. The shear path's
        # per-line residuals are small, so it skips remat (measured
        # speed-neutral at the production shape, but keeps peak HBM bounded
        # by residency rather than recompute policy); SGV_SHEAR_REMAT=1
        # forces it for A/B benchmarking.
        warp_chunk = jax.checkpoint(warp_chunk)

    # Small PER-SHARD chunks keep the shear path fast (76-85 ms at chunk 1-4
    # vs 1453 ms unchunked at B=16 C=9 256^2 on v5e — large per-device
    # batches trip a pathological gather/transpose lowering) and bound peak
    # HBM; chunk=4 compiles much faster than chunk=1 inside the full
    # train-step graph for ~12% runtime cost. The chunk COUNT is derived
    # from the per-shard batch so each lax.map iteration spans all data
    # shards (no device serialization under a mesh).
    per_shard = max(1, B // max(1, data_shards))
    target = max(1, min(B, (per_shard + 3) // 4))
    # smallest chunk count >= target that divides B — more, smaller chunks
    # keep peak HBM bounded; searching downward could land on n_chunks=1
    # (the measured ~1453 ms unchunked call with unbounded peak HBM at
    # production shapes) whenever B is prime or has no divisor near target
    n_chunks = next(n for n in range(target, B + 1) if B % n == 0)
    if n_chunks > 1:
        chunk = B // n_chunks
        xs = images.reshape(n_chunks, chunk, H, W, C)
        gs = G_inv.reshape(n_chunks, chunk, 3, 3)
        return jax.lax.map(warp_chunk, (xs, gs)).reshape(B, H, W, C)
    return warp_chunk((images, G_inv))


def make_augment_pipe(cfg: AugmentConfig):
    """Returns augment(rng, images [B,H,W,C], p, debug_percentile=None) -> images.

    C may be 3, 1, or F*3 (video-consistent frame-folded layout)."""
    Hz_geom = setup_filter(_SYM6)                     # orthogonal lowpass, 12 taps
    Hz_pad = (len(_SYM6) if Hz_geom.ndim == 1 else Hz_geom.shape[0]) // 4
    Hz_fbank = _build_fbank()
    geom_enabled = any(getattr(cfg, k) > 0 for k in
                       ("xflip", "rotate90", "xint", "scale", "rotate", "aniso", "xfrac"))
    color_enabled = any(getattr(cfg, k) > 0 for k in
                        ("brightness", "contrast", "lumaflip", "hue", "saturation"))
    v_luma = np.asarray([1, 1, 1, 0]) / np.sqrt(3)

    def erfinv(x):
        return jax.scipy.special.erfinv(x)

    def augment(rng, images: jax.Array, p, debug_percentile=None) -> jax.Array:
        assert images.ndim == 4, f"expected NHWC, got {images.shape}"
        B, H, W, C = images.shape
        p = jnp.asarray(p, jnp.float32)
        dp = (None if debug_percentile is None
              else jnp.asarray(debug_percentile, jnp.float32))
        keys = iter(jax.random.split(rng, 64))

        def rand(shape):
            return jax.random.uniform(next(keys), shape)

        def randn(shape):
            return jax.random.normal(next(keys), shape)

        # ---- pixel blitting + geometric: accumulate G_inv ----------------
        if geom_enabled:
            G_inv = _eye3(B)
            if cfg.xflip > 0:
                i = jnp.floor(rand((B,)) * 2)
                i = jnp.where(rand((B,)) < cfg.xflip * p, i, 0.0)
                if dp is not None:
                    i = jnp.full((B,), jnp.floor(dp * 2))
                G_inv = G_inv @ scale2d(1.0 / (1 - 2 * i), jnp.ones((B,)))
            if cfg.rotate90 > 0:
                i = jnp.floor(rand((B,)) * 4)
                i = jnp.where(rand((B,)) < cfg.rotate90 * p, i, 0.0)
                if dp is not None:
                    i = jnp.full((B,), jnp.floor(dp * 4))
                G_inv = G_inv @ rotate2d(-(-np.pi / 2) * i)      # rotate2d_inv
            if cfg.xint > 0:
                t = (rand((B, 2)) * 2 - 1) * cfg.xint_max
                t = jnp.where(rand((B, 1)) < cfg.xint * p, t, 0.0)
                if dp is not None:
                    t = jnp.full((B, 2), (dp * 2 - 1) * cfg.xint_max)
                G_inv = G_inv @ translate2d(-jnp.round(t[:, 0] * W),
                                            -jnp.round(t[:, 1] * H))
            if cfg.scale > 0:
                s = jnp.exp2(randn((B,)) * cfg.scale_std)
                s = jnp.where(rand((B,)) < cfg.scale * p, s, 1.0)
                if dp is not None:
                    s = jnp.full((B,), jnp.exp2(erfinv(dp * 2 - 1) * cfg.scale_std))
                G_inv = G_inv @ scale2d(1 / s, 1 / s)
            p_rot = 1 - jnp.sqrt(jnp.clip(1 - cfg.rotate * p, 0, 1))
            if cfg.rotate > 0:
                theta = (rand((B,)) * 2 - 1) * np.pi * cfg.rotate_max
                theta = jnp.where(rand((B,)) < p_rot, theta, 0.0)
                if dp is not None:
                    theta = jnp.full((B,), (dp * 2 - 1) * np.pi * cfg.rotate_max)
                G_inv = G_inv @ rotate2d(theta)                  # rotate2d_inv(-theta)
            if cfg.aniso > 0:
                s = jnp.exp2(randn((B,)) * cfg.aniso_std)
                s = jnp.where(rand((B,)) < cfg.aniso * p, s, 1.0)
                if dp is not None:
                    s = jnp.full((B,), jnp.exp2(erfinv(dp * 2 - 1) * cfg.aniso_std))
                G_inv = G_inv @ scale2d(1 / s, s)
            if cfg.rotate > 0:
                theta = (rand((B,)) * 2 - 1) * np.pi * cfg.rotate_max
                theta = jnp.where(rand((B,)) < p_rot, theta, 0.0)
                if dp is not None:
                    theta = jnp.zeros((B,))
                G_inv = G_inv @ rotate2d(theta)
            if cfg.xfrac > 0:
                t = randn((B, 2)) * cfg.xfrac_std
                t = jnp.where(rand((B, 1)) < cfg.xfrac * p, t, 0.0)
                if dp is not None:
                    t = jnp.full((B, 2), erfinv(dp * 2 - 1) * cfg.xfrac_std)
                G_inv = G_inv @ translate2d(-t[:, 0] * W, -t[:, 1] * H)

            # ---- execute geometry (static shapes; see module docstring) --
            if cfg.warp_upsample == 1:
                # fast path: direct warp with mirrored sampling, no AA
                # pipeline — 4x fewer gather indices (TPU gathers are
                # index-count bound); slight aliasing under rotation.
                ones = jnp.ones((B,))
                Gn = (scale2d(2 / W * ones, 2 / H * ones) @ G_inv
                      @ scale2d(W / 2 * ones, H / 2 * ones))
                gdt = _resolve_geom_dtype(cfg.geom_dtype)
                images = affine_grid_sample(
                    images.astype(gdt), Gn, H, W,
                    mode="reflect").astype(images.dtype)
            else:
                images = _warp_antialiased(images, G_inv, Hz_geom, Hz_pad,
                                           warp_mode=cfg.warp_mode,
                                           data_shards=cfg.data_shards,
                                           geom_dtype=cfg.geom_dtype)

        # ---- color transforms --------------------------------------------
        if color_enabled:
            Cm = _eye4(B)
            if cfg.brightness > 0:
                b = randn((B,)) * cfg.brightness_std
                b = jnp.where(rand((B,)) < cfg.brightness * p, b, 0.0)
                if dp is not None:
                    b = jnp.full((B,), erfinv(dp * 2 - 1) * cfg.brightness_std)
                Cm = translate3d(b, b, b) @ Cm
            if cfg.contrast > 0:
                c = jnp.exp2(randn((B,)) * cfg.contrast_std)
                c = jnp.where(rand((B,)) < cfg.contrast * p, c, 1.0)
                if dp is not None:
                    c = jnp.full((B,), jnp.exp2(erfinv(dp * 2 - 1) * cfg.contrast_std))
                Cm = scale3d(c, c, c) @ Cm
            v = jnp.asarray(v_luma, jnp.float32)
            vv = jnp.outer(v, v)
            if cfg.lumaflip > 0:
                i = jnp.floor(rand((B, 1, 1)) * 2)
                i = jnp.where(rand((B, 1, 1)) < cfg.lumaflip * p, i, 0.0)
                if dp is not None:
                    i = jnp.full((B, 1, 1), jnp.floor(dp * 2))
                Cm = (jnp.eye(4) - 2 * vv * i) @ Cm            # Householder
            if cfg.hue > 0 and C > 1:
                theta = (rand((B,)) * 2 - 1) * np.pi * cfg.hue_max
                theta = jnp.where(rand((B,)) < cfg.hue * p, theta, 0.0)
                if dp is not None:
                    theta = jnp.full((B,), (dp * 2 - 1) * np.pi * cfg.hue_max)
                Cm = rotate3d(v, theta) @ Cm
            if cfg.saturation > 0 and C > 1:
                s = jnp.exp2(randn((B, 1, 1)) * cfg.saturation_std)
                s = jnp.where(rand((B, 1, 1)) < cfg.saturation * p, s, 1.0)
                if dp is not None:
                    s = jnp.full((B, 1, 1),
                                 jnp.exp2(erfinv(dp * 2 - 1) * cfg.saturation_std))
                Cm = (vv + (jnp.eye(4) - vv) * s) @ Cm

            # execute: [B,H,W,C]; C = F*3 folds frames (augment.py:357-371)
            if C % 3 == 0:
                F = C // 3
                x = images.reshape(B, H * W, F, 3)
                x = (jnp.einsum("bnfc,bxc->bnfx", x, Cm[:, :3, :3])
                     + Cm[:, :3, 3].reshape(B, 1, 1, 3))
                images = x.reshape(B, H, W, C)
            elif C == 1:
                Cl = jnp.mean(Cm[:, :3, :], axis=1, keepdims=True)   # [B,1,4]
                images = (images * jnp.sum(Cl[:, :, :3], axis=2)[:, None, None]
                          + Cl[:, 0, 3][:, None, None, None])
            else:
                raise ValueError("Image must have 1, 3, or F*3 channels")

        # ---- image-space filtering ---------------------------------------
        if cfg.imgfilter > 0:
            num_bands = Hz_fbank.shape[0]
            expected_power = jnp.asarray(np.array([10, 1, 1, 1]) / 13, jnp.float32)
            g = jnp.ones((B, num_bands))
            for i, band_strength in enumerate(cfg.imgfilter_bands):
                t_i = jnp.exp2(randn((B,)) * cfg.imgfilter_std)
                t_i = jnp.where(rand((B,)) < cfg.imgfilter * p * band_strength, t_i, 1.0)
                if dp is not None:
                    t_i = (jnp.full((B,), jnp.exp2(erfinv(dp * 2 - 1) * cfg.imgfilter_std))
                           if band_strength > 0 else jnp.ones((B,)))
                t = jnp.ones((B, num_bands)).at[:, i].set(t_i)
                t = t / jnp.sqrt(jnp.sum(expected_power * jnp.square(t), axis=-1,
                                         keepdims=True))
                g = g * t
            Hz_prime = g @ jnp.asarray(Hz_fbank)               # [B, taps]
            taps = Hz_fbank.shape[1]
            pd = taps // 2
            # depthwise per-sample separable filter: fold batch into channels
            x = images.transpose(1, 2, 0, 3).reshape(1, H, W, B * C)
            x = jnp.pad(x, ((0, 0), (pd, pd), (pd, pd), (0, 0)), mode="reflect")
            k = jnp.repeat(Hz_prime, C, axis=0).T               # [taps, B*C]
            xk = jax.lax.conv_general_dilated(
                x, k[None, :, None, :], (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=B * C)
            xk = jax.lax.conv_general_dilated(
                xk, k[:, None, None, :], (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=B * C)
            images = xk.reshape(H, W, B, C).transpose(2, 0, 1, 3)

        # ---- corruptions -------------------------------------------------
        if cfg.noise > 0:
            sigma = jnp.abs(randn((B, 1, 1, 1))) * cfg.noise_std
            sigma = jnp.where(rand((B, 1, 1, 1)) < cfg.noise * p, sigma, 0.0)
            if dp is not None:
                sigma = jnp.full((B, 1, 1, 1), erfinv(dp) * cfg.noise_std)
            images = images + randn((B, H, W, C)) * sigma
        if cfg.cutout > 0:
            size = jnp.full((B, 2), cfg.cutout_size)
            size = jnp.where(rand((B, 1)) < cfg.cutout * p, size, 0.0)
            center = rand((B, 2))
            if dp is not None:
                size = jnp.full((B, 2), cfg.cutout_size)
                center = jnp.full((B, 2), dp)
            coord_x = (jnp.arange(W) + 0.5) / W
            coord_y = (jnp.arange(H) + 0.5) / H
            mask_x = (jnp.abs(coord_x[None, None, :] - center[:, 0, None, None])
                      >= size[:, 0, None, None] / 2)
            mask_y = (jnp.abs(coord_y[None, :, None] - center[:, 1, None, None])
                      >= size[:, 1, None, None] / 2)
            mask = jnp.logical_or(mask_x, mask_y).astype(images.dtype)
            images = images * mask[..., None]

        return images

    return augment
