"""Two-pass shear/scale warp (ops/shear_warp.py): geometric exactness on
linear ramps, mirror/identity behavior, quality vs the single-gather
executor at the AA-pipeline level, and differentiability. This is the
TPU fast path for ADA's geometric stage (reference augment.py:188-300);
the gather executor remains the reference-parity mode (warp_mode='gather')."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan_v_tpu.ops import setup_filter
from stylegan_v_tpu.ops.grid_sample import affine_grid_sample
from stylegan_v_tpu.ops.shear_warp import shear_affine_grid_sample
from stylegan_v_tpu.training.augment import (
    _SYM6, _warp_antialiased, rotate2d, scale2d, translate2d)


def ramps(B=1, H=32, W=32):
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    rx = np.broadcast_to(xx[None, :, :, None], (B, H, W, 1)).astype(np.float32)
    ry = np.broadcast_to(yy[None, :, :, None], (B, H, W, 1)).astype(np.float32)
    return jnp.asarray(rx), jnp.asarray(ry)


def interior_err(G, img, H=32, W=32):
    ref = np.asarray(affine_grid_sample(img, G, H, W, mode="reflect"))
    got = np.asarray(shear_affine_grid_sample(img, G, H, W))
    return np.abs(ref[:, 10:-10, 10:-10] - got[:, 10:-10, 10:-10]).max()


@pytest.mark.parametrize("make_G", [
    lambda o: jnp.broadcast_to(jnp.eye(3), (1, 3, 3)),
    lambda o: translate2d(0.3 * o / 16, -0.7 * o / 16),          # fractional
    lambda o: translate2d(4 * 2 / 32 * o, -6 * 2 / 32 * o),      # integer px
    lambda o: rotate2d(0.35 * o),
    lambda o: rotate2d((np.pi / 2 + 0.15) * o),                  # rot90-cond
    lambda o: rotate2d(np.pi * o),                               # 180 deg
    lambda o: scale2d(0.75 * o, 1.3 * o),
    lambda o: rotate2d(0.5 * o) @ scale2d(1.2 * o, 0.8 * o)
    @ translate2d(0.1 * o, -0.2 * o),
], ids=["identity", "frac-trans", "int-trans", "rot", "rot-near90",
        "rot180", "scale", "general"])
def test_geometry_exact_on_ramps(make_G):
    """Linear images are reproduced exactly by bilinear chains: any interior
    mismatch vs the gather executor is a GEOMETRY bug, not interpolation."""
    rx, ry = ramps()
    G = make_G(jnp.ones((1,)))
    assert interior_err(G, rx) < 1e-3
    assert interior_err(G, ry) < 1e-3


def test_pipeline_quality_vs_gather():
    """At the AA-pipeline level (2x supersampled, band-limited) the shear
    executor must track the gather executor closely away from the mirror
    borders."""
    import scipy.ndimage as ndi
    B, H, W, C = 4, 64, 64, 3
    rng = np.random.RandomState(0)
    img = np.stack([ndi.gaussian_filter(rng.randn(H, W, C), 1.0)
                    for _ in range(B)]).astype(np.float32)
    img[:, 20:40, 20:40] += 1.0
    x = jnp.asarray(img)
    Hz = setup_filter(_SYM6)
    th = jnp.asarray([0.3, -0.8, 1.3, 2.4])
    G = (rotate2d(th)
         @ scale2d(jnp.asarray([0.8, 1.3, 1.0, 0.6]),
                   jnp.asarray([1.1, 0.7, 1.4, 1.0]))
         @ translate2d(0.1 * jnp.ones(4), -0.2 * jnp.ones(4)))
    ref = np.asarray(_warp_antialiased(x, G, Hz, 3, warp_mode="gather"))
    got = np.asarray(_warp_antialiased(x, G, Hz, 3, warp_mode="shear"))
    d = (ref - got)[:, 8:-8, 8:-8]
    peak = ref.max() - ref.min()
    psnr = 10 * np.log10(peak ** 2 / np.mean(d ** 2))
    assert psnr > 32.0, f"PSNR {psnr:.1f} dB"
    assert np.abs(d).mean() < 0.03


def test_shear_warp_differentiable():
    """R1 differentiates through the augment pipe w.r.t. images; the warp
    must compose with jax.grad (slice-gathers have scatter-add VJPs)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
    G = rotate2d(jnp.asarray([0.4, -1.9]))

    def loss(x_):
        return jnp.sum(jnp.square(shear_affine_grid_sample(x_, G, 16, 16)))

    g = jax.jit(jax.grad(loss))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_bf16_geom_stage_quality():
    """The TPU fast path runs the geometric stage in bf16 (geom_dtype auto);
    against the fp32 pipeline it must stay visually transparent (>30 dB
    PSNR — interpolation noise well under ADA's own stochasticity)."""
    rng = np.random.RandomState(5)
    B, H, W, C = 4, 64, 64, 3
    import scipy.ndimage as ndi
    img = np.stack([ndi.gaussian_filter(rng.randn(H, W, C), 1.0)
                    for _ in range(B)]).astype(np.float32)
    x = jnp.asarray(img)
    Hz = setup_filter(_SYM6)
    G = (rotate2d(jnp.asarray([0.3, -0.8, 1.3, 2.4]))
         @ scale2d(jnp.asarray([0.8, 1.3, 1.0, 0.6]),
                   jnp.asarray([1.1, 0.7, 1.4, 1.0])))
    ref = np.asarray(_warp_antialiased(x, G, Hz, 3, geom_dtype="float32"))
    got = np.asarray(_warp_antialiased(x, G, Hz, 3, geom_dtype="bfloat16"))
    assert got.dtype == np.float32          # payload dtype restored
    d = ref - got
    peak = ref.max() - ref.min()
    psnr = 10 * np.log10(peak ** 2 / np.mean(d ** 2))
    assert psnr > 30.0, f"PSNR {psnr:.1f} dB"


@pytest.mark.parametrize("B", [8, 7])   # 7: prime batch — the divisor
def test_warp_chunking_invariant(B):    # search must still bound chunks
    """data_shards only changes the lax.map chunking, never the math: the
    warp output must be identical for any shard count (the training loop
    sets data_shards to the mesh 'data' size; single-chip default is 1)."""
    rng = np.random.RandomState(3)
    H, W, C = 32, 32, 3
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    G = rotate2d(jnp.asarray(rng.uniform(-2, 2, B).astype(np.float32)))
    Hz = setup_filter(_SYM6)
    base = np.asarray(_warp_antialiased(x, G, Hz, 3, data_shards=1))
    for shards in (2, 4, 8)[:2 if B == 7 else 3]:
        got = np.asarray(_warp_antialiased(x, G, Hz, 3, data_shards=shards))
        # tolerance: XLA compiles different batch groupings with different
        # fusion/accumulation orders (fp32 conv reductions) — not bit-equal
        np.testing.assert_allclose(got, base, atol=5e-4, rtol=0,
                                   err_msg=f"shards={shards}")


def test_augment_pipe_shear_mode_runs():
    from stylegan_v_tpu.training.augment import (AUGPIPE_SPECS, AugmentConfig,
                                                 make_augment_pipe)
    pipe = make_augment_pipe(AugmentConfig(**AUGPIPE_SPECS["bgc"]))  # default shear
    x = jnp.asarray(np.random.RandomState(2).randn(4, 32, 32, 9).astype(np.float32))
    y = pipe(jax.random.PRNGKey(0), x, 0.7)
    assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()


@pytest.mark.parametrize("select", ["barrel", "loop"])
def test_stage_impl_equivalence(select, monkeypatch):
    """The MXU one-hot resample and the grouped shift must reproduce their
    gather/per-line-slice counterparts (f32: to accumulation-order rounding;
    the grouped shift is EXACT by construction — resid <= rmax), under BOTH
    residual-select executors (log2 barrel shifter and dense masked loop)."""
    import stylegan_v_tpu.ops.shear_warp as sw
    from stylegan_v_tpu.ops.shear_warp import (
        _line_pass, _line_pass_onehot, _integer_shift_lines,
        _shift_lines_grouped)
    monkeypatch.setattr(sw, "STAGE2_SELECT", select)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(3, 57, 40).astype(np.float32))
    shift = jnp.asarray(rng.uniform(-10, 60, 3).astype(np.float32))
    scale = jnp.asarray([0.7, -1.3, 1.0], jnp.float32)
    a = np.asarray(_line_pass(x, shift, scale, 33))
    b = np.asarray(_line_pass_onehot(x, shift, scale, 33))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-5)

    zt = jnp.asarray(rng.randn(2, 23, 61, 3).astype(np.float32))
    # k linear in line index with slope <= 4 (the pass-V contract), plus
    # boundary clipping
    lines = np.arange(23)
    k = np.clip(5 + (3.7 * lines).astype(int), 0, 61 - 30 - 1)
    k = jnp.asarray(np.stack([k, k[::-1]]), jnp.int32)
    frac = jnp.asarray(rng.rand(2, 23).astype(np.float32))
    want = np.asarray(_integer_shift_lines(zt, k, frac, 30))
    got = np.asarray(_shift_lines_grouped(zt, k, frac, 30, slope_bound=4.0))
    np.testing.assert_array_equal(got, want)


def test_grouped_shift_custom_vjp_matches_autodiff():
    """The grouped shift's transposed-shift backward must equal the autodiff
    gradient of the per-line-slice implementation (the op is linear, so the
    cotangent is exact, not approximate), including 2nd order (R1
    differentiates through the augment pipe twice)."""
    from stylegan_v_tpu.ops.shear_warp import (
        _integer_shift_lines, _shift_lines_grouped)
    rng = np.random.RandomState(11)
    B, N, L, C, out = 2, 12, 41, 3, 20
    x = jnp.asarray(rng.randn(B, N, L, C).astype(np.float32))
    lines = np.arange(N)
    k = np.clip(3 + (2.6 * lines).astype(int), 0, L - out - 1)
    k = jnp.asarray(np.stack([k, k[::-1]]), jnp.int32)
    frac = jnp.asarray(rng.rand(B, N).astype(np.float32))
    w = jnp.asarray(rng.randn(B, N, out, C).astype(np.float32))

    def loss_ref(x_):
        return jnp.sum(w * _integer_shift_lines(x_, k, frac, out))

    def loss_new(x_):
        return jnp.sum(w * _shift_lines_grouped(x_, k, frac, out, 4.0))

    np.testing.assert_allclose(float(loss_new(x)), float(loss_ref(x)),
                               rtol=1e-6)
    g_ref = np.asarray(jax.grad(loss_ref)(x))
    g_new = np.asarray(jax.grad(loss_new)(x))
    np.testing.assert_allclose(g_new, g_ref, rtol=1e-5, atol=1e-6)

    # dfrac: the custom VJP's frac cotangent (Δx-window contraction) must
    # match autodiff of the per-line form (STN-style transform gradients)
    gf_ref = np.asarray(jax.grad(
        lambda f: jnp.sum(w * _integer_shift_lines(x, k, f, out)))(frac))
    gf_new = np.asarray(jax.grad(
        lambda f: jnp.sum(w * _shift_lines_grouped(x, k, f, out, 4.0)))(frac))
    np.testing.assert_allclose(gf_new, gf_ref, rtol=1e-5, atol=1e-5)

    # second order: hessian-vector product through the custom bwd
    v = jnp.asarray(rng.randn(*x.shape).astype(np.float32))

    def sq(x_):
        g = jax.grad(lambda y: jnp.sum(
            jnp.square(_shift_lines_grouped(y, k, frac, out, 4.0))))(x_)
        return jnp.sum(g * v)

    def sq_ref(x_):
        g = jax.grad(lambda y: jnp.sum(
            jnp.square(_integer_shift_lines(y, k, frac, out))))(x_)
        return jnp.sum(g * v)

    h_new = np.asarray(jax.grad(sq)(x))
    h_ref = np.asarray(jax.grad(sq_ref)(x))
    np.testing.assert_allclose(h_new, h_ref, rtol=1e-5, atol=1e-6)


def test_dense_shift_matches_per_line_reference():
    """The lane-dense barrel shift (round-5 executor) must reproduce
    `_integer_shift_lines` EXACTLY on its transposed layout — for ARBITRARY
    k (it has no slope-bound/grouping assumptions), including the boundary
    clip."""
    from stylegan_v_tpu.ops.shear_warp import (_integer_shift_lines,
                                               shift_lines_dense)
    rng = np.random.RandomState(3)
    B, N, L, C, out = 2, 13, 47, 3, 21
    xt = jnp.asarray(rng.randn(B, N, L, C).astype(np.float32))  # per-line layout
    x = jnp.swapaxes(xt, 1, 2)                                  # dense layout
    # arbitrary (non-monotone, out-of-range) starts: clip must engage
    k = jnp.asarray(rng.randint(-5, L, size=(B, N)), jnp.int32)
    frac = jnp.asarray(rng.rand(B, N).astype(np.float32))
    want = np.asarray(_integer_shift_lines(xt, jnp.clip(k, 0, L - out - 1),
                                           frac, out))
    got = np.asarray(jnp.swapaxes(shift_lines_dense(x, k, frac, out), 1, 2))
    np.testing.assert_array_equal(got, want)

    # kmax == 0 degenerate case (out_len == L - 1): pure lerp window
    got0 = np.asarray(shift_lines_dense(x, jnp.zeros_like(k), frac, L - 1))
    want0 = np.asarray(jnp.swapaxes(_integer_shift_lines(
        xt, jnp.zeros_like(k), frac, L - 1), 1, 2))
    np.testing.assert_array_equal(got0, want0)


def test_dense_shift_custom_vjp_matches_autodiff():
    """dx / dfrac of the lane-dense shift vs autodiff of the per-line form,
    including a 2nd-order hessian-vector product (R1 differentiates through
    the augment pipe twice)."""
    from stylegan_v_tpu.ops.shear_warp import (_integer_shift_lines,
                                               shift_lines_dense)
    rng = np.random.RandomState(5)
    B, N, L, C, out = 2, 9, 37, 3, 18
    x = jnp.asarray(rng.randn(B, L, N, C).astype(np.float32))
    xt = jnp.swapaxes(x, 1, 2)
    k = jnp.asarray(rng.randint(0, L - out - 1, size=(B, N)), jnp.int32)
    frac = jnp.asarray(rng.rand(B, N).astype(np.float32))
    w = jnp.asarray(rng.randn(B, out, N, C).astype(np.float32))
    wt = jnp.swapaxes(w, 1, 2)

    def loss_ref(xt_):
        return jnp.sum(wt * _integer_shift_lines(xt_, k, frac, out))

    def loss_new(x_):
        return jnp.sum(w * shift_lines_dense(x_, k, frac, out))

    np.testing.assert_allclose(float(loss_new(x)), float(loss_ref(xt)),
                               rtol=1e-6)
    g_ref = np.asarray(jnp.swapaxes(jax.grad(loss_ref)(xt), 1, 2))
    g_new = np.asarray(jax.grad(loss_new)(x))
    np.testing.assert_allclose(g_new, g_ref, rtol=1e-5, atol=1e-6)

    gf_ref = np.asarray(jax.grad(
        lambda f: jnp.sum(wt * _integer_shift_lines(xt, k, f, out)))(frac))
    gf_new = np.asarray(jax.grad(
        lambda f: jnp.sum(w * shift_lines_dense(x, k, f, out)))(frac))
    np.testing.assert_allclose(gf_new, gf_ref, rtol=1e-5, atol=1e-5)

    v = jnp.asarray(rng.randn(*x.shape).astype(np.float32))

    def sq(x_):
        g = jax.grad(lambda y: jnp.sum(
            jnp.square(shift_lines_dense(y, k, frac, out))))(x_)
        return jnp.sum(g * v)

    def sq_ref(xt_):
        g = jax.grad(lambda y: jnp.sum(
            jnp.square(_integer_shift_lines(y, k, frac, out))))(xt_)
        return jnp.sum(g * jnp.swapaxes(v, 1, 2))

    h_new = np.asarray(jax.grad(sq)(x))
    h_ref = np.asarray(jnp.swapaxes(jax.grad(sq_ref)(xt), 1, 2))
    np.testing.assert_allclose(h_new, h_ref, rtol=1e-5, atol=1e-6)


def test_dense_executor_full_warp_equivalence(monkeypatch):
    """shear_affine_grid_sample under STAGE2_IMPL='dense' must match the
    grouped executor bit-for-bit at the full-warp level (both are exact
    reformulations of the same per-line shift)."""
    import stylegan_v_tpu.ops.shear_warp as sw
    rng = np.random.RandomState(9)
    B, H, W, C = 4, 40, 40, 3
    img = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    th = jnp.asarray([0.4, -1.1, 2.2, 0.0])
    G = (rotate2d(th)
         @ scale2d(jnp.asarray([0.9, 1.2, 1.0, 0.7]),
                   jnp.asarray([1.1, 0.8, 1.3, 1.0]))
         @ translate2d(0.05 * jnp.ones(4), -0.1 * jnp.ones(4)))
    monkeypatch.setattr(sw, "STAGE2_IMPL", "grouped")
    ref = np.asarray(sw.shear_affine_grid_sample(img, G, H, W))
    monkeypatch.setattr(sw, "STAGE2_IMPL", "dense")
    got = np.asarray(sw.shear_affine_grid_sample(img, G, H, W))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-5)
