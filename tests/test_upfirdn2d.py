"""upfirdn2d unit tests against an independent numpy oracle.

The oracle implements the documented contract (reference upfirdn2d.py:121-135)
literally: zero-insert, pad/crop, 2-D correlation with the flipped filter,
decimate. scipy.signal.upfirdn cross-checks the separable path.
"""
import numpy as np
import pytest
import jax.numpy as jnp

import importlib

U = importlib.import_module("stylegan_v_tpu.ops.upfirdn2d")


def oracle_upfirdn2d(x, f, up=1, down=1, padding=0, flip_filter=False, gain=1.0):
    """Literal numpy implementation of the upfirdn2d contract. x: NHWC."""
    if isinstance(up, int):
        up = (up, up)
    if isinstance(down, int):
        down = (down, down)
    if isinstance(padding, int):
        padding = [padding] * 4
    elif len(padding) == 2:
        padding = [padding[0], padding[0], padding[1], padding[1]]
    upx, upy = up
    downx, downy = down
    px0, px1, py0, py1 = padding

    if f is None:
        f = np.ones((1, 1), np.float32)
    f = np.asarray(f, np.float64)
    if f.ndim == 1:
        # separable: treated as outer product for the oracle (same math)
        f = np.outer(f, f)
        gain_eff = gain
    else:
        gain_eff = gain
    N, H, W, C = x.shape

    y = np.zeros((N, H * upy, W * upx, C), np.float64)
    y[:, ::upy, ::upx, :] = x
    y = np.pad(y, ((0, 0), (max(py0, 0), max(py1, 0)), (max(px0, 0), max(px1, 0)), (0, 0)))
    y = y[:, max(-py0, 0):y.shape[1] - max(-py1, 0), max(-px0, 0):y.shape[2] - max(-px1, 0), :]

    ff = f * gain_eff
    if not flip_filter:
        ff = ff[::-1, ::-1]
    fh, fw = ff.shape
    out = np.zeros((N, y.shape[1] - fh + 1, y.shape[2] - fw + 1, C))
    for i in range(out.shape[1]):
        for j in range(out.shape[2]):
            out[:, i, j, :] = (y[:, i:i + fh, j:j + fw, :] * ff[None, :, :, None]).sum((1, 2))
    return out[:, ::downy, ::downx, :]


CASES = [
    dict(up=1, down=1, padding=0),
    dict(up=1, down=1, padding=2),
    dict(up=2, down=1, padding=(2, 1, 1, 2)),
    dict(up=1, down=2, padding=1),
    dict(up=2, down=2, padding=(3, 0, 0, 3)),
    dict(up=1, down=1, padding=(-1, 2, 1, -1)),
    dict(up=2, down=1, padding=(-2, 3, 1, -1), flip_filter=True),
    dict(up=4, down=3, padding=2, gain=4.0),
    dict(up=(2, 1), down=(1, 2), padding=(1, 1, 2, 2)),
]


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("ftaps", [(4, 4), (3, 3), (1, 1)])
def test_upfirdn2d_matches_oracle(case, ftaps):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 7, 9, 3).astype(np.float32)
    f = rng.randn(*ftaps).astype(np.float32)
    want = oracle_upfirdn2d(x, f, **case)
    got = np.asarray(U.upfirdn2d(jnp.asarray(x), f, **case))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_separable_matches_2d():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 12, 12, 2).astype(np.float32)
    taps = rng.randn(8).astype(np.float32)
    got_sep = np.asarray(U.upfirdn2d(jnp.asarray(x), taps, up=2, padding=3, gain=4.0))
    got_2d = np.asarray(U.upfirdn2d(jnp.asarray(x), np.outer(taps, taps), up=2, padding=3, gain=4.0))
    np.testing.assert_allclose(got_sep, got_2d, rtol=1e-4, atol=1e-4)


def test_against_scipy_upfirdn_1d_axis():
    from scipy.signal import upfirdn as sp_upfirdn
    rng = np.random.RandomState(2)
    n, up, down = 16, 2, 3
    x1d = rng.randn(n).astype(np.float32)
    taps = rng.randn(5).astype(np.float32)
    # scipy works on x*up length and full convolution; align via padding:
    # upfirdn2d pads (taps-1) in front to realize scipy's "full" start.
    x = x1d[None, None, :, None]
    # scipy computes a FULL true convolution of the zero-inserted signal:
    # realize it with front/back padding of (taps-1) and flip_filter=False.
    got = np.asarray(U.upfirdn2d(
        jnp.asarray(x), taps[None, :], up=(up, 1), down=(down, 1),
        padding=(len(taps) - 1, len(taps) - 1, 0, 0)))[0, 0, :, 0]
    want = sp_upfirdn(taps, x1d, up=up, down=down)
    np.testing.assert_allclose(got[:len(want)], want[:len(got)], rtol=1e-4, atol=1e-4)


def test_setup_filter_matches_reference_semantics():
    # [1,3,3,1] binomial: non-separable (numel<8), normalized outer product.
    f = U.setup_filter([1, 3, 3, 1])
    assert f.shape == (4, 4)
    np.testing.assert_allclose(f.sum(), 1.0, rtol=1e-6)
    outer = np.outer([1, 3, 3, 1], [1, 3, 3, 1]).astype(np.float32)
    np.testing.assert_allclose(f, outer / outer.sum(), rtol=1e-6)
    # 8 taps -> separable 1-D.
    f8 = U.setup_filter([1, 2, 3, 4, 4, 3, 2, 1])
    assert f8.ndim == 1 and f8.shape[0] == 8
    np.testing.assert_allclose(f8.sum(), 1.0, rtol=1e-6)
    # gain scaling: ndim/2 exponent.
    fg = U.setup_filter([1, 3, 3, 1], gain=4)
    np.testing.assert_allclose(fg.sum(), 4.0, rtol=1e-5)
    # impulse/None -> 2-D (1,1) identity (reference: ger of the 1-tap filter).
    fi = U.setup_filter(None)
    assert fi.shape == (1, 1) and fi[0, 0] == 1.0


def test_up_down_sample2d_shapes_and_dc():
    f = U.setup_filter([1, 3, 3, 1])
    x = jnp.ones((1, 8, 8, 2), jnp.float32)
    up = U.upsample2d(x, f)
    assert up.shape == (1, 16, 16, 2)
    # DC preservation away from borders (filter normalized, gain=up^2 folded in).
    np.testing.assert_allclose(np.asarray(up)[0, 4:12, 4:12, :], 1.0, rtol=1e-4)
    dn = U.downsample2d(x, f)
    assert dn.shape == (1, 4, 4, 2)
    np.testing.assert_allclose(np.asarray(dn)[0, 1:3, 1:3, :], 1.0, rtol=1e-4)


def test_grad_flows_and_second_order():
    import jax
    f = U.setup_filter([1, 3, 3, 1])

    def loss(x):
        return jnp.sum(U.upsample2d(x, f) ** 2)

    x = jnp.ones((1, 4, 4, 1), jnp.float32) * 0.5
    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    # Second order (needed by R1 / path-length regularizers).
    h = jax.grad(lambda x: jnp.sum(jax.grad(loss)(x) ** 2))(x)
    assert np.isfinite(np.asarray(h)).all()
