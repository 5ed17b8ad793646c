"""conv2d_resample tests: fast paths must equal the documented generic pipeline.

Oracle = oracle_upfirdn2d (spec-literal) composed with a literal numpy dense
correlation, following reference conv2d_resample.py:59-104 padding math.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from stylegan_v_tpu.ops import conv2d_resample, setup_filter
from test_upfirdn2d import oracle_upfirdn2d


def np_conv2d(x, w, stride=1, flip_weight=True):
    """Literal correlation, NHWC x HWIO -> NHWC, VALID padding."""
    if not flip_weight:
        w = w[::-1, ::-1]
    N, H, W, I = x.shape
    kh, kw, _, O = w.shape
    oh, ow = (H - kh) // stride + 1, (W - kw) // stride + 1
    out = np.zeros((N, oh, ow, O))
    for i in range(oh):
        for j in range(ow):
            patch = x[:, i * stride:i * stride + kh, j * stride:j * stride + kw, :]
            out[:, i, j, :] = np.einsum('nhwi,hwio->no', patch, w)
    return out


def oracle_conv2d_resample(x, w, f, up, down, padding, flip_weight=True):
    """The documented generic pipeline (reference conv2d_resample.py:149-153)."""
    fw = fh = (f.shape[-1] if f is not None else 1)
    if isinstance(padding, int):
        px0 = px1 = py0 = py1 = padding
    else:
        px0, px1, py0, py1 = padding
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2
    if up > 1:
        # upsample path: zero-insert + FIR + pad, dense conv, then decimate.
        y = oracle_upfirdn2d(x, f, up=up, padding=(px0, px1, py0, py1), gain=up ** 2)
        y = np_conv2d(y, w, flip_weight=flip_weight)
        if down > 1:
            y = oracle_upfirdn2d(y, f, down=down)
        return y
    # down/plain path: FIR + pad first, then (strided) dense conv — this is
    # the path the reference actually executes (conv2d_resample.py:118-122).
    y = oracle_upfirdn2d(x, f if down > 1 else None, padding=(px0, px1, py0, py1))
    return np_conv2d(y, w, stride=down, flip_weight=flip_weight)


@pytest.mark.parametrize("k,up,down,pad", [
    (3, 1, 1, 1),   # plain 3x3, SAME-ish
    (1, 1, 1, 0),   # 1x1
    (3, 2, 1, 1),   # SynthesisLayer up=2
    (3, 1, 2, 1),   # DiscriminatorBlock down=2
    (1, 2, 1, 0),   # resnet skip up
    (1, 1, 2, 0),   # resnet skip down
])
def test_matches_generic_oracle(k, up, down, pad):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    w = rng.randn(k, k, 3, 4).astype(np.float32) * 0.3
    f = setup_filter([1, 3, 3, 1]) if (up > 1 or down > 1) else None
    flip_weight = (up == 1)  # mirrors reference layer convention (networks.py:136)
    want = oracle_conv2d_resample(x, w, f, up, down, pad, flip_weight=flip_weight)
    got = np.asarray(conv2d_resample(jnp.asarray(x), jnp.asarray(w), f=f, up=up,
                                     down=down, padding=pad, flip_weight=flip_weight))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_shapes_synthesis_ladder():
    """Resolution doubling/halving contract across a 4->32 ladder."""
    f = setup_filter([1, 3, 3, 1])
    x = jnp.zeros((2, 4, 4, 8))
    w_up = jnp.zeros((3, 3, 8, 8))
    y = conv2d_resample(x, w_up, f=f, up=2, padding=1, flip_weight=False)
    assert y.shape == (2, 8, 8, 8)
    w_dn = jnp.zeros((3, 3, 8, 8))
    z = conv2d_resample(y, w_dn, f=f, down=2, padding=1)
    assert z.shape == (2, 4, 4, 8)
