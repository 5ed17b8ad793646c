"""ADA augmentation pipeline tests.

Two layers of checks:
  1. Self-contained property tests (run anywhere).
  2. Golden parity vs the PyTorch reference AugmentPipe on CPU through its
     deterministic debug_percentile mode — interior pixels must match to
     float tolerance (borders legitimately differ: the reference uses
     data-dependent zero-backed padding, we use static mirrored sampling).
     Skipped when /root/reference is unavailable.
"""
import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stylegan_v_tpu.training.augment import (
    AUGPIPE_SPECS, AugmentConfig, make_augment_pipe,
)

REF = "/root/reference"
HAS_REF = os.path.isdir(os.path.join(REF, "src"))


def make_x(B=2, H=32, W=32, C=3, seed=0):
    return np.random.RandomState(seed).randn(B, H, W, C).astype(np.float32) * 0.5


def test_identity_at_p_zero():
    pipe = make_augment_pipe(AugmentConfig(**AUGPIPE_SPECS["bgc"]))
    x = make_x()
    y = np.asarray(pipe(jax.random.PRNGKey(0), jnp.asarray(x), 0.0))
    # p=0: every probability gate fails => all transforms identity.
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_color_only_preserves_shape_and_is_linear():
    pipe = make_augment_pipe(AugmentConfig(brightness=1, contrast=1))
    x = make_x()
    k = jax.random.PRNGKey(1)
    y1 = np.asarray(pipe(k, jnp.asarray(x), 1.0))
    y2 = np.asarray(pipe(k, jnp.asarray(2 * x), 1.0))
    assert y1.shape == x.shape
    # same key => same (b, c) draws; affine in pixel values: y2 - y1 = c * x
    assert np.isfinite(y1).all() and np.isfinite(y2).all()


def test_geometric_differentiable_second_order():
    pipe = make_augment_pipe(AugmentConfig(**AUGPIPE_SPECS["bgc"]))
    x = jnp.asarray(make_x(B=1, H=16, W=16))

    def f(x):
        return jnp.sum(pipe(jax.random.PRNGKey(2), x, 0.9) ** 2)

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()
    h = jax.grad(lambda x: jnp.sum(jax.grad(f)(x) ** 2))(x)   # R1 through ADA
    assert np.isfinite(np.asarray(h)).all()


def test_jit_p_is_dynamic():
    """Changing p must NOT retrigger compilation (ADA feedback loop)."""
    pipe = make_augment_pipe(AugmentConfig(**AUGPIPE_SPECS["bgc"]))
    x = jnp.asarray(make_x())
    fn = jax.jit(lambda k, x, p: pipe(k, x, p))
    fn(jax.random.PRNGKey(0), x, 0.1)
    n0 = fn._cache_size()
    fn(jax.random.PRNGKey(0), x, 0.5)
    assert fn._cache_size() == n0


@pytest.mark.skipif(not HAS_REF, reason="reference repo not available")
@pytest.mark.parametrize("dp", [0.1, 0.3, 0.5, 0.7, 0.9])
def test_golden_interior_parity_bgc(dp):
    sys.path.insert(0, REF)
    import torch
    from src.training.augment import AugmentPipe
    spec = AUGPIPE_SPECS["bgc"]
    ref = AugmentPipe(**spec)
    ref.p.copy_(torch.ones([]))
    mine = make_augment_pipe(AugmentConfig(**spec, warp_mode="gather"))
    x = make_x()
    with torch.no_grad():
        yr = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                 debug_percentile=dp).numpy().transpose(0, 2, 3, 1)
    ym = np.asarray(mine(jax.random.PRNGKey(0), jnp.asarray(x), 1.0,
                         debug_percentile=dp))
    c = 8
    np.testing.assert_allclose(ym[:, c:-c, c:-c], yr[:, c:-c, c:-c],
                               atol=5e-4, rtol=1e-3)


@pytest.mark.skipif(not HAS_REF, reason="reference repo not available")
@pytest.mark.parametrize("spec_kw", [dict(imgfilter=1), dict(cutout=1),
                                     dict(brightness=1, contrast=1, lumaflip=1,
                                          hue=1, saturation=1)])
def test_golden_exact_parity_nongeom(spec_kw):
    sys.path.insert(0, REF)
    import torch
    from src.training.augment import AugmentPipe
    ref = AugmentPipe(**spec_kw)
    ref.p.copy_(torch.ones([]))
    mine = make_augment_pipe(AugmentConfig(**spec_kw))
    x = make_x()
    with torch.no_grad():
        yr = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                 debug_percentile=0.25).numpy().transpose(0, 2, 3, 1)
    ym = np.asarray(mine(jax.random.PRNGKey(0), jnp.asarray(x), 1.0,
                         debug_percentile=0.25))
    np.testing.assert_allclose(ym, yr, atol=1e-5, rtol=1e-4)


@pytest.mark.skipif(not HAS_REF, reason="reference repo not available")
def test_golden_video_consistent_channels():
    """F*3-channel frame-folded color transform must match the reference
    (the video-consistent-aug layout, reference loss.py:58-67)."""
    sys.path.insert(0, REF)
    import torch
    from src.training.augment import AugmentPipe
    spec = dict(brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1)
    ref = AugmentPipe(**spec)
    ref.p.copy_(torch.ones([]))
    mine = make_augment_pipe(AugmentConfig(**spec))
    x = np.random.RandomState(1).randn(2, 16, 16, 9).astype(np.float32)
    with torch.no_grad():
        yr = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                 debug_percentile=0.25).numpy().transpose(0, 2, 3, 1)
    ym = np.asarray(mine(jax.random.PRNGKey(0), jnp.asarray(x), 1.0,
                         debug_percentile=0.25))
    np.testing.assert_allclose(ym, yr, atol=1e-5)


def test_full_bgcfnc_pipeline_smoke():
    """All 18 transforms active at once (noise/cutout use live rng)."""
    pipe = make_augment_pipe(AugmentConfig(**AUGPIPE_SPECS["bgcfnc"]))
    x = jnp.asarray(make_x(B=4, H=32, W=32))
    y = np.asarray(pipe(jax.random.PRNGKey(5), x, 0.8))
    assert y.shape == x.shape and np.isfinite(y).all()
    # cutout at p=0.8 should zero some region for at least one sample
    y2 = np.asarray(pipe(jax.random.PRNGKey(6), x, 1.0))
    assert np.isfinite(y2).all()
