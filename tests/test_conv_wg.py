"""Space-to-batch weight-grad conv (ops/conv_wg.py): exactness vs the
natural lowering to first and second order, factor selection, and the
conv2d_resample routing (incl. negative padding and the force mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from stylegan_v_tpu.ops import conv_wg
from stylegan_v_tpu.ops.conv2d_resample import conv2d_resample
from stylegan_v_tpu.ops.conv_wg import choose_s2b_factors, conv_valid_s2b


def _ref_conv(xp, w):
    return lax.conv_general_dilated(
        xp, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_choose_factors_production_shape(monkeypatch):
    # selection rule under "auto" (the production default is "0": the
    # on-chip A/B measured the reformulation slower — see conv_wg.py)
    monkeypatch.setattr(conv_wg, "_MODE", "auto")
    # depth 48: sh*sw=8 fills three 128-tiles exactly -> zero depth padding
    assert choose_s2b_factors(48, 256, 256, 3, 3) == (2, 4)
    # depth already >= a full tile multiple: naive is optimal
    assert choose_s2b_factors(128, 64, 64, 3, 3) is None
    assert choose_s2b_factors(256, 32, 32, 3, 3) is None
    # indivisible spatial dims fall back to divisible factors only
    assert choose_s2b_factors(48, 15, 15, 3, 3) is None
    # quadrants must stay kernel-sized
    assert choose_s2b_factors(4, 8, 8, 3, 3) is not None
    assert choose_s2b_factors(4, 2, 2, 3, 3) is None


@pytest.mark.parametrize("shape,k,factors", [
    ((6, 16, 16, 5), (3, 3), (2, 2)),
    ((3, 12, 18, 4), (3, 3), (2, 4)),
    ((2, 9, 8, 3), (1, 3), (3, 2)),   # asymmetric kernel; sh=3 exercises
])                                    # a non-power-of-two quadrant count
def test_first_and_second_order_exact(shape, k, factors):
    rng = np.random.RandomState(0)
    N, H, W, I = shape
    kh, kw = k
    O = 7
    xp = jnp.asarray(rng.randn(N, H, W, I), jnp.float32)
    w = jnp.asarray(rng.randn(kh, kw, I, O), jnp.float32)
    dy = jnp.asarray(rng.randn(N, H - kh + 1, W - kw + 1, O), jnp.float32)

    y = conv_valid_s2b(xp, w, factors)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_ref_conv(xp, w)),
                               rtol=1e-6, atol=1e-6)

    def loss(f):
        return lambda a, b: jnp.vdot(f(a, b), dy)

    gx, gw = jax.grad(loss(lambda a, b: conv_valid_s2b(a, b, factors)),
                      argnums=(0, 1))(xp, w)
    rx, rw = jax.grad(loss(_ref_conv), argnums=(0, 1))(xp, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-5, atol=1e-5)

    # reverse-over-reverse (the R1/PL pattern): grad wrt w of |grad_x|^2
    def r1(f):
        def inner(a, b):
            g = jax.grad(lambda aa: jnp.sum(jnp.square(f(aa, b))))(a)
            return jnp.sum(jnp.square(g))
        return inner

    hw = jax.grad(r1(lambda a, b: conv_valid_s2b(a, b, factors)),
                  argnums=1)(xp, w)
    hw_ref = jax.grad(r1(_ref_conv), argnums=1)(xp, w)
    np.testing.assert_allclose(np.asarray(hw), np.asarray(hw_ref),
                               rtol=2e-4, atol=2e-4)


def test_resample_routing_matches_disabled(monkeypatch):
    """conv2d_resample output + grads are identical with the s2b route
    forced on vs off, across plain / negative-padding / up-fused paths."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 16, 16, 6), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 6, 8), jnp.float32)
    f = jnp.asarray([1.0, 3.0, 3.0, 1.0])
    f = jnp.outer(f, f) / jnp.sum(jnp.outer(f, f))

    cases = [dict(padding=1), dict(padding=(-1, 2, 0, -2)),
             dict(up=2, f=f, padding=1), dict(flip_weight=False, padding=1)]
    for kw_ in cases:
        def run(mode):
            monkeypatch.setattr(conv_wg, "_MODE", mode)
            def loss(a, b):
                return jnp.sum(jnp.square(conv2d_resample(a, b, **kw_)))
            val = loss(x, w)
            gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
            return val, gx, gw
        v0, gx0, gw0 = run("0")
        v1, gx1, gw1 = run("force")
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw0),
                                   rtol=1e-4, atol=1e-4)


def test_auto_mode_leaves_large_batch_untouched(monkeypatch):
    """At metric-eval batch sizes the cost rule keeps the naive lowering
    (no custom-vjp call appears in the jaxpr)."""
    monkeypatch.setattr(conv_wg, "_MODE", "auto")
    x = jnp.zeros((256, 8, 8, 4), jnp.float32)
    w = jnp.zeros((3, 3, 4, 4), jnp.float32)
    jaxpr = jax.make_jaxpr(lambda a, b: conv2d_resample(a, b, padding=1))(x, w)
    assert "custom_vjp" not in str(jaxpr)
    x = jnp.zeros((48, 8, 8, 4), jnp.float32)
    jaxpr = jax.make_jaxpr(lambda a, b: conv2d_resample(a, b, padding=1))(x, w)
    assert "custom_vjp" in str(jaxpr)
