"""modulated_conv2d vs an einsum oracle that materializes per-sample weights
(the reference 'fused' definition, networks.py:54-86, in numpy)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan_v_tpu.ops import modulated_conv2d, setup_filter
from test_upfirdn2d import oracle_upfirdn2d
from test_conv2d_resample import np_conv2d


def oracle_modconv(x, weight, styles, demodulate=True, up=1, down=1, padding=0, f=None,
                   flip_weight=True):
    """Materialize per-sample weights [N,kh,kw,I,O], demodulate, per-sample conv."""
    N = x.shape[0]
    w = weight[None] * styles[:, None, None, :, None]  # [N, kh, kw, I, O]
    if demodulate:
        d = 1.0 / np.sqrt((w ** 2).sum(axis=(1, 2, 3)) + 1e-8)  # [N, O]
        w = w * d[:, None, None, None, :]
    outs = []
    for n in range(N):
        fw = fh = (f.shape[-1] if f is not None else 1)
        px0 = px1 = py0 = py1 = padding
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
            y = oracle_upfirdn2d(x[n:n + 1], f, up=up,
                                 padding=(px0, px1, py0, py1), gain=up ** 2)
            y = np_conv2d(y, w[n], flip_weight=flip_weight)
        else:
            y = oracle_upfirdn2d(x[n:n + 1], f if down > 1 else None,
                                 padding=(px0, px1, py0, py1))
            y = np_conv2d(y, w[n], stride=down, flip_weight=flip_weight)
        outs.append(y)
    return np.concatenate(outs, 0)


@pytest.mark.parametrize("demodulate", [True, False])
@pytest.mark.parametrize("k,up,down", [(3, 1, 1), (3, 2, 1), (3, 1, 2), (1, 1, 1)])
def test_matches_per_sample_weight_oracle(demodulate, k, up, down):
    rng = np.random.RandomState(0)
    N, H, I, O = 3, 8, 4, 5
    x = rng.randn(N, H, H, I).astype(np.float32)
    w = (rng.randn(k, k, I, O) * 0.4).astype(np.float32)
    s = (rng.rand(N, I) + 0.5).astype(np.float32)
    f = setup_filter([1, 3, 3, 1]) if (up > 1 or down > 1) else None
    flip_weight = (up == 1)
    pad = k // 2
    want = oracle_modconv(x, w, s, demodulate=demodulate, up=up, down=down,
                          padding=pad, f=f, flip_weight=flip_weight)
    got = np.asarray(modulated_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(s),
                                      up=up, down=down, padding=pad, resample_filter=f,
                                      demodulate=demodulate, flip_weight=flip_weight))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_demodulated_output_unit_variance():
    """Demodulation should keep output std ~1 for unit-variance input/styles."""
    rng = np.random.RandomState(1)
    x = rng.randn(8, 16, 16, 64).astype(np.float32)
    w = rng.randn(3, 3, 64, 64).astype(np.float32)
    s = np.abs(rng.randn(8, 64)).astype(np.float32) + 0.1
    y = np.asarray(modulated_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(s)))
    assert 0.7 < y.std() < 1.3


def test_noise_add_and_gradients():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 4).astype(np.float32))
    s = jnp.asarray(rng.rand(2, 4).astype(np.float32) + 0.5)
    noise = jnp.asarray(rng.randn(2, 8, 8, 1).astype(np.float32))

    def loss(w, x):
        return jnp.sum(modulated_conv2d(x, w, s, noise=noise, padding=1) ** 2)

    gw = jax.grad(loss, argnums=0)(w, x)
    assert np.isfinite(np.asarray(gw)).all()
    # Second-order through the conv (R1/PL requirement replacing the
    # reference's conv2d_gradfix shims).
    gg = jax.grad(lambda x: jnp.sum(jax.grad(loss, argnums=1)(w, x) ** 2))(x)
    assert np.isfinite(np.asarray(gg)).all()


def test_second_moment_check_grad():
    from jax.test_util import check_grads
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 6, 6, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 3).astype(np.float32))
    s = jnp.asarray(rng.rand(2, 3).astype(np.float32) + 0.5)
    # fp32 finite differences through rsqrt are noisy; this is a structural
    # sanity check (exact parity is covered by the einsum-oracle tests above).
    check_grads(lambda w, s: modulated_conv2d(x, w, s, padding=1).sum(),
                (w, s), order=2, modes=['rev'], rtol=0.1, atol=0.1)
