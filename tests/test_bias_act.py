"""bias_act unit tests against numpy closures (reference bias_act.py:23-33 math)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stylegan_v_tpu.ops import bias_act
from stylegan_v_tpu.ops.bias_act import activation_funcs


def np_ref(x, b, act, alpha, gain, clamp):
    x = x + b.reshape(1, -1, 1) if b is not None else x
    if act == 'linear':
        y = x
    elif act == 'relu':
        y = np.maximum(x, 0)
    elif act == 'lrelu':
        y = np.where(x >= 0, x, x * alpha)
    elif act == 'tanh':
        y = np.tanh(x)
    elif act == 'sigmoid':
        y = 1 / (1 + np.exp(-x))
    elif act == 'elu':
        y = np.where(x >= 0, x, np.exp(x) - 1)
    elif act == 'selu':
        lam, a = 1.0507009873554805, 1.6732632423543772
        y = lam * np.where(x >= 0, x, a * (np.exp(x) - 1))
    elif act == 'softplus':
        y = np.log1p(np.exp(x))
    elif act == 'swish':
        y = x / (1 + np.exp(-x))
    y = y * gain
    if clamp is not None:
        y = np.clip(y, -clamp, clamp)
    return y


@pytest.mark.parametrize("act", sorted(activation_funcs.keys()))
def test_bias_act_matches_numpy(act):
    rng = np.random.RandomState(0)
    x = rng.randn(4, 8, 5).astype(np.float32) * 3
    b = rng.randn(8).astype(np.float32)
    spec = activation_funcs[act]
    got = np.asarray(bias_act(jnp.asarray(x), jnp.asarray(b), axis=1, act=act))
    want = np_ref(x, b, act, spec.def_alpha, spec.def_gain, None)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_gain_and_clamp():
    x = jnp.asarray(np.linspace(-10, 10, 21, dtype=np.float32))
    y = np.asarray(bias_act(x, act='linear', gain=2.0, clamp=5.0))
    np.testing.assert_allclose(y, np.clip(np.linspace(-10, 10, 21) * 2, -5, 5), rtol=1e-5)


def test_clamp_zeroes_gradient_outside():
    # Gradient-clamp semantics: grads are zero where fwd output was clamped
    # (reference bias_act.cu:136-142 behavior via jnp.clip VJP).
    g = jax.grad(lambda x: bias_act(x, act='linear', gain=1.0, clamp=1.0).sum())
    x = jnp.asarray([0.5, 2.0, -3.0])
    np.testing.assert_allclose(np.asarray(g(x)), [1.0, 0.0, 0.0])


def test_second_order_gradients():
    # R1/PL differentiate through activations twice (reference has_2nd_grad).
    for act in ['lrelu', 'tanh', 'softplus', 'swish']:
        f = lambda x: jnp.sum(bias_act(x, act=act) ** 2)
        h = jax.grad(lambda x: jnp.sum(jax.grad(f)(x) ** 2))(jnp.ones((3,)) * 0.3)
        assert np.isfinite(np.asarray(h)).all(), act


def test_default_axis_is_channels_last():
    x = jnp.zeros((2, 4, 4, 3))
    b = jnp.asarray([1.0, 2.0, 3.0])
    y = np.asarray(bias_act(x, b, act='linear'))
    np.testing.assert_allclose(y[0, 0, 0], [1, 2, 3])
