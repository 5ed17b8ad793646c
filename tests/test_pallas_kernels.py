"""Pallas kernel tests (interpret mode on CPU; compiled parity is exercised
on TPU via scripts/bench_kernels.py)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stylegan_v_tpu.ops import downsample2d, setup_filter
from stylegan_v_tpu.ops.pallas_kernels import downfirdn2d_x2


@pytest.mark.parametrize("shape", [(2, 16, 16, 8), (1, 32, 64, 16), (3, 8, 8, 4)])
@pytest.mark.parametrize("row_block", [2, 4, 8])
def test_downfirdn_matches_lax(shape, row_block):
    f = setup_filter([1, 3, 3, 1])
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    want = np.asarray(downsample2d(x, f))
    got = np.asarray(downfirdn2d_x2(x, f, row_block=row_block, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_downfirdn_bf16():
    f = setup_filter([1, 3, 3, 1])
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 8), jnp.bfloat16)
    want = np.asarray(downsample2d(x, f)).astype(np.float32)
    got = np.asarray(downfirdn2d_x2(x, f, interpret=True)).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


def test_downfirdn_unnormalized_filter():
    f = setup_filter([1, 2, 2, 1], gain=2.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    want = np.asarray(downsample2d(x, f))
    got = np.asarray(downfirdn2d_x2(x, f, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
