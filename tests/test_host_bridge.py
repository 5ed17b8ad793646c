"""Differentiable host-torch bridge: forward + VJP correctness under jit
(the machinery behind the VGG16-LPIPS / CLIP / ArcFace objectives,
reference project.py:77-88,139 and clip_edit.py:44-110)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from stylegan_v_tpu.metrics.host_bridge import make_host_feature_fn, probe_out_dim


class TinyNet(torch.nn.Module):
    def __init__(self):
        super().__init__()
        torch.manual_seed(0)
        self.lin = torch.nn.Linear(3, 5)

    def forward(self, x):                     # [N, H, W, C]
        return self.lin(x.mean(dim=(1, 2)))   # [N, 5]


def test_bridge_forward_and_grad_match_torch():
    net = TinyNet().eval()
    f = make_host_feature_fn(net, probe_out_dim(net))

    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)

    want = net(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(f(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # loss = sum(features^2): JAX grad through the bridge == torch autograd
    loss = jax.jit(lambda x: jnp.sum(jnp.square(f(x))))
    gx = np.asarray(jax.grad(loss)(jnp.asarray(x)))

    xt = torch.from_numpy(x).requires_grad_(True)
    torch.sum(net(xt) ** 2).backward()
    np.testing.assert_allclose(gx, xt.grad.numpy(), rtol=1e-4, atol=1e-6)


def test_bridge_composes_with_jax_graph():
    """Gradient flows through jnp ops BEFORE the bridge (the synth->detector
    composition used by project/clip_edit)."""
    net = TinyNet().eval()
    f = make_host_feature_fn(net, 5)
    w = jnp.ones((8, 8, 3)) * 0.5

    def loss(w):
        imgs = jnp.stack([jnp.tanh(w), jnp.tanh(2 * w)])
        return jnp.sum(f(imgs))

    g = jax.grad(loss)(w)
    assert g.shape == w.shape
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
