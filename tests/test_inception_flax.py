"""flax InceptionV3 (FID network) vs an independently-written torch replica:
order+shape converter + forward parity on random weights."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as TF

from stylegan_v_tpu.metrics.detectors_flax.inception_v3 import (
    InceptionV3, convert_inception_state_dict,
)


class TConvBN(tnn.Module):
    def __init__(self, ci, co, k=(1, 1), s=(1, 1), pad="valid"):
        super().__init__()
        if pad == "same":
            padding = (k[0] // 2, k[1] // 2)   # odd kernels only
        else:
            padding = 0
        self.conv = tnn.Conv2d(ci, co, k, s, padding, bias=False)
        self.bn = tnn.BatchNorm2d(co, eps=1e-3)

    def forward(self, x):
        return TF.relu(self.bn(self.conv(x)))


def avg3s(x):
    return TF.avg_pool2d(x, 3, 1, padding=1, count_include_pad=False)


class TMixedA(tnn.Module):
    def __init__(self, ci, pool_ch):
        super().__init__()
        self.b0 = TConvBN(ci, 64)
        self.b1a, self.b1b = TConvBN(ci, 48), TConvBN(48, 64, (5, 5), pad="same")
        self.b2a = TConvBN(ci, 64)
        self.b2b = TConvBN(64, 96, (3, 3), pad="same")
        self.b2c = TConvBN(96, 96, (3, 3), pad="same")
        self.b3b = TConvBN(ci, pool_ch)

    def forward(self, x):
        return torch.cat([self.b0(x), self.b1b(self.b1a(x)),
                          self.b2c(self.b2b(self.b2a(x))),
                          self.b3b(avg3s(x))], 1)


class TMixedB(tnn.Module):
    def __init__(self, ci):
        super().__init__()
        self.b0 = TConvBN(ci, 384, (3, 3), (2, 2))
        self.b1a = TConvBN(ci, 64)
        self.b1b = TConvBN(64, 96, (3, 3), pad="same")
        self.b1c = TConvBN(96, 96, (3, 3), (2, 2))

    def forward(self, x):
        return torch.cat([self.b0(x), self.b1c(self.b1b(self.b1a(x))),
                          TF.max_pool2d(x, 3, 2)], 1)


class TMixedC(tnn.Module):
    def __init__(self, ci, m):
        super().__init__()
        self.b0 = TConvBN(ci, 192)
        self.b1a = TConvBN(ci, m)
        self.b1b = TConvBN(m, m, (1, 7), pad="same")
        self.b1c = TConvBN(m, 192, (7, 1), pad="same")
        self.b2a = TConvBN(ci, m)
        self.b2b = TConvBN(m, m, (7, 1), pad="same")
        self.b2c = TConvBN(m, m, (1, 7), pad="same")
        self.b2d = TConvBN(m, m, (7, 1), pad="same")
        self.b2e = TConvBN(m, 192, (1, 7), pad="same")
        self.b3b = TConvBN(ci, 192)

    def forward(self, x):
        return torch.cat([
            self.b0(x), self.b1c(self.b1b(self.b1a(x))),
            self.b2e(self.b2d(self.b2c(self.b2b(self.b2a(x))))),
            self.b3b(avg3s(x))], 1)


class TMixedD(tnn.Module):
    def __init__(self, ci):
        super().__init__()
        self.b0a, self.b0b = TConvBN(ci, 192), TConvBN(192, 320, (3, 3), (2, 2))
        self.b1a = TConvBN(ci, 192)
        self.b1b = TConvBN(192, 192, (1, 7), pad="same")
        self.b1c = TConvBN(192, 192, (7, 1), pad="same")
        self.b1d = TConvBN(192, 192, (3, 3), (2, 2))

    def forward(self, x):
        return torch.cat([self.b0b(self.b0a(x)),
                          self.b1d(self.b1c(self.b1b(self.b1a(x)))),
                          TF.max_pool2d(x, 3, 2)], 1)


class TMixedE(tnn.Module):
    def __init__(self, ci):
        super().__init__()
        self.b0 = TConvBN(ci, 320)
        self.b1a = TConvBN(ci, 384)
        self.b1b1 = TConvBN(384, 384, (1, 3), pad="same")
        self.b1b2 = TConvBN(384, 384, (3, 1), pad="same")
        self.b2a = TConvBN(ci, 448)
        self.b2b = TConvBN(448, 384, (3, 3), pad="same")
        self.b2c1 = TConvBN(384, 384, (1, 3), pad="same")
        self.b2c2 = TConvBN(384, 384, (3, 1), pad="same")
        self.b3b = TConvBN(ci, 192)

    def forward(self, x):
        b1 = self.b1a(x)
        b2 = self.b2b(self.b2a(x))
        return torch.cat([self.b0(x),
                          torch.cat([self.b1b1(b1), self.b1b2(b1)], 1),
                          torch.cat([self.b2c1(b2), self.b2c2(b2)], 1),
                          self.b3b(avg3s(x))], 1)


class TInception(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv = TConvBN(3, 32, (3, 3), (2, 2))
        self.conv_1 = TConvBN(32, 32, (3, 3))
        self.conv_2 = TConvBN(32, 64, (3, 3), pad="same")
        self.conv_3 = TConvBN(64, 80)
        self.conv_4 = TConvBN(80, 192, (3, 3))
        self.mixed = TMixedA(192, 32)
        self.mixed_1 = TMixedA(256, 64)
        self.mixed_2 = TMixedA(288, 64)
        self.mixed_3 = TMixedB(288)
        self.mixed_4 = TMixedC(768, 128)
        self.mixed_5 = TMixedC(768, 160)
        self.mixed_6 = TMixedC(768, 160)
        self.mixed_7 = TMixedC(768, 192)
        self.mixed_8 = TMixedD(768)
        self.mixed_9 = TMixedE(1280)
        self.mixed_10 = TMixedE(2048)

    def forward(self, x):
        x = self.conv(x)
        x = self.conv_1(x)
        x = self.conv_2(x)
        x = TF.max_pool2d(x, 3, 2)
        x = self.conv_3(x)
        x = self.conv_4(x)
        x = TF.max_pool2d(x, 3, 2)
        for m in (self.mixed, self.mixed_1, self.mixed_2, self.mixed_3,
                  self.mixed_4, self.mixed_5, self.mixed_6, self.mixed_7,
                  self.mixed_8, self.mixed_9, self.mixed_10):
            x = m(x)
        return x.mean(dim=[2, 3])


@pytest.mark.slow
def test_inception_forward_parity_random_weights():
    torch.manual_seed(0)
    ref = TInception().eval()
    for m in ref.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)

    model = InceptionV3()
    x0 = jnp.zeros((1, 299, 299, 3))
    template = model.init(jax.random.PRNGKey(0), x0)
    variables = convert_inception_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()}, template)

    rng = np.random.RandomState(0)
    x = rng.rand(2, 299, 299, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert got.shape == want.shape == (2, 2048)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-3)


def _np_tf1_resize(x, out_h, out_w):
    """TF1 resize_bilinear(align_corners=False) oracle (asymmetric mapping),
    vectorized per axis — the resampler inside NVIDIA's FID TorchScript."""
    def axis(v, out_size, ax):
        n = v.shape[ax]
        src = np.arange(out_size) * (n / out_size)
        i0 = np.floor(src).astype(int)
        i1 = np.minimum(i0 + 1, n - 1)
        w = (src - i0).reshape([-1 if a == ax else 1 for a in range(v.ndim)])
        return np.take(v, i0, ax) * (1 - w) + np.take(v, i1, ax) * w
    return axis(axis(x.astype(np.float64), out_h, 1), out_w, 2)


@pytest.mark.slow
def test_inception_preprocessing_chain_parity_non_native_res():
    """Raw uint8 256^2 images through the FULL chain: torch oracle = the TF
    graph's preprocessing (cast -> TF1 asymmetric ResizeBilinear to 299^2 on
    raw 0..255 values -> Sub(128) -> Mul(1/128)) + the replica network; flax
    = inception_features_fn (VERDICT r2 task 1, Inception half)."""
    torch.manual_seed(0)
    ref = TInception().eval()
    for m in ref.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)
    model = InceptionV3()
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    variables = convert_inception_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()}, template)

    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (2, 256, 256, 3)).astype(np.uint8)
    pre = (_np_tf1_resize(images, 299, 299) - 128.0) / 128.0
    with torch.no_grad():
        want = ref(torch.from_numpy(
            pre.transpose(0, 3, 1, 2).astype(np.float32))).numpy()

    from stylegan_v_tpu.metrics.detectors_flax.inception_v3 import (
        inception_features_fn)
    got = inception_features_fn(variables, return_features=True)(images)
    assert got.shape == want.shape == (2, 2048)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-3)


def test_converter_maps_classifier_head():
    """The IS path needs the 1008-way head: the converter must pick up the
    unique [num_classes, 2048] weight + bias, and no_output_bias must drop
    the bias (reference inception_score.py:18 detector kwargs)."""
    torch.manual_seed(1)
    ref = TInception().eval()
    model = InceptionV3()
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    fc_w = np.random.RandomState(3).randn(1008, 2048).astype(np.float32) * 0.01
    fc_b = np.random.RandomState(4).randn(1008).astype(np.float32)
    sd["output.weight"] = fc_w
    sd["output.bias"] = fc_b
    variables = convert_inception_state_dict(sd, template)
    np.testing.assert_allclose(variables["params"]["fc_w"], fc_w.T)
    np.testing.assert_allclose(variables["params"]["fc_b"], fc_b)

    x = np.random.RandomState(5).rand(2, 299, 299, 3).astype(np.float32)
    feats = np.asarray(model.apply(variables, jnp.asarray(x)))
    logits = np.asarray(model.apply(variables, jnp.asarray(x),
                                    return_features=False))
    logits_nb = np.asarray(model.apply(variables, jnp.asarray(x),
                                       return_features=False,
                                       no_output_bias=True))
    np.testing.assert_allclose(logits, feats @ fc_w.T + fc_b,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(logits_nb, feats @ fc_w.T, rtol=1e-4, atol=1e-4)
