"""flax I3D vs an independently-written torch replica of the public
Kinetics-I3D architecture: converter + forward parity on random weights.

This validates (a) the flax architecture, (b) TF-SAME padding replication,
(c) BN running-stats math, and (d) the state_dict name mapping — everything
except the identity of the actual pretrained file, for which the CPU-torch
TorchScript execution backend remains the bit-exact reference.
"""
import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as TF

from stylegan_v_tpu.metrics.detectors_flax import (
    InceptionI3d, convert_i3d_state_dict,
)
from stylegan_v_tpu.metrics.detectors_flax.i3d import MIXED_CHANNELS


# ----------------------- torch replica (test oracle) -------------------------

def same_pad_3d(x, kernel, stride):
    pads = []
    for s, k, st in zip(x.shape[2:], kernel, stride):
        out = -(-s // st)
        p = max(0, (out - 1) * st + k - s)
        pads.append((p // 2, p - p // 2))
    # F.pad takes reversed order (W, H, D)
    flat = [v for pair in reversed(pads) for v in pair]
    return TF.pad(x, flat)


class TUnit3D(tnn.Module):
    def __init__(self, in_ch, out_ch, kernel=(1, 1, 1), stride=(1, 1, 1)):
        super().__init__()
        self.kernel, self.stride = kernel, stride
        self.conv3d = tnn.Conv3d(in_ch, out_ch, kernel, stride, bias=False)
        self.bn = tnn.BatchNorm3d(out_ch, eps=1e-3)

    def forward(self, x):
        x = same_pad_3d(x, self.kernel, self.stride)
        return TF.relu(self.bn(self.conv3d(x)))


class TMixed(tnn.Module):
    def __init__(self, in_ch, ch):
        super().__init__()
        self.b0 = TUnit3D(in_ch, ch[0])
        self.b1a = TUnit3D(in_ch, ch[1])
        self.b1b = TUnit3D(ch[1], ch[2], kernel=(3, 3, 3))
        self.b2a = TUnit3D(in_ch, ch[3])
        self.b2b = TUnit3D(ch[3], ch[4], kernel=(3, 3, 3))
        self.b3b = TUnit3D(in_ch, ch[5])

    def forward(self, x):
        mp = same_pad_3d(x, (3, 3, 3), (1, 1, 1))
        mp = TF.max_pool3d(mp, (3, 3, 3), (1, 1, 1))
        return torch.cat([self.b0(x), self.b1b(self.b1a(x)),
                          self.b2b(self.b2a(x)), self.b3b(mp)], dim=1)


class TI3D(tnn.Module):
    def __init__(self):
        super().__init__()
        chans = {k: sum(v[i] for i in (0, 2, 4, 5)) for k, v in
                 MIXED_CHANNELS.items()}
        self.Conv3d_1a_7x7 = TUnit3D(3, 64, (7, 7, 7), (2, 2, 2))
        self.Conv3d_2b_1x1 = TUnit3D(64, 64)
        self.Conv3d_2c_3x3 = TUnit3D(64, 192, (3, 3, 3))
        self.Mixed_3b = TMixed(192, MIXED_CHANNELS["Mixed_3b"])
        self.Mixed_3c = TMixed(chans["Mixed_3b"], MIXED_CHANNELS["Mixed_3c"])
        self.Mixed_4b = TMixed(chans["Mixed_3c"], MIXED_CHANNELS["Mixed_4b"])
        self.Mixed_4c = TMixed(chans["Mixed_4b"], MIXED_CHANNELS["Mixed_4c"])
        self.Mixed_4d = TMixed(chans["Mixed_4c"], MIXED_CHANNELS["Mixed_4d"])
        self.Mixed_4e = TMixed(chans["Mixed_4d"], MIXED_CHANNELS["Mixed_4e"])
        self.Mixed_4f = TMixed(chans["Mixed_4e"], MIXED_CHANNELS["Mixed_4f"])
        self.Mixed_5b = TMixed(chans["Mixed_4f"], MIXED_CHANNELS["Mixed_5b"])
        self.Mixed_5c = TMixed(chans["Mixed_5b"], MIXED_CHANNELS["Mixed_5c"])

    def forward(self, x):   # x [N, C, T, H, W] in [-1, 1]
        x = self.Conv3d_1a_7x7(x)
        x = TF.max_pool3d(same_pad_3d(x, (1, 3, 3), (1, 2, 2)), (1, 3, 3), (1, 2, 2))
        x = self.Conv3d_2b_1x1(x)
        x = self.Conv3d_2c_3x3(x)
        x = TF.max_pool3d(same_pad_3d(x, (1, 3, 3), (1, 2, 2)), (1, 3, 3), (1, 2, 2))
        x = self.Mixed_3b(x)
        x = self.Mixed_3c(x)
        x = TF.max_pool3d(same_pad_3d(x, (3, 3, 3), (2, 2, 2)), (3, 3, 3), (2, 2, 2))
        for m in (self.Mixed_4b, self.Mixed_4c, self.Mixed_4d, self.Mixed_4e,
                  self.Mixed_4f):
            x = m(x)
        x = TF.max_pool3d(same_pad_3d(x, (2, 2, 2), (2, 2, 2)), (2, 2, 2), (2, 2, 2))
        x = self.Mixed_5b(x)
        x = self.Mixed_5c(x)
        x = TF.avg_pool3d(x, (2, 7, 7), (1, 1, 1))
        return x.mean(dim=[2, 3, 4])


@pytest.mark.slow
def test_i3d_forward_parity_random_weights():
    torch.manual_seed(0)
    ref = TI3D().eval()
    # randomize BN stats so the stats conversion is actually exercised
    for m in ref.modules():
        if isinstance(m, tnn.BatchNorm3d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)

    variables = convert_i3d_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()})

    rng = np.random.RandomState(0)
    x = rng.rand(2, 16, 224, 224, 3).astype(np.float32) * 2 - 1   # NTHWC
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()

    model = InceptionI3d()
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert got.shape == want.shape == (2, 1024)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


@pytest.mark.slow
def test_i3d_preprocessing_chain_parity_non_native_res():
    """Raw uint8 256^2 videos through the FULL chain with the reference FVD
    kwargs (rescale=True, resize=True — reference
    frechet_video_distance.py:23): torch oracle = the TorchScript's internal
    preprocessing (x*2/255-1, then trilinear resize to (T,224,224),
    align_corners=False) + the replica network; flax = i3d_features_fn.
    This is the gate the round-2 validator was blind to (it only fed 224^2,
    where resize is a no-op)."""
    torch.manual_seed(0)
    ref = TI3D().eval()
    for m in ref.modules():
        if isinstance(m, tnn.BatchNorm3d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)
    variables = convert_i3d_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()})

    rng = np.random.RandomState(0)
    videos = rng.randint(0, 256, (2, 16, 256, 256, 3)).astype(np.uint8)
    with torch.no_grad():
        x = torch.from_numpy(
            videos.transpose(0, 4, 1, 2, 3).astype(np.float32))
        x = x * (2.0 / 255.0) - 1.0
        x = TF.interpolate(x, size=(x.shape[2], 224, 224), mode="trilinear",
                           align_corners=False)
        want = ref(x).numpy()

    from stylegan_v_tpu.metrics.detectors_flax import i3d_features_fn
    got = i3d_features_fn(variables, rescale=True, resize=True,
                          return_features=True)(videos)
    assert got.shape == want.shape == (2, 1024)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def test_converter_handles_prefixes():
    sd = {"wrapped.module.Conv3d_1a_7x7.conv3d.weight":
          np.zeros((64, 3, 7, 7, 7), np.float32),
          "wrapped.module.Conv3d_1a_7x7.bn.weight": np.ones(64, np.float32),
          "wrapped.module.Conv3d_1a_7x7.bn.bias": np.zeros(64, np.float32),
          "wrapped.module.Conv3d_1a_7x7.bn.running_mean": np.zeros(64, np.float32),
          "wrapped.module.Conv3d_1a_7x7.bn.running_var": np.ones(64, np.float32)}
    v = convert_i3d_state_dict(sd)
    assert v["params"]["Conv3d_1a_7x7"]["conv_w"].shape == (7, 7, 7, 3, 64)
    assert v["batch_stats"]["Conv3d_1a_7x7"]["bn_var"].shape == (64,)
