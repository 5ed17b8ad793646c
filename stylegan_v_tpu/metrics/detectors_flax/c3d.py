"""Flax port of the C3D-UCF101 Video-IS detector.

The reference scores Video Inception Score with a TorchScript port of the
tgan2 Chainer C3D-UCF101 model (reference
src/metrics/video_inception_score.py:14-52, README.md:145): the standard C3D
architecture (Tran et al. 2015) — 8 conv3d layers, 5 max-pools, fc6/fc7/fc8 —
fine-tuned on UCF-101 (101 classes), returning softmax class probabilities.

This module provides the same network as NDHWC flax conv3ds (runnable sharded
under jit on TPU) plus a converter from the torch state_dict naming
(conv1a.weight ... fc8.bias). Forward+converter parity — INCLUDING the full
preprocessing chain (112^2 torch-bilinear resize + per-pixel mean-cube
subtraction) — is asserted against an independent torch reimplementation in
tests/test_c3d_flax.py; scripts/validate_detectors.py gates the same chain
against the real TorchScript file at non-native resolution once it is
available (no egress here). The TorchScript backend remains the bit-exact
path when the file is present.

Input contract (mirrors the torchscript port's): uint8 videos [N,T,H,W,C] at
any resolution; preprocessing resizes to 112x112 (torch bilinear,
align_corners=False, no antialias) and subtracts the tgan2 per-pixel mean
cube extracted from the detector file's registered buffer.
"""
from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# Fallback when the detector file carries no mean buffer: per-channel RGB
# means of the tgan2 UCF-101 mean cube (spatially averaged). The real path
# uses the full [16,112,112,3] cube from convert_c3d_state_dict.
UCF101_MEAN_RGB = (101.2, 97.6, 89.6)


class C3D(nn.Module):
    """C3D backbone: x [N, T, H, W, C] float32 (preprocessed) ->
    softmax probabilities [N, num_classes]."""
    num_classes: int = 101

    @nn.compact
    def __call__(self, x: jax.Array, return_probs: bool = True) -> jax.Array:
        def conv(c, name):
            return nn.Conv(c, (3, 3, 3), padding=1, name=name)

        def pool(x, t_stride):
            return nn.max_pool(x, (t_stride, 2, 2), strides=(t_stride, 2, 2))

        x = nn.relu(conv(64, "conv1a")(x))
        x = pool(x, 1)                                   # T x 56 x 56
        x = nn.relu(conv(128, "conv2a")(x))
        x = pool(x, 2)                                   # T/2 x 28 x 28
        x = nn.relu(conv(256, "conv3a")(x))
        x = nn.relu(conv(256, "conv3b")(x))
        x = pool(x, 2)                                   # T/4 x 14 x 14
        x = nn.relu(conv(512, "conv4a")(x))
        x = nn.relu(conv(512, "conv4b")(x))
        x = pool(x, 2)                                   # T/8 x 7 x 7
        x = nn.relu(conv(512, "conv5a")(x))
        x = nn.relu(conv(512, "conv5b")(x))
        # pool5 pads H/W by 1 on both sides (torch MaxPool3d padding=(0,1,1)):
        # 2x7x7 -> 1x4x4, windows aligned as (pad,x0),(x1,x2),(x3,x4),(x5,x6)
        x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = pool(x, 2)
        # flatten in the torch [C, T, H, W] order so fc6 weights map 1:1
        x = jnp.transpose(x, (0, 4, 1, 2, 3)).reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(4096, name="fc6")(x))
        x = nn.relu(nn.Dense(4096, name="fc7")(x))
        x = nn.Dense(self.num_classes, name="fc8")(x)
        return jax.nn.softmax(x, axis=-1) if return_probs else x


def convert_c3d_state_dict(state_dict: Dict[str, np.ndarray],
                           num_classes: int = 101) -> Dict:
    """torch C3D state_dict -> flax variables.

    conv3d [O, I, kt, kh, kw] -> [kt, kh, kw, I, O]; linear [out, in] ->
    [in, out]. Handles TorchScript prefix wrappers (e.g. 'model.conv1a...').

    Additionally extracts the tgan2 PER-PIXEL MEAN CUBE if the TorchScript
    registered it as a buffer (the tgan2 eval subtracts a [3,16,112,112]
    Sports-1M/UCF mean volume, not a scalar per channel — reference
    src/metrics/video_inception_score.py:16-19 cites that exact port). When
    present it is returned under variables['preprocess']['mean_cube'] as
    [16,112,112,3] and c3d_features_fn uses it verbatim.
    """
    params: Dict[str, Dict[str, np.ndarray]] = {}
    mean_cube = None
    for name, arr in state_dict.items():
        a = np.asarray(arr)
        sq = np.squeeze(a)
        if "mean" in name.split(".")[-1].lower() and sq.ndim == 4:
            if sq.shape[0] == 3:                   # [3, T, H, W] torch layout
                sq = np.transpose(sq, (1, 2, 3, 0))
            if sq.shape[-1] == 3:
                mean_cube = np.ascontiguousarray(sq, np.float32)
            continue
        parts = name.split(".")
        if len(parts) < 2 or parts[-1] not in ("weight", "bias"):
            continue
        layer, kind = parts[-2], parts[-1]
        arr = np.asarray(arr, np.float32)
        if layer.startswith("conv"):
            val = (np.transpose(arr, (2, 3, 4, 1, 0)) if kind == "weight"
                   else arr)
            params.setdefault(layer, {})["kernel" if kind == "weight"
                                         else "bias"] = val
        elif layer.startswith("fc"):
            val = arr.T if kind == "weight" else arr
            params.setdefault(layer, {})["kernel" if kind == "weight"
                                         else "bias"] = val
    expected = {"conv1a", "conv2a", "conv3a", "conv3b", "conv4a", "conv4b",
                "conv5a", "conv5b", "fc6", "fc7", "fc8"}
    missing = expected - set(params)
    assert not missing, f"C3D converter: missing layers {sorted(missing)}"
    out: Dict = {"params": params}
    if mean_cube is not None:
        out["preprocess"] = {"mean_cube": mean_cube}
    return out


def c3d_features_fn(variables, batch_size: int = 16, mesh=None,
                    mean_rgb: Tuple[float, float, float] = UCF101_MEAN_RGB):
    """features(videos uint8 [N,T,H,W,C]) -> np [N,101] class probabilities,
    under jit; with `mesh`, batches shard over the 'data' axis.

    Preprocessing chain (the tgan2 convention the TorchScript wraps,
    reference src/metrics/video_inception_score.py:16-19): cast float ->
    resize frames to 112^2 with torch bilinear (align_corners=False, no
    antialias) on the raw 0..255 values -> subtract the PER-PIXEL
    [16,112,112,3] mean cube (extracted from the detector file by
    convert_c3d_state_dict; spatially-flat channel-mean fallback when the
    file carries no mean buffer). For T != 16 the cube is averaged over
    time (Video-IS always evaluates 16-frame clips, so this is off-path).
    """
    from .resize import bilinear_resize
    variables = dict(variables)
    pre = variables.pop("preprocess", None)
    cube = None if pre is None else np.asarray(pre["mean_cube"], np.float32)
    model = C3D()
    mean_flat = jnp.asarray(mean_rgb, jnp.float32)

    def compute(v):
        x = v.astype(jnp.float32)
        x = bilinear_resize(x, 112, 112, h_axis=2, w_axis=3,
                            mapping="half_pixel")
        if cube is not None:
            m = (jnp.asarray(cube) if x.shape[1] == cube.shape[0]
                 else jnp.asarray(cube.mean(axis=0, keepdims=True)))
            x = x - m[None]
        else:
            x = x - mean_flat
        return model.apply(variables, x)

    if mesh is not None:
        from ...parallel.sharded_eval import sharded_map_batched
        run = jax.jit(compute)        # one jit cache across all calls

        def features(videos: np.ndarray) -> np.ndarray:
            return sharded_map_batched(run, videos, mesh, batch_size)
    else:
        run = jax.jit(compute)

        def features(videos: np.ndarray) -> np.ndarray:
            out = []
            for i in range(0, len(videos), batch_size):
                out.append(np.asarray(run(jnp.asarray(videos[i:i + batch_size]))))
            return np.concatenate(out, 0)

    features.jittable = compute
    features.mesh = mesh
    return features
