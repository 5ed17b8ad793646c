"""InceptionV3 (the TF 'inception-2015-12-05' FID network) in flax — the
FID/KID/IS feature extractor, runnable sharded under jit on TPU.

Architecture is the classic TF-slim InceptionV3 used by every FID
implementation (2048-d global-average 'pool3' features; reference
frechet_inception_distance.py downloads NVIDIA's TorchScript transcription
of the same graph). BN uses stored running stats (inference-only).

Weight import: the exact module naming inside NVIDIA's TorchScript file is
not standardized, so `convert_inception_state_dict` matches tensors by
ORDER AND SHAPE along the canonical layer sequence — robust for a fixed
architecture and validated end-to-end against an independently-written torch
replica in tests. The TorchScript-on-CPU backend remains the bit-exact path.

Layout: NHWC; expects uint8 RGB images (resized to 299 internally, the
detector's native resolution).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ConvBN(nn.Module):
    """conv (no bias) + BN(running stats, eps 1e-3) + relu."""
    out_channels: int
    kernel: Tuple[int, int] = (1, 1)
    stride: Tuple[int, int] = (1, 1)
    padding: str = "VALID"               # 'VALID' | 'SAME'

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        w = self.param("conv_w", nn.initializers.lecun_normal(),
                       (kh, kw, x.shape[-1], self.out_channels), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=self.stride,
            padding=self.padding, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        gamma = self.param("bn_w", nn.initializers.ones,
                           (self.out_channels,), jnp.float32)
        beta = self.param("bn_b", nn.initializers.zeros,
                          (self.out_channels,), jnp.float32)
        mean = self.variable("batch_stats", "bn_mean",
                             lambda: jnp.zeros((self.out_channels,)))
        var = self.variable("batch_stats", "bn_var",
                            lambda: jnp.ones((self.out_channels,)))
        y = (y - mean.value) * jax.lax.rsqrt(var.value + 1e-3) * gamma + beta
        return jax.nn.relu(y)


def _maxpool(x, k=3, s=2, padding="VALID"):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, k, k, 1), (1, s, s, 1), padding)


def _avgpool3_same(x):
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                              "SAME")
    ones = jnp.ones(x.shape[1:3])[None, :, :, None]
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                                (1, 1, 1, 1), "SAME")
    return s / cnt


class MixedA(nn.Module):
    """35x35 inception block (TF mixed / mixed_1 / mixed_2)."""
    pool_ch: int

    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(64, name="b0")(x)
        b1 = ConvBN(64, (5, 5), padding="SAME", name="b1b")(ConvBN(48, name="b1a")(x))
        b2 = ConvBN(96, (3, 3), padding="SAME", name="b2c")(
            ConvBN(96, (3, 3), padding="SAME", name="b2b")(ConvBN(64, name="b2a")(x)))
        b3 = ConvBN(self.pool_ch, name="b3b")(_avgpool3_same(x))
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class MixedB(nn.Module):
    """17x17 reduction (TF mixed_3)."""

    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(384, (3, 3), (2, 2), name="b0")(x)
        b1 = ConvBN(96, (3, 3), (2, 2), name="b1c")(
            ConvBN(96, (3, 3), padding="SAME", name="b1b")(ConvBN(64, name="b1a")(x)))
        b2 = _maxpool(x)
        return jnp.concatenate([b0, b1, b2], axis=-1)


class MixedC(nn.Module):
    """17x17 factorized-7x7 block (TF mixed_4..mixed_7)."""
    mid: int

    @nn.compact
    def __call__(self, x):
        m = self.mid
        b0 = ConvBN(192, name="b0")(x)
        b1 = ConvBN(192, (7, 1), padding="SAME", name="b1c")(
            ConvBN(m, (1, 7), padding="SAME", name="b1b")(ConvBN(m, name="b1a")(x)))
        b2 = ConvBN(192, (1, 7), padding="SAME", name="b2e")(
            ConvBN(m, (7, 1), padding="SAME", name="b2d")(
                ConvBN(m, (1, 7), padding="SAME", name="b2c")(
                    ConvBN(m, (7, 1), padding="SAME", name="b2b")(
                        ConvBN(m, name="b2a")(x)))))
        b3 = ConvBN(192, name="b3b")(_avgpool3_same(x))
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class MixedD(nn.Module):
    """8x8 reduction (TF mixed_8)."""

    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(320, (3, 3), (2, 2), name="b0b")(ConvBN(192, name="b0a")(x))
        b1 = ConvBN(192, (3, 3), (2, 2), name="b1d")(
            ConvBN(192, (7, 1), padding="SAME", name="b1c")(
                ConvBN(192, (1, 7), padding="SAME", name="b1b")(
                    ConvBN(192, name="b1a")(x))))
        b2 = _maxpool(x)
        return jnp.concatenate([b0, b1, b2], axis=-1)


class MixedE(nn.Module):
    """8x8 expanded block (TF mixed_9 / mixed_10)."""

    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(320, name="b0")(x)
        b1 = ConvBN(384, name="b1a")(x)
        b1 = jnp.concatenate([
            ConvBN(384, (1, 3), padding="SAME", name="b1b1")(b1),
            ConvBN(384, (3, 1), padding="SAME", name="b1b2")(b1)], axis=-1)
        b2 = ConvBN(384, (3, 3), padding="SAME", name="b2b")(
            ConvBN(448, name="b2a")(x))
        b2 = jnp.concatenate([
            ConvBN(384, (1, 3), padding="SAME", name="b2c1")(b2),
            ConvBN(384, (3, 1), padding="SAME", name="b2c2")(b2)], axis=-1)
        b3 = ConvBN(192, name="b3b")(_avgpool3_same(x))
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionV3(nn.Module):
    """__call__(images NHWC float in [-1,1] at 299^2) -> 2048-d features
    (return_features=True) or 1008-way logits."""
    num_classes: int = 1008

    @nn.compact
    def __call__(self, x, return_features: bool = True,
                 no_output_bias: bool = False):
        x = ConvBN(32, (3, 3), (2, 2), name="conv")(x)
        x = ConvBN(32, (3, 3), name="conv_1")(x)
        x = ConvBN(64, (3, 3), padding="SAME", name="conv_2")(x)
        x = _maxpool(x)
        x = ConvBN(80, name="conv_3")(x)
        x = ConvBN(192, (3, 3), name="conv_4")(x)
        x = _maxpool(x)
        x = MixedA(32, name="mixed")(x)
        x = MixedA(64, name="mixed_1")(x)
        x = MixedA(64, name="mixed_2")(x)
        x = MixedB(name="mixed_3")(x)
        x = MixedC(128, name="mixed_4")(x)
        x = MixedC(160, name="mixed_5")(x)
        x = MixedC(160, name="mixed_6")(x)
        x = MixedC(192, name="mixed_7")(x)
        x = MixedD(name="mixed_8")(x)
        x = MixedE(name="mixed_9")(x)
        x = MixedE(name="mixed_10")(x)
        feats = jnp.mean(x, axis=(1, 2))               # global avg 'pool3'
        if return_features:
            return feats
        w = self.param("fc_w", nn.initializers.lecun_normal(),
                       (2048, self.num_classes), jnp.float32)
        b = self.param("fc_b", nn.initializers.zeros,
                       (self.num_classes,), jnp.float32)
        logits = feats @ w
        return logits if no_output_bias else logits + b


# --------------------------- weight conversion --------------------------------

_BLOCK_UNITS = {
    "A": ("b0", "b1a", "b1b", "b2a", "b2b", "b2c", "b3b"),
    "B": ("b0", "b1a", "b1b", "b1c"),
    "C": ("b0", "b1a", "b1b", "b1c", "b2a", "b2b", "b2c", "b2d", "b2e", "b3b"),
    "D": ("b0a", "b0b", "b1a", "b1b", "b1c", "b1d"),
    "E": ("b0", "b1a", "b1b1", "b1b2", "b2a", "b2b", "b2c1", "b2c2", "b3b"),
}
_BLOCK_KINDS = ["A", "A", "A", "B", "C", "C", "C", "C", "D", "E", "E"]


def _flatten_conv_sequence(variables) -> List[Tuple[str, Tuple]]:
    """Canonical (path, conv shape) sequence of this module's ConvBN units in
    EXECUTION order (dict-based tree flattening would sort mixed_10 before
    mixed_2)."""
    paths = ["conv", "conv_1", "conv_2", "conv_3", "conv_4"]
    for i, kind in enumerate(_BLOCK_KINDS):
        block = "mixed" if i == 0 else f"mixed_{i}"
        paths.extend(f"{block}/{u}" for u in _BLOCK_UNITS[kind])

    def shape_of(dotted):
        node = variables["params"]
        for part in dotted.split("/"):
            node = node[part]
        return np.shape(node["conv_w"])

    return [(p, shape_of(p)) for p in paths]


def convert_inception_state_dict(tensors: Dict[str, np.ndarray],
                                 template_variables) -> Dict:
    """Order+shape-based mapping of a torch InceptionV3 state_dict into the
    flax tree: walk the source tensors in their stored order, assigning each
    (conv weight, bn gamma/beta/mean/var) group to the next flax ConvBN whose
    conv shape matches (after OIHW->HWIO transpose)."""
    import jax

    # group source tensors per conv unit in order of appearance
    groups: List[Dict[str, np.ndarray]] = []
    cur: Dict[str, np.ndarray] = {}
    for name, val in tensors.items():
        val = np.asarray(val)
        leaf = name.split(".")[-1]
        if leaf == "weight" and val.ndim == 4:
            if cur:
                groups.append(cur)
            cur = {"conv_w": np.transpose(val, (2, 3, 1, 0))}
            continue
        # BN tensors must match the current conv's output channels — guards
        # against unrelated 1-D tensors (e.g. the classifier bias) being
        # swept into the last conv group
        ch_ok = cur and val.ndim == 1 and val.shape[0] == cur["conv_w"].shape[-1]
        if ch_ok and leaf == "weight":
            cur["bn_w"] = val
        elif ch_ok and leaf == "bias":
            cur["bn_b"] = val
        elif ch_ok and leaf == "running_mean":
            cur["bn_mean"] = val
        elif ch_ok and leaf == "running_var":
            cur["bn_var"] = val
    if cur:
        groups.append(cur)

    order = _flatten_conv_sequence(template_variables)
    assert len(groups) >= len(order), (
        f"source has {len(groups)} conv units, need {len(order)}")

    params = jax.tree_util.tree_map(np.asarray, template_variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, template_variables["batch_stats"])

    def put(tree, dotted, key, val):
        node = tree
        for part in dotted.split("/"):
            node = node[part]
        assert np.shape(node[key]) == np.shape(val), (dotted, key)
        node[key] = np.asarray(val, np.float32)

    gi = 0
    for path, shape in order:
        while gi < len(groups) and np.shape(groups[gi]["conv_w"]) != shape:
            gi += 1   # skip aux-head units absent from the feature graph
        assert gi < len(groups), f"no source tensor for {path} {shape}"
        g = groups[gi]
        gi += 1
        put(params, path, "conv_w", g["conv_w"])
        put(params, path, "bn_w", g.get("bn_w", np.ones(shape[-1])))
        put(params, path, "bn_b", g.get("bn_b", np.zeros(shape[-1])))
        put(stats, path, "bn_mean", g.get("bn_mean", np.zeros(shape[-1])))
        put(stats, path, "bn_var", g.get("bn_var", np.ones(shape[-1])))

    # classifier head (the IS path, no_output_bias kwarg): match the unique
    # 2-D weight with a 2048 feature dim (torch layout [num_classes, 2048])
    # + its num_classes bias. The template may lack head params (flax
    # @nn.compact only materializes them when return_features=False runs),
    # so the head is added rather than overwritten; bias defaults to zeros.
    nc = None
    for val in tensors.values():
        val = np.asarray(val)
        if val.ndim == 2 and 2048 in val.shape and val.shape != (2048, 2048):
            w = val.T if val.shape[1] == 2048 else val
            params["fc_w"] = np.asarray(w, np.float32)
            nc = w.shape[1]
    if nc is not None:
        params.setdefault("fc_b", np.zeros((nc,), np.float32))
        for name, val in tensors.items():
            val = np.asarray(val)
            if (val.ndim == 1 and val.shape == (nc,)
                    and name.split(".")[-1] == "bias"):
                params["fc_b"] = np.asarray(val, np.float32)
    return {"params": params, "batch_stats": stats}


def inception_features_fn(variables, batch_size: int = 64, mesh=None,
                          return_features: bool = False,
                          no_output_bias: bool = False):
    """features(images uint8 [N,H,W,C]) -> np [N,2048] under jit on TPU;
    with `mesh`, batches are sharded over the 'data' axis.

    Preprocessing replicates the TF 'inception-2015-12-05' graph that
    NVIDIA's TorchScript transcribes (and that the reference FID/IS invoke
    on raw uint8, reference frechet_inception_distance.py:16-17): cast ->
    ResizeBilinear to 299^2 with TF1 align_corners=False ASYMMETRIC mapping
    (no antialias, applied to the raw 0..255 values) -> Sub(128) ->
    Mul(1/128). With return_features=False, returns the softmax class
    probabilities (optionally skipping the output bias — the reference IS
    detector's no_output_bias kwarg, reference inception_score.py:18)."""
    from .resize import bilinear_resize
    model = InceptionV3()

    def compute(v):
        x = v.astype(jnp.float32)
        x = bilinear_resize(x, 299, 299, h_axis=1, w_axis=2,
                            mapping="asymmetric")
        x = (x - 128.0) * (1.0 / 128.0)
        out = model.apply(variables, x, return_features=return_features,
                          no_output_bias=no_output_bias)
        if not return_features:
            out = jax.nn.softmax(out, axis=-1)
        return out

    if mesh is not None:
        from ...parallel.sharded_eval import sharded_map_batched
        run = jax.jit(compute)        # one jit cache across all calls

        def features(images: np.ndarray) -> np.ndarray:
            return sharded_map_batched(run, images, mesh, batch_size)
    else:
        run = jax.jit(compute)

        def features(images: np.ndarray) -> np.ndarray:
            out = []
            for i in range(0, len(images), batch_size):
                out.append(np.asarray(run(jnp.asarray(images[i:i + batch_size]))))
            return np.concatenate(out, 0)

    features.jittable = compute
    features.mesh = mesh
    return features
