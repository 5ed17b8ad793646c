"""TF-era (TensorFlow StyleGAN2) pickle conversion tests.

Covers reference src/legacy.py:109-286 parity without TensorFlow installed:
synthetic pickles are built with the exact tflib on-disk structure (a 3-tuple
of dnnlib.tflib.network.Network objects whose state carries version /
static_kwargs / components / variables), loaded through SafeRefUnpickler,
and converted. Value checks are computed independently with numpy against
the published TF->torch mapping (reference legacy.py:171-202, 273-283)
composed with our torch->flax layout rules.
"""
import io
import pickle
import sys
import types

import numpy as np
import pytest

from stylegan_v_tpu.io.legacy import SafeRefUnpickler, load_network_pkl
from stylegan_v_tpu.io.legacy_tf import (TFNetworkStub,
                                         convert_tf_discriminator_state,
                                         convert_tf_generator_state,
                                         is_tf_pickle)

RES = 32
WDIM = 64
FMAP_BASE = 512          # channel_base = 1024
FMAP_MAX = 64
# channels_dict for channel_base=1024 / channel_max=64
CH = {4: 64, 8: 64, 16: 64, 32: 32}


# --------------------------- synthetic TF pickles ---------------------------

def _install_tflib_module():
    """A real module named dnnlib.tflib.network so plain pickle records the
    class path the reference TF pickles use."""
    if "dnnlib.tflib.network" in sys.modules:
        return sys.modules["dnnlib.tflib.network"].Network
    dnnlib = sys.modules.setdefault("dnnlib", types.ModuleType("dnnlib"))
    tflib = sys.modules.setdefault("dnnlib.tflib",
                                   types.ModuleType("dnnlib.tflib"))
    network = types.ModuleType("dnnlib.tflib.network")

    class Network:
        pass

    Network.__module__ = "dnnlib.tflib.network"
    Network.__qualname__ = "Network"
    network.Network = Network
    dnnlib.tflib = tflib
    tflib.network = network
    sys.modules["dnnlib.tflib.network"] = network
    return Network


def _net(Network, name, static_kwargs, variables, components=None, version=4):
    n = Network()
    n.__dict__.update(dict(version=version, name=name,
                           static_kwargs=dict(static_kwargs),
                           components=dict(components or {}),
                           variables=list(variables)))
    return n


def make_tf_generator(rnd, version=4):
    Network = _install_tflib_module()
    g_kwargs = dict(latent_size=WDIM, dlatent_size=WDIM, resolution=RES,
                    num_channels=3, mapping_layers=2, fmap_base=FMAP_BASE,
                    fmap_max=FMAP_MAX, nonlinearity="lrelu",
                    resample_kernel=[1, 3, 3, 1], use_noise=True,
                    truncation_psi=0.5)          # ignored kwarg exercised
    mapping_vars = []
    for i in range(2):
        mapping_vars += [(f"Dense{i}/weight", rnd.randn(WDIM, WDIM)),
                         (f"Dense{i}/bias", rnd.randn(WDIM))]
    syn_vars = [("4x4/Const/const", rnd.randn(1, CH[4], 4, 4)),
                ("noise0", rnd.randn(1, 1, 4, 4))]

    def conv(prefix, kin, kout, k=3, noise=None, mod_in=None):
        v = [(f"{prefix}/weight", rnd.randn(k, k, kin, kout)),
             (f"{prefix}/bias", rnd.randn(kout)),
             (f"{prefix}/mod_weight", rnd.randn(WDIM, mod_in or kin)),
             (f"{prefix}/mod_bias", rnd.randn(mod_in or kin))]
        if noise is not None:
            v += [(f"{prefix}/noise_strength", np.asarray(rnd.randn()))]
        return v

    syn_vars += conv("4x4/Conv", CH[4], CH[4], noise=0)
    syn_vars += conv("4x4/ToRGB", CH[4], 3, k=1)
    for r in (8, 16, 32):
        lg = int(np.log2(r))
        syn_vars += conv(f"{r}x{r}/Conv0_up", CH[r // 2], CH[r], noise=0,
                         mod_in=CH[r // 2])
        syn_vars += [(f"noise{2 * lg - 5}", rnd.randn(1, 1, r, r))]
        syn_vars += conv(f"{r}x{r}/Conv1", CH[r], CH[r], noise=0)
        syn_vars += [(f"noise{2 * lg - 4}", rnd.randn(1, 1, r, r))]
        syn_vars += conv(f"{r}x{r}/ToRGB", CH[r], 3, k=1)
    return _net(Network, "G", g_kwargs,
                [("dlatent_avg", rnd.randn(WDIM))],
                components=dict(
                    mapping=_net(Network, "G_mapping", {}, mapping_vars),
                    synthesis=_net(Network, "G_synthesis", {}, syn_vars)),
                version=version)


def make_tf_discriminator(rnd):
    Network = _install_tflib_module()
    d_kwargs = dict(label_size=0, resolution=RES, num_channels=3,
                    fmap_base=FMAP_BASE, fmap_max=FMAP_MAX,
                    architecture="resnet", nonlinearity="lrelu",
                    mbstd_group_size=2, mbstd_num_features=1)
    v = [(f"{RES}x{RES}/FromRGB/weight", rnd.randn(1, 1, 3, CH[RES])),
         (f"{RES}x{RES}/FromRGB/bias", rnd.randn(CH[RES]))]
    for r in (32, 16, 8):
        v += [(f"{r}x{r}/Conv0/weight", rnd.randn(3, 3, CH[r], CH[r])),
              (f"{r}x{r}/Conv0/bias", rnd.randn(CH[r])),
              (f"{r}x{r}/Conv1_down/weight",
               rnd.randn(3, 3, CH[r], CH[r // 2])),
              (f"{r}x{r}/Conv1_down/bias", rnd.randn(CH[r // 2])),
              (f"{r}x{r}/Skip/weight", rnd.randn(1, 1, CH[r], CH[r // 2]))]
    v += [("4x4/Conv/weight", rnd.randn(3, 3, CH[4] + 1, CH[4])),
          ("4x4/Conv/bias", rnd.randn(CH[4])),
          ("4x4/Dense0/weight", rnd.randn(CH[4] * 16, CH[4])),
          ("4x4/Dense0/bias", rnd.randn(CH[4])),
          ("Output/weight", rnd.randn(CH[4], 1)),
          ("Output/bias", rnd.randn(1))]
    return _net(Network, "D", d_kwargs, v)


def tf_pickle_bytes(rnd):
    G = make_tf_generator(rnd)
    D = make_tf_discriminator(rnd)
    Gs = make_tf_generator(rnd)
    return pickle.dumps((G, D, Gs))


def tf_value(net, name):
    """Look up a variable by collected (component-prefixed) name."""
    from stylegan_v_tpu.io.legacy_tf import collect_tf_params
    return collect_tf_params(net)[name]


# --------------------------------- tests ------------------------------------

def test_unpickler_maps_tflib_network_to_stub():
    rnd = np.random.RandomState(0)
    data = SafeRefUnpickler(io.BytesIO(tf_pickle_bytes(rnd))).load()
    assert is_tf_pickle(data)
    tf_G = data[0]
    assert isinstance(tf_G, TFNetworkStub)
    assert tf_G.version == 4
    assert set(tf_G.components) == {"mapping", "synthesis"}


def test_generator_value_parity():
    rnd = np.random.RandomState(1)
    tf_G = make_tf_generator(rnd)
    conv, kwargs = convert_tf_generator_state(tf_G)
    params = conv["params"]

    assert kwargs["channel_base"] == FMAP_BASE * 2
    assert kwargs["img_resolution"] == RES and kwargs["use_noise"] is True

    # w_avg -> moving collection
    np.testing.assert_array_equal(
        conv["moving"]["mapping"]["w_avg"],
        tf_value(tf_G, "dlatent_avg").astype(np.float32))
    # fc weight: TF [in, out] -> torch [out, in] -> flax [in, out] = identity
    np.testing.assert_array_equal(
        params["mapping"]["fc0"]["weight"],
        tf_value(tf_G, "mapping/Dense0/weight").astype(np.float32))
    # const: TF [1, C, 4, 4] -> flax [4, 4, C]
    np.testing.assert_array_equal(
        params["synthesis"]["b4"]["input"]["const"],
        tf_value(tf_G, "synthesis/4x4/Const/const")[0]
        .transpose(1, 2, 0).astype(np.float32))
    # plain conv: TF HWIO -> torch OIHW -> flax HWIO = identity
    np.testing.assert_array_equal(
        params["synthesis"]["b8"]["conv1"]["weight"],
        tf_value(tf_G, "synthesis/8x8/Conv1/weight").astype(np.float32))
    # up-conv: spatially flipped (reference legacy.py:184)
    np.testing.assert_array_equal(
        params["synthesis"]["b16"]["conv0"]["weight"],
        tf_value(tf_G, "synthesis/16x16/Conv0_up/weight")[::-1, ::-1]
        .astype(np.float32))
    # style affine: mod_weight^T^T = identity, mod_bias + 1
    np.testing.assert_array_equal(
        params["synthesis"]["b16"]["conv0"]["affine"]["weight"],
        tf_value(tf_G, "synthesis/16x16/Conv0_up/mod_weight")
        .astype(np.float32))
    np.testing.assert_array_equal(
        params["synthesis"]["b16"]["conv0"]["affine"]["bias"],
        (tf_value(tf_G, "synthesis/16x16/Conv0_up/mod_bias") + 1)
        .astype(np.float32))
    # noise: buffer noise{2*log2(r)-5}[0,0] -> [H, W, 1], strength scalar
    np.testing.assert_array_equal(
        conv["buffers"]["synthesis"]["b32"]["conv0"]["noise_const"],
        tf_value(tf_G, "synthesis/noise5")[0, 0, :, :, None]
        .astype(np.float32))
    assert params["synthesis"]["b4"]["conv1"]["noise_strength"].shape == ()


def test_discriminator_value_parity():
    rnd = np.random.RandomState(2)
    tf_D = make_tf_discriminator(rnd)
    conv, kwargs = convert_tf_discriminator_state(tf_D)
    params = conv["params"]

    assert kwargs["channel_base"] == FMAP_BASE * 2
    # down-conv: no flip, identity through the double transpose
    np.testing.assert_array_equal(
        params["b16"]["conv1"]["weight"],
        tf_value(tf_D, "16x16/Conv1_down/weight").astype(np.float32))
    np.testing.assert_array_equal(
        params["b32"]["skip"]["weight"],
        tf_value(tf_D, "32x32/Skip/weight").astype(np.float32))
    # epilogue fc: torch flattens [C, 4, 4], ours [4, 4, C] — check the
    # permutation explicitly on a recognizable pattern
    w_tf = tf_value(tf_D, "4x4/Dense0/weight")       # [C*16, out]
    w_t = w_tf.transpose()                           # torch [out, C*16]
    C = CH[4]
    expect = (w_t.reshape(-1, C, 4, 4).transpose(0, 2, 3, 1)
              .reshape(w_t.shape[0], -1).transpose())  # flax [in(HWC), out]
    np.testing.assert_array_equal(params["b4"]["fc"]["weight"],
                                  expect.astype(np.float32))
    np.testing.assert_array_equal(
        params["b4"]["out"]["weight"],
        tf_value(tf_D, "Output/weight").astype(np.float32))


def test_version_and_architecture_gates():
    rnd = np.random.RandomState(3)
    old = make_tf_generator(rnd, version=3)
    with pytest.raises(ValueError, match="version too low"):
        convert_tf_generator_state(old)

    prog = make_tf_generator(rnd)
    prog.components["synthesis"].variables.append(
        ("ToRGB_lod0/weight", rnd.randn(1, 1, CH[RES], 3)))
    with pytest.raises(NotImplementedError, match="progressive-era"):
        convert_tf_generator_state(prog)

    unk = make_tf_generator(rnd)
    unk.static_kwargs["definitely_not_a_kwarg"] = 1
    with pytest.raises(ValueError, match="Unknown TensorFlow kwarg"):
        convert_tf_generator_state(unk)


def test_end_to_end_transfer_into_flax_generator(tmp_path):
    """Full path: TF pickle on disk -> import_reference_snapshot with a video
    Generator template -> merged params drive a forward pass."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from stylegan_v_tpu.io.legacy import import_reference_snapshot
    from stylegan_v_tpu.models import Generator
    from stylegan_v_tpu.models.config import (GeneratorConfig, MotionConfig,
                                              SamplingConfig, TimeEncConfig)

    rnd = np.random.RandomState(4)
    path = tmp_path / "tf_snapshot.pkl"
    path.write_bytes(tf_pickle_bytes(rnd))

    data = load_network_pkl(str(path))
    assert isinstance(data["G"], TFNetworkStub)
    assert data["training_set_kwargs"] is None

    gcfg = GeneratorConfig(
        w_dim=WDIM, z_dim=WDIM, img_resolution=RES, channel_base=1024,
        channel_max=64, num_bf16_res=0, conv_clamp=None, mapping_layers=2,
        use_noise=True, input_type="const",
        motion=MotionConfig(z_dim=32, v_dim=32, motion_z_distance=16),
        time_enc=TimeEncConfig(dim=32),
        sampling=SamplingConfig(num_frames_per_video=2, max_num_frames=128,
                                total_dists=(1, 2, 4, 8), max_dist=8))
    G = Generator(gcfg)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "motion": jax.random.PRNGKey(2)}
    z = jnp.zeros((2, WDIM))
    t = jnp.arange(4, dtype=jnp.float32).reshape(2, 2)
    template = G.init(rngs, z, None, t, noise_mode="const")

    out = import_reference_snapshot(str(path), gen_template=template)
    merged = out["G_ema"]
    assert set(merged) == set(template)

    # the synthesis ladder actually transferred: conv1@b8 equals the TF value
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["synthesis"]["b8"]["conv1"]["weight"]),
        tf_value(data["G_ema"], "synthesis/8x8/Conv1/weight")
        .astype(np.float32))
    # and a fresh leaf (motion encoder) survived untouched
    tpl_leaf, mrg_leaf = (
        jax.tree_util.tree_leaves(c["params"]["synthesis"]["motion_encoder"])
        for c in (template, merged))
    for a, b in zip(tpl_leaf, mrg_leaf):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    img = G.apply(merged, z, None, t, noise_mode="const",
                  rngs={"motion": jax.random.PRNGKey(3)})
    assert img.shape == (4, RES, RES, 3)
    assert bool(jnp.all(jnp.isfinite(img)))
