"""Weight-import parity: reference checkpoint -> our Generator/Discriminator.

The strongest correctness test in the suite: builds the PyTorch reference
G and D on CPU (from /root/reference, via the omegaconf shim), snapshots them
through a persistence-style pickle, imports with our exec-free SafeRefUnpickler,
converts weights into our NHWC trees, and compares forward outputs numerically
on identical (z, t, motion_z). Skipped when /root/reference is unavailable.
"""
import os
import pickle
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_shims import install, make_ref_cfg

HAS_REF = os.path.isdir("/root/reference/src")
pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference repo not available")

from stylegan_v_tpu.io.legacy import (
    SafeRefUnpickler, convert_discriminator_state, convert_generator_state,
    flatten_module_state, load_network_pkl,
)
from stylegan_v_tpu.models import (
    Discriminator, DiscriminatorConfig, Generator, GeneratorConfig, MotionConfig,
    SamplingConfig, TimeEncConfig,
)


def my_cfgs():
    sampling = SamplingConfig(num_frames_per_video=3, max_num_frames=128,
                              total_dists=(1, 2, 4, 8), max_dist=8)
    gcfg = GeneratorConfig(
        w_dim=64, z_dim=64, img_resolution=32, channel_base=1024, channel_max=64,
        num_bf16_res=0, conv_clamp=None, mapping_layers=2,
        motion=MotionConfig(z_dim=32, v_dim=32, motion_z_distance=16),
        time_enc=TimeEncConfig(dim=32), sampling=sampling)
    dcfg = DiscriminatorConfig(
        img_resolution=32, channel_base=1024, channel_max=64, num_bf16_res=0,
        conv_clamp=None, concat_res=16, mbstd_group_size=2, mapping_layers=2,
        sampling=sampling)
    return gcfg, dcfg


@pytest.fixture(scope="module")
def ref_modules():
    install()
    import torch
    torch.manual_seed(0)
    from src.training.networks import Generator as RefG, Discriminator as RefD
    cfg = make_ref_cfg()
    G = RefG(c_dim=0, w_dim=64, img_resolution=32, img_channels=3, cfg=cfg,
             mapping_kwargs={"num_layers": 2},
             synthesis_kwargs={"channel_base": 1024, "channel_max": 64,
                               "num_fp16_res": 0, "conv_clamp": None}).eval()
    D = RefD(c_dim=0, img_resolution=32, img_channels=3, cfg=cfg,
             channel_base=1024, channel_max=64, num_fp16_res=0, conv_clamp=None,
             mapping_kwargs={"num_layers": 2},
             epilogue_kwargs={"mbstd_group_size": 2}).eval()
    return G, D


def roundtrip_state(module):
    """plain-pickle the torch module state (the snapshot path uses live-module
    pickles; we emulate with a state_dict payload plus a persistence-style
    wrapper for the SafeRefUnpickler path test)."""
    blob = pickle.dumps({k: v for k, v in module.state_dict().items()})
    import io as _io
    return SafeRefUnpickler(_io.BytesIO(blob)).load()


def test_safe_unpickler_decodes_tensors(ref_modules):
    G, _ = ref_modules
    state = roundtrip_state(G)
    assert "mapping.fc0.weight" in state
    assert np.asarray(state["mapping.fc0.weight"].numpy()).shape == (64, 64)


def test_generator_output_parity(ref_modules):
    install()
    import torch
    RefG, _ = ref_modules
    gcfg, _ = my_cfgs()
    myG = Generator(gcfg)

    flat = {k: v.numpy() for k, v in RefG.state_dict().items()}
    variables = convert_generator_state(flat)

    B, F = 2, 3
    rng = np.random.RandomState(0)
    z = rng.randn(B, 64).astype(np.float32)
    t = np.array([[0.0, 5.5, 17.0], [2.0, 8.0, 30.25]], np.float32)
    L = 1 + int(np.ceil(max(127, t.max()) / 16)) + 1 + 20   # ref traj len formula
    from stylegan_v_tpu.models.motion import MotionMappingNetwork
    L = MotionMappingNetwork.required_traj_len(gcfg, float(t.max()))
    motion_z = rng.randn(B, L, 32).astype(np.float32)

    with torch.no_grad():
        ref_img = RefG(torch.from_numpy(z), torch.zeros(B, 0),
                       torch.from_numpy(t), motion_z=torch.from_numpy(motion_z),
                       noise_mode="none").numpy()           # [B*F, 3, 32, 32]

    my_img = myG.apply(variables, jnp.asarray(z), None, jnp.asarray(t),
                       motion_z=jnp.asarray(motion_z), noise_mode="none")
    my_img = np.asarray(my_img).transpose(0, 3, 1, 2)        # NHWC -> NCHW

    assert my_img.shape == ref_img.shape
    diff = np.abs(my_img - ref_img)
    assert diff.max() < 5e-3, f"generator output mismatch: max {diff.max()}"
    # outputs are in roughly [-1, 1]; demand tight relative agreement
    assert diff.mean() < 5e-4


def test_motion_encoder_parity(ref_modules):
    install()
    import torch
    RefG, _ = ref_modules
    gcfg, _ = my_cfgs()
    from stylegan_v_tpu.models.motion import MotionMappingNetwork
    enc = MotionMappingNetwork(gcfg)

    flat = {k.replace("synthesis.motion_encoder.", ""): v.numpy()
            for k, v in RefG.state_dict().items()
            if k.startswith("synthesis.motion_encoder.")}
    variables = convert_generator_state(
        {f"synthesis.motion_encoder.{k}": v for k, v in flat.items()})
    enc_vars = {"params": variables["params"]["synthesis"]["motion_encoder"]}

    B, F = 2, 3
    rng = np.random.RandomState(1)
    t = np.array([[0.0, 15.9, 16.1], [40.0, 41.0, 100.0]], np.float32)
    L = MotionMappingNetwork.required_traj_len(gcfg, float(t.max()))
    motion_z = rng.randn(B, L, 32).astype(np.float32)

    with torch.no_grad():
        ref_out = RefG.synthesis.motion_encoder(
            torch.zeros(B, 0), torch.from_numpy(t),
            motion_z=torch.from_numpy(motion_z))["motion_v"].numpy()

    my_out = np.asarray(enc.apply(enc_vars, None, jnp.asarray(t),
                                  motion_z=jnp.asarray(motion_z))["motion_v"])
    np.testing.assert_allclose(my_out, ref_out, atol=2e-4, rtol=1e-3)


def test_autoregressive_motion_encoder_import_parity():
    """LSTM (gen_strategy='autoregressive', MoCoGAN-style) weight import:
    torch nn.LSTM gate blocks -> flax OptimizedLSTMCell (reference
    motion.py:44-48, legacy name patterns legacy.py:171-202)."""
    install()
    import torch
    torch.manual_seed(3)
    from src.training.networks import Generator as RefG
    cfg = make_ref_cfg(motion={"z_dim": 32, "v_dim": 32, "motion_z_distance": 16,
                               "gen_strategy": "autoregressive", "kernel_size": 11,
                               "use_fractional_t": True, "fourier": True})
    RefG = RefG(c_dim=0, w_dim=64, img_resolution=32, img_channels=3, cfg=cfg,
                mapping_kwargs={"num_layers": 2},
                synthesis_kwargs={"channel_base": 1024, "channel_max": 64,
                                  "num_fp16_res": 0, "conv_clamp": None}).eval()

    gcfg, _ = my_cfgs()
    from dataclasses import replace
    gcfg = replace(gcfg, motion=replace(gcfg.motion, gen_strategy="autoregressive"))

    flat = {k: v.numpy() for k, v in RefG.state_dict().items()}
    variables = convert_generator_state(flat)
    # LSTM weights must land converted in params, not stashed raw
    assert "OptimizedLSTMCell_0" in \
        variables["params"]["synthesis"]["motion_encoder"]["rnn"]
    assert "legacy_rnn" not in variables.get("buffers", {})

    from stylegan_v_tpu.models.motion import MotionMappingNetwork
    enc = MotionMappingNetwork(gcfg)
    enc_vars = {"params": variables["params"]["synthesis"]["motion_encoder"]}

    B = 2
    rng = np.random.RandomState(4)
    t = np.array([[0.0, 15.9, 16.1], [40.0, 41.0, 100.0]], np.float32)
    L = MotionMappingNetwork.required_traj_len(gcfg, float(t.max()))
    motion_z = rng.randn(B, L, 32).astype(np.float32)

    with torch.no_grad():
        ref_out = RefG.synthesis.motion_encoder(
            torch.zeros(B, 0), torch.from_numpy(t),
            motion_z=torch.from_numpy(motion_z))["motion_v"].numpy()
    my_out = np.asarray(enc.apply(enc_vars, None, jnp.asarray(t),
                                  motion_z=jnp.asarray(motion_z))["motion_v"])
    np.testing.assert_allclose(my_out, ref_out, atol=2e-4, rtol=1e-3)

    # full-G output parity through the synthesis ladder
    z = rng.randn(B, 64).astype(np.float32)
    with torch.no_grad():
        want = RefG(torch.from_numpy(z), torch.zeros(B, 0), torch.from_numpy(t),
                    motion_z=torch.from_numpy(motion_z), noise_mode="none").numpy()
    myG = Generator(gcfg)
    got = np.asarray(myG.apply(variables, jnp.asarray(z), None, jnp.asarray(t),
                               motion_z=jnp.asarray(motion_z), noise_mode="none"))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-2, atol=5e-3)


def test_discriminator_logit_parity(ref_modules):
    install()
    import torch
    _, RefD = ref_modules
    _, dcfg = my_cfgs()
    myD = Discriminator(dcfg)

    flat = {k: v.numpy() for k, v in RefD.state_dict().items()}
    chans4 = 64  # channels_dict[4] for channel_base=1024, channel_max=64
    variables = convert_discriminator_state(flat, epilogue_channels=chans4)

    B, F = 2, 3
    rng = np.random.RandomState(2)
    img = rng.randn(B * F, 3, 32, 32).astype(np.float32)
    t = np.array([[0.0, 2.0, 7.0], [1.0, 5.0, 6.0]], np.float32)

    with torch.no_grad():
        ref_logits = RefD(torch.from_numpy(img), torch.zeros(B, 0),
                          torch.from_numpy(t))["image_logits"].numpy()

    my_logits = np.asarray(myD.apply(
        variables, jnp.asarray(img.transpose(0, 2, 3, 1)), None,
        jnp.asarray(t))["image_logits"])
    np.testing.assert_allclose(my_logits, ref_logits, atol=1e-2, rtol=1e-3)


def test_full_snapshot_pickle_roundtrip(ref_modules, tmp_path):
    """A REAL persistence-style snapshot pickle (live reference modules with
    embedded source) read back WITHOUT executing embedded code, converted,
    and verified to reproduce reference outputs."""
    install()
    import pickle
    import torch
    RefG, RefD = ref_modules
    snap = dict(G=RefG, D=RefD, G_ema=RefG,
                training_set_kwargs={"path": "x.zip"}, cur_nimg=1234)
    p = str(tmp_path / "network-snapshot-000001.pkl")
    with open(p, "wb") as f:
        pickle.dump(snap, f)

    from stylegan_v_tpu.io.legacy import import_reference_snapshot
    gcfg, dcfg = my_cfgs()
    out = import_reference_snapshot(p, epilogue_channels=64)
    assert out["G_ema"] is not None and out["D"] is not None

    myG = Generator(gcfg)
    B, F = 1, 3
    rng = np.random.RandomState(5)
    z = rng.randn(B, 64).astype(np.float32)
    t = np.array([[0.0, 4.0, 11.0]], np.float32)
    from stylegan_v_tpu.models.motion import MotionMappingNetwork
    L = MotionMappingNetwork.required_traj_len(gcfg, float(t.max()))
    mz = rng.randn(B, L, 32).astype(np.float32)
    with torch.no_grad():
        want = RefG(torch.from_numpy(z), torch.zeros(B, 0), torch.from_numpy(t),
                    motion_z=torch.from_numpy(mz), noise_mode="none").numpy()
    got = np.asarray(myG.apply(out["G_ema"], jnp.asarray(z), None, jnp.asarray(t),
                               motion_z=jnp.asarray(mz), noise_mode="none"))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-2, atol=5e-3)


def test_generate_from_reference_pkl_end_to_end(ref_modules, tmp_path):
    """The BASELINE config-#1 flow: a reference snapshot pkl -> generate.py's
    loader -> video synthesis, with config auto-inferred from the pickle's
    init-args capture."""
    install()
    import pickle
    import sys
    RefG, _ = ref_modules
    p = str(tmp_path / "network-snapshot-000002.pkl")
    with open(p, "wb") as f:
        pickle.dump(dict(G_ema=RefG), f)
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    from generate import load_any_checkpoint
    G, variables = load_any_checkpoint(p)
    assert G.cfg.img_resolution == 32
    assert G.cfg.motion.z_dim == 32
    from stylegan_v_tpu.training.video_io import generate_videos
    vids = generate_videos(G, variables, np.zeros((1, 64), np.float32), None,
                           np.arange(4, dtype=np.float32)[None],
                           noise_mode="none")
    assert vids.shape == (1, 4, 32, 32, 3)
    assert np.isfinite(vids).all()
