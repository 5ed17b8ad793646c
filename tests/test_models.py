"""Model-layer tests: shapes, time-encoder golden math, motion-code properties.

Uses a small config (32x32, reduced dims) so CPU tests stay fast; the math is
resolution-independent.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stylegan_v_tpu.models import (
    Discriminator, DiscriminatorConfig, Generator, GeneratorConfig,
    MotionConfig, MotionMappingNetwork, SamplingConfig, TimeEncConfig,
)
from stylegan_v_tpu.models.config import replace
from stylegan_v_tpu.models.layers import (
    FullyConnectedLayer, MappingNetwork, construct_log_spaced_freqs,
    normalize_2nd_moment,
)
from stylegan_v_tpu.models.motion import construct_linspaced_frequencies


def small_gen_cfg(**kw):
    cfg = GeneratorConfig(
        w_dim=64, z_dim=64, img_resolution=32, channel_base=1024, channel_max=64,
        num_bf16_res=0, mapping_layers=2,
        motion=MotionConfig(z_dim=32, v_dim=32, motion_z_distance=16, kernel_size=11),
        time_enc=TimeEncConfig(dim=32, min_period_len=16, max_period_len=1024),
        sampling=SamplingConfig(num_frames_per_video=3, max_num_frames=128),
    )
    return replace(cfg, **kw) if kw else cfg


def small_disc_cfg(**kw):
    cfg = DiscriminatorConfig(
        img_resolution=32, channel_base=1024, channel_max=64, num_bf16_res=0,
        concat_res=8, mbstd_group_size=2, mapping_layers=2,
        sampling=SamplingConfig(num_frames_per_video=3, max_num_frames=128),
    )
    return replace(cfg, **kw) if kw else cfg


def test_fully_connected_equalized_lr():
    """Effective weight scale must be lr_mult/sqrt(in) regardless of lr_mult."""
    fc = FullyConnectedLayer(256, 8, lr_multiplier=0.01)
    params = fc.init(jax.random.PRNGKey(0), jnp.zeros((1, 256)))
    w = params['params']['weight']
    # raw params stored at scale 1/lr_mult
    assert 80 < float(jnp.std(w)) < 120
    x = jax.random.normal(jax.random.PRNGKey(1), (512, 256))
    y = fc.apply(params, x)
    assert 0.5 < float(jnp.std(y)) < 2.0  # unit-ish output variance


def test_normalize_2nd_moment():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 64)) * 7
    y = normalize_2nd_moment(x)
    np.testing.assert_allclose(np.mean(np.asarray(y) ** 2, axis=1), 1.0, rtol=1e-3)


def test_mapping_network_broadcast_truncation_and_w_avg():
    m = MappingNetwork(z_dim=32, c_dim=0, w_dim=32, num_ws=5, num_layers=2)
    z = jax.random.normal(jax.random.PRNGKey(0), (4, 32))
    params = m.init(jax.random.PRNGKey(1), z, None)
    ws = m.apply(params, z, None)
    assert ws.shape == (4, 5, 32)
    # w_avg updates under mutable
    ws2, mut = m.apply(params, z, None, update_w_avg=True, mutable=['moving'])
    assert float(jnp.abs(mut['moving']['w_avg']).sum()) > 0
    # truncation_psi=0 collapses to w_avg
    p2 = {'params': params['params'], 'moving': mut['moving']}
    ws3 = m.apply(p2, z, None, truncation_psi=0.0)
    np.testing.assert_allclose(np.asarray(ws3[0, 0]), np.asarray(mut['moving']['w_avg']),
                               rtol=1e-5)


def test_log_spaced_freqs_golden():
    """Golden check of construct_log_spaced_freqs math (reference layers.py:439-446)."""
    f = construct_log_spaced_freqs(256)
    # time_resolution = 256, num_feats = 8, coefs = 2^k * pi / 256
    assert f.shape == (1, 8)
    np.testing.assert_allclose(f[0], (2.0 ** np.arange(8)) * np.pi / 256, rtol=1e-6)
    f2 = construct_log_spaced_freqs(300)  # next pow2 = 512 -> 9 feats
    assert f2.shape == (1, 9)


def test_linspaced_freqs_golden():
    """Golden check (reference motion.py:218-222): descending-period order."""
    f = construct_linspaced_frequencies(4, 16, 1024)
    want = 2 * np.pi / (2 ** np.linspace(4, 10, 4))
    np.testing.assert_allclose(f[0], want[::-1], rtol=1e-6)


def test_motion_network_shapes_and_determinism():
    cfg = small_gen_cfg()
    enc = MotionMappingNetwork(cfg)
    B, F = 2, 3
    t = jnp.asarray([[0.0, 5.0, 17.0], [1.5, 80.0, 127.0]])
    mz = enc.sample_motion_z(jax.random.PRNGKey(0), B)
    L = MotionMappingNetwork.required_traj_len(cfg)
    assert mz.shape == (B, L, cfg.motion.z_dim)
    params = enc.init(jax.random.PRNGKey(1), None, t, motion_z=mz)
    out = enc.apply(params, None, t, motion_z=mz)
    assert out['motion_v'].shape == (B * F, enc.get_dim())
    assert enc.get_dim() == cfg.time_enc.dim * 2
    # Same motion_z => same codes (temporal coherence across chunked generation)
    out2 = enc.apply(params, None, t, motion_z=mz)
    np.testing.assert_allclose(np.asarray(out['motion_v']), np.asarray(out2['motion_v']))


def test_motion_codes_continuous_at_lattice_points():
    """v(t) must be continuous across a lattice boundary (acyclic alignment)."""
    cfg = small_gen_cfg()
    enc = MotionMappingNetwork(cfg)
    eps = 1e-3
    d = float(cfg.motion.motion_z_distance)
    t = jnp.asarray([[d - eps, d + eps, d]])
    mz = enc.sample_motion_z(jax.random.PRNGKey(0), 1)
    params = enc.init(jax.random.PRNGKey(1), None, t, motion_z=mz)
    v = np.asarray(enc.apply(params, None, t, motion_z=mz)['motion_v'])
    gap = np.abs(v[0] - v[1]).max()
    assert gap < 0.05, f"motion code discontinuity at lattice point: {gap}"
    # and t exactly at the lattice point sits between the two
    assert np.abs(v[2] - v[0]).max() < 0.05


def test_generator_forward_shapes():
    cfg = small_gen_cfg()
    G = Generator(cfg)
    B, F = 2, 3
    z = jax.random.normal(jax.random.PRNGKey(0), (B, cfg.z_dim))
    t = jnp.asarray([[0.0, 3.0, 9.0], [2.0, 4.0, 30.0]])
    params = G.init({'params': jax.random.PRNGKey(1), 'motion': jax.random.PRNGKey(2)},
                    z, None, t)
    img = G.apply(params, z, None, t,
                  rngs={'motion': jax.random.PRNGKey(3)})
    assert img.shape == (B * F, 32, 32, 3)
    assert img.dtype == jnp.float32
    assert bool(jnp.isfinite(img).all())


def test_generator_num_ws_matches_param_tree():
    cfg = small_gen_cfg()
    G = Generator(cfg)
    # 32x32 ladder: blocks 4,8,16,32 -> num_conv 1+2+2+2=7, final torgb +1... but
    # skip arch adds torgb per block; num_ws counts conv ws + final torgb only
    # (reference networks.py:301-321).
    assert G.num_ws == 8


def test_generator_const_input_no_motion():
    cfg = small_gen_cfg(**{'motion.v_dim': 0, 'input_type': 'const'})
    G = Generator(cfg)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, cfg.z_dim))
    t = jnp.zeros((2, 1))
    params = G.init(jax.random.PRNGKey(1), z, None, t)
    img = G.apply(params, z, None, t)
    assert img.shape == (2, 32, 32, 3)


def test_discriminator_forward_and_frame_fusion():
    dcfg = small_disc_cfg()
    D = Discriminator(dcfg)
    B, F = 2, 3
    img = jax.random.normal(jax.random.PRNGKey(0), (B * F, 32, 32, 3))
    t = jnp.asarray([[0.0, 2.0, 7.0], [1.0, 5.0, 6.0]])
    params = D.init(jax.random.PRNGKey(1), img, None, t)
    out = D.apply(params, img, None, t)
    assert out['image_logits'].shape == (B,)  # per-VIDEO logits after fusion
    assert bool(jnp.isfinite(out['image_logits']).all())


def test_discriminator_time_deltas_not_absolute():
    """D conditions on pairwise deltas: shifting all timestamps by a constant
    must not change logits (reference layers.py:277-297 uses differences)."""
    dcfg = small_disc_cfg()
    D = Discriminator(dcfg)
    img = jax.random.normal(jax.random.PRNGKey(0), (3, 32, 32, 3))
    t = jnp.asarray([[0.0, 2.0, 7.0]])
    params = D.init(jax.random.PRNGKey(1), img, None, t)
    a = D.apply(params, img, None, t)['image_logits']
    b = D.apply(params, img, None, t + 40.0)['image_logits']
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_single_frame_discriminator():
    dcfg = small_disc_cfg(**{'sampling.num_frames_per_video': 1})
    D = Discriminator(dcfg)
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    t = jnp.zeros((2, 1))
    params = D.init(jax.random.PRNGKey(1), img, None, t)
    out = D.apply(params, img, None, t)
    assert out['image_logits'].shape == (2,)


def test_generator_jit_and_grad():
    cfg = small_gen_cfg()
    G = Generator(cfg)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, cfg.z_dim))
    t = jnp.asarray([[0.0, 1.0, 2.0], [0.0, 4.0, 8.0]])
    params = G.init({'params': jax.random.PRNGKey(1), 'motion': jax.random.PRNGKey(2)},
                    z, None, t)

    @jax.jit
    def loss(p, z):
        img = G.apply(p, z, None, t, rngs={'motion': jax.random.PRNGKey(3)})
        return jnp.mean(img ** 2)

    g = jax.grad(loss)(params, z)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    # every parameter receives gradient somewhere (no dead branches)
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0


def test_freeze_d_blocks_gradients():
    """Freeze-D: the first freeze_layers D layers receive zero gradient
    (reference train.py:319-324 via per-layer trainable flags)."""
    from stylegan_v_tpu.models.config import replace as cfg_replace
    dcfg = small_disc_cfg(freeze_layers=2)
    D = Discriminator(dcfg)
    B, F = 2, 3
    img = jax.random.normal(jax.random.PRNGKey(0), (B * F, 32, 32, 3))
    t = jnp.zeros((B, F)) + jnp.arange(F)[None]
    params = D.init(jax.random.PRNGKey(1), img, None, t)["params"]

    g = jax.grad(lambda p: jnp.sum(
        D.apply({"params": p}, img, None, t)["image_logits"]))(params)
    # first block's fromrgb (layer 0) and conv0 (layer 1) frozen
    assert float(jnp.abs(g["b32"]["fromrgb"]["weight"]).max()) == 0.0
    assert float(jnp.abs(g["b32"]["conv0"]["weight"]).max()) == 0.0
    # conv1 (layer 2) trainable
    assert float(jnp.abs(g["b32"]["conv1"]["weight"]).max()) > 0.0


def test_uniform_sampling_discriminator_dims():
    """Uniform frame sampling collapses the time-delta encoding to ONE delta
    (reference layers.py:272-287)."""
    from stylegan_v_tpu.models.layers import TemporalDifferenceEncoder
    uni = SamplingConfig(type="uniform", num_frames_per_video=3, max_num_frames=64)
    enc = TemporalDifferenceEncoder(uni)
    rnd = SamplingConfig(type="random", num_frames_per_video=3, max_num_frames=64)
    enc_r = TemporalDifferenceEncoder(rnd)
    fdim = 2 * int(np.ceil(np.log2(64)))
    assert enc.get_dim() == 256 + fdim
    assert enc_r.get_dim() == (256 + fdim) * 2
    t = jnp.asarray([[0.0, 4.0, 8.0]])
    p = enc.init(jax.random.PRNGKey(0), t)
    out = enc.apply(p, t)
    assert out.shape == (1, enc.get_dim())
    # equal-spacing invariance: only the first delta matters for uniform
    out2 = enc.apply(p, jnp.asarray([[10.0, 14.0, 18.0]]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_activation_summary_rows():
    """Per-module output shapes from an abstract dummy forward (the
    reference's print_module_summary pass, misc.py:193-272): no compute,
    real shapes for every submodule."""
    import jax
    import jax.numpy as jnp
    from stylegan_v_tpu.models import Generator
    from stylegan_v_tpu.utils.summary import activation_summary_rows

    cfg = small_gen_cfg(img_resolution=16, channel_base=512)
    G = Generator(cfg)
    z = jnp.zeros((1, cfg.z_dim))
    t = jnp.zeros((1, 2))
    rngs = {"params": jax.random.PRNGKey(0), "motion": jax.random.PRNGKey(1)}
    variables = jax.eval_shape(
        lambda: G.init(rngs, z, None, t, noise_mode="const"))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables)
    rows = activation_summary_rows(
        G, variables, z, None, t, noise_mode="const",
        rngs={"motion": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)})
    assert len(rows) > 5
    names = [r["name"] for r in rows]
    assert any("synthesis" in n for n in names)
    # the root output is the full video batch [T, H, W, C]-shaped
    assert any(r["shape"][-3:] == (16, 16, 3) for r in rows if r["shape"])
