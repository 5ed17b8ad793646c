"""MoCoGAN baseline discriminator tests: shapes, video-logit loss path,
LSTM motion strategy, and per-branch optimizer lr scaling."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stylegan_v_tpu.models import Generator
from stylegan_v_tpu.models.mocogan import MoCoGANDiscriminator, MoCoGANVideoDiscriminator
from stylegan_v_tpu.training import (
    LossConfig, OptimizerConfig, TrainingConfig, init_train_state, make_train_step,
)
from test_models import small_disc_cfg, small_gen_cfg
from test_train_step import make_batch


def test_video_discriminator_shapes():
    vd = MoCoGANVideoDiscriminator(n_channels=3, image_size=64, use_noise=False)
    x = jnp.zeros((2, 16, 64, 64, 3))
    params = vd.init(jax.random.PRNGKey(0), x)
    out = vd.apply(params, x)
    # 16 frames, 4 convs with t-kernel 4 stride 1 no pad: 16-3*3=7... -> [B,t',h',w']
    assert out.shape[0] == 2
    assert bool(jnp.isfinite(out).all())


def test_mocogan_discriminator_outputs():
    dcfg = small_disc_cfg(**{"img_resolution": 64})
    D = MoCoGANDiscriminator(dcfg, video_discr_num_t_paddings=6)
    # per-frame batch B*F must divide the image-D mbstd group (4), like the
    # reference which asserts the same via torch reshape.
    B, F = 4, 3
    img = jax.random.normal(jax.random.PRNGKey(0), (B * F, 64, 64, 3))
    t = jnp.asarray([[0.0, 1.0, 2.0], [0.0, 2.0, 4.0],
                     [1.0, 3.0, 5.0], [0.0, 4.0, 8.0]])
    params = D.init({"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
                    img, None, t)
    out = D.apply(params, img, None, t, rngs={"noise": jax.random.PRNGKey(3)})
    assert out["image_logits"].shape == (B * F,)   # per-frame logits
    assert out["video_logits"].shape[0] == B
    assert "video_discr" in params["params"]
    assert D.lr_scale_map == {"video_discr": 0.1}


def test_mocogan_training_step_with_video_logits():
    G = Generator(small_gen_cfg(**{"img_resolution": 64}))
    D = MoCoGANDiscriminator(small_disc_cfg(**{"img_resolution": 64}),
                             video_discr_num_t_paddings=6)
    tcfg = TrainingConfig(batch_size=4)
    state = init_train_state(jax.random.PRNGKey(0), G, D, OptimizerConfig(),
                             OptimizerConfig(), tcfg,
                             d_lr_scales=D.lr_scale_map)
    step = make_train_step(G, D, LossConfig(r1_gamma=1.0), OptimizerConfig(),
                           OptimizerConfig(), tcfg, donate=False,
                           d_lr_scales=D.lr_scale_map)
    batch = make_batch(0, B=4, F=3, res=64)
    new_state, stats = step(state, batch, jax.random.PRNGKey(1))
    assert "Loss/G/loss_video" in stats
    assert "Loss/scores/fake_video" in stats
    assert np.isfinite(float(stats["Loss/G/loss_video"]))
    # both branches' params updated
    for branch in ("image_discr", "video_discr"):
        d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                                   state.params_D[branch],
                                   new_state.params_D[branch])
        assert max(jax.tree_util.tree_leaves(d)) > 0, branch


def test_lstm_motion_strategy():
    """The MoCoGAN generator uses the autoregressive (LSTM) motion strategy
    with non-fourier mapping (reference configs/model/mocogan.yaml)."""
    cfg = small_gen_cfg(**{"motion.gen_strategy": "autoregressive",
                           "motion.fourier": False,
                           "motion.motion_z_distance": 1,
                           "input_type": "const",
                           "time_enc.cond_type": "concat_w"})
    G = Generator(cfg)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, cfg.z_dim))
    t = jnp.asarray([[0.0, 1.0, 2.0], [0.0, 2.0, 4.0]])
    params = G.init({"params": jax.random.PRNGKey(1), "motion": jax.random.PRNGKey(2)},
                    z, None, t)
    img = G.apply(params, z, None, t, rngs={"motion": jax.random.PRNGKey(3)})
    assert img.shape == (6, 32, 32, 3)
    assert bool(jnp.isfinite(img).all())
    # LSTM params exist
    assert "rnn" in params["params"]["synthesis"]["motion_encoder"]


def test_multiscale_video_discriminator():
    """Parity-surface check for the (reference-unused) multiscale patch D
    (reference mocogan.py:100-224)."""
    from stylegan_v_tpu.models.mocogan import VideoDiscriminator
    D = VideoDiscriminator(num_input_channels=3, num_sub_discrs=2, n_layers=3)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 64, 64, 3),
                    jnp.float32)
    variables = D.init(jax.random.PRNGKey(0), x)
    out = D.apply(variables, x)
    assert len(out) == 2                        # one result per scale
    for feats in out:
        assert len(feats) == 3 + 2              # n_layers + stride-1 + head
        assert feats[-1].shape[-1] == 1         # patch logits
        for f in feats:
            assert np.isfinite(np.asarray(f)).all()
    # coarser scale sees pooled input -> smaller patch map
    assert out[1][-1].shape[1:4] < out[0][-1].shape[1:4]

    D2 = VideoDiscriminator(num_input_channels=3, num_sub_discrs=2,
                            get_intermediate_feat=False)
    v2 = D2.init(jax.random.PRNGKey(1), x)
    out2 = D2.apply(v2, x)
    assert len(out2) == 2 and all(o.shape[-1] == 1 for o in out2)


def test_video_discr_rejects_collapsed_time_axis():
    """3 sparse frames with num_t_paddings=0 collapse T to 0 in the Conv3d
    ladder -> must be a trace-time error, not silent NaN logits."""
    D = MoCoGANDiscriminator(small_disc_cfg(**{"img_resolution": 64}),
                             video_discr_num_t_paddings=0)
    img = jnp.zeros((4 * 3, 64, 64, 3))
    t = jnp.tile(jnp.arange(3.0)[None], (4, 1))
    with pytest.raises(AssertionError, match="time axis|num_t_paddings"):
        D.init({"params": jax.random.PRNGKey(0),
                "noise": jax.random.PRNGKey(1)}, img, None, t)
