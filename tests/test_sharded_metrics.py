"""Sharded / replica-correct metric pipeline (reference
metric_utils.py:103-113,230 + metric_main.py:52-59 semantics on the TPU mesh).

Covers:
  * round-robin replica striping merges to EXACTLY the serial stats
    (captured features bit-identical in dataset order; float64 moments to
    summation-order precision);
  * mesh-sharded flax detector extraction == single-device extraction,
    including ragged batches (padding path);
  * the fused G->detector jit program over the mesh reproduces the host
    (unsharded) generator feature stats.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan_v_tpu.metrics import FeatureStats, MetricOptions, register_detector
from stylegan_v_tpu.metrics.metric_utils import (
    compute_feature_stats_for_dataset, compute_feature_stats_for_generator,
)
from stylegan_v_tpu.parallel import create_mesh
from test_data import build_video_dataset_dir, SAMPLING
from test_metrics import dataset_kwargs   # noqa: F401 (helper)


@pytest.fixture(scope="module")
def ds_path(tmp_path_factory):
    return build_video_dataset_dir(str(tmp_path_factory.mktemp("sm")),
                                   num_videos=6, frames_per_video=20, res=16)


def _jittable_video_detector(**kwargs):
    """A tiny jnp video detector exposing the `.jittable` contract that the
    flax I3D/Inception feature fns provide."""
    def compute(videos):                       # uint8 [N, T, H, W, C]
        x = videos.astype(jnp.float32) / 255.0
        return jnp.concatenate([x.mean(axis=(1, 2, 3)), x.std(axis=(1, 2, 3))],
                               axis=1)

    def features(videos):
        return np.asarray(jax.jit(compute)(jnp.asarray(videos)))

    features.jittable = compute
    return features


register_detector("jit_vid", _jittable_video_detector)


def test_replica_striping_merges_to_serial(ds_path):
    """num_replicas=4 partial stats merge to the serial stats: captured
    features identical in dataset order, num_items exact, moments equal to
    float64 summation-order precision (6 items over 4 replicas = ragged)."""
    dkw = dict(dataset_kwargs(ds_path), load_n_consecutive=4,
               discard_short_videos=True)
    kw = dict(detector_name="stub_vid", detector_kwargs={},
              capture_mean_cov=True, capture_all=True, max_items=6,
              temporal_detector=True, batch_size=2)
    serial = compute_feature_stats_for_dataset(
        MetricOptions(dataset_kwargs=dkw, cache=False), **kw)

    R = 4
    parts = [compute_feature_stats_for_dataset(
        MetricOptions(dataset_kwargs=dkw, cache=False,
                      num_replicas=R, replica=r), **kw) for r in range(R)]
    assert [p.num_items for p in parts] == [2, 2, 1, 1]
    merged = FeatureStats.merge(parts)

    assert merged.num_items == serial.num_items == 6
    np.testing.assert_array_equal(merged.get_all(), serial.get_all())
    mu_s, cov_s = serial.get_mean_cov()
    mu_m, cov_m = merged.get_mean_cov()
    np.testing.assert_allclose(mu_m, mu_s, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(cov_m, cov_s, rtol=1e-10, atol=1e-14)


def test_replica_cache_never_poisons_serial(ds_path, tmp_path):
    """A single-process num_replicas=4, replica=2, cache=True run writes its
    PARTIAL stats under a replica-tagged key; a later serial cache=True run
    must compute (and then reload) the FULL stats, not silently load the
    partial ones (VERDICT r2 weak #4; reference caches only full
    all-ranks-accumulated stats, metric_utils.py:200-219)."""
    dkw = dict(dataset_kwargs(ds_path), load_n_consecutive=4,
               discard_short_videos=True)
    kw = dict(detector_name="stub_vid", detector_kwargs={},
              capture_mean_cov=True, max_items=6,
              temporal_detector=True, batch_size=2)
    cache_dir = str(tmp_path / "stats-cache")

    partial = compute_feature_stats_for_dataset(
        MetricOptions(dataset_kwargs=dkw, cache=True, cache_dir=cache_dir,
                      num_replicas=4, replica=2), **kw)
    assert partial.num_items == 1

    serial = compute_feature_stats_for_dataset(
        MetricOptions(dataset_kwargs=dkw, cache=True, cache_dir=cache_dir),
        **kw)
    assert serial.num_items == 6

    # both entries coexist; reloads hit the right one
    partial2 = compute_feature_stats_for_dataset(
        MetricOptions(dataset_kwargs=dkw, cache=True, cache_dir=cache_dir,
                      num_replicas=4, replica=2), **kw)
    serial2 = compute_feature_stats_for_dataset(
        MetricOptions(dataset_kwargs=dkw, cache=True, cache_dir=cache_dir),
        **kw)
    assert partial2.num_items == 1 and serial2.num_items == 6
    np.testing.assert_array_equal(serial2.raw_mean, serial.raw_mean)


def test_threaded_item_iteration_preserves_order(ds_path):
    """The threaded metric decode pipeline must yield items in exactly the
    requested order (FeatureStats truncation + capture_all depend on it)."""
    from stylegan_v_tpu.metrics.metric_utils import (
        _iter_items_threaded, _make_dataset)
    dkw = dict(dataset_kwargs(ds_path), load_n_consecutive=4,
               discard_short_videos=True)
    ds = _make_dataset(dkw, use_image_dataset=False)
    indices = [3, 0, 5, 1, 1, 4, 2, 0]
    serial = [ds[i]["image"] for i in indices]
    threaded = [it["image"]
                for it in _iter_items_threaded(ds, indices, num_workers=4,
                                               prefetch=3)]
    assert len(threaded) == len(serial)
    for a, b in zip(threaded, serial):
        np.testing.assert_array_equal(a, b)
    ds.close()


def test_generator_replica_quotas_sum_to_num_gen(ds_path):
    from stylegan_v_tpu.models import Generator
    from test_models import small_gen_cfg
    cfg = small_gen_cfg(**{"img_resolution": 16, "channel_base": 512})
    G = Generator(cfg)
    z = jnp.zeros((1, cfg.z_dim))
    t = jnp.zeros((1, 2))
    variables = jax.jit(lambda r, z, t: G.init(r, z, None, t, noise_mode="none"))(
        {"params": jax.random.PRNGKey(0), "motion": jax.random.PRNGKey(1)}, z, t)

    parts = [compute_feature_stats_for_generator(
        MetricOptions(G=G, G_variables=variables, cache=False,
                      dataset_kwargs=dataset_kwargs(ds_path),
                      num_replicas=2, replica=r),
        "stub_vid", {}, capture_mean_cov=True, max_items=10,
        num_video_frames=2, temporal_detector=True, batch_size=4)
        for r in range(2)]
    assert [p.num_items for p in parts] == [5, 5]
    merged = FeatureStats.merge(parts)
    assert merged.num_items == 10
    mu, cov = merged.get_mean_cov()
    assert np.isfinite(mu).all() and np.isfinite(cov).all()
    # replicas must draw DIFFERENT latents (per-replica RNG streams)
    assert not np.allclose(parts[0].get_mean_cov()[0], parts[1].get_mean_cov()[0])


def test_mesh_sharded_i3d_matches_host():
    """Flax I3D extraction sharded over the 8-device mesh == single-device,
    with N=5 exercising the pad-to-data-axis path."""
    from stylegan_v_tpu.metrics.detectors_flax import i3d_features_fn
    from stylegan_v_tpu.metrics.detectors_flax.i3d import InceptionI3d
    model = InceptionI3d()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4, 224, 224, 3)))
    rng = np.random.RandomState(0)
    videos = rng.randint(0, 255, (5, 4, 64, 64, 3)).astype(np.uint8)

    host = i3d_features_fn(variables, batch_size=16)(videos)
    mesh = create_mesh(frame=1)
    sharded = i3d_features_fn(variables, batch_size=16, mesh=mesh)(videos)
    assert sharded.shape == host.shape == (5, 1024)
    np.testing.assert_allclose(sharded, host, rtol=1e-4, atol=1e-5)


def test_mesh_sharded_inception_matches_host():
    from stylegan_v_tpu.metrics.detectors_flax.inception_v3 import (
        InceptionV3, inception_features_fn)
    model = InceptionV3()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    rng = np.random.RandomState(1)
    images = rng.randint(0, 255, (5, 32, 32, 3)).astype(np.uint8)

    host = inception_features_fn(variables, batch_size=8,
                                 return_features=True)(images)
    mesh = create_mesh(frame=1)
    sharded = inception_features_fn(variables, batch_size=8, mesh=mesh,
                                    return_features=True)(images)
    assert sharded.shape == host.shape == (5, 2048)
    np.testing.assert_allclose(sharded, host, rtol=1e-4, atol=1e-5)


def test_fused_generator_detector_on_mesh_matches_host(ds_path):
    """ONE jitted z->G->uint8->detector program sharded over the mesh must
    reproduce the unsharded generator feature stats (same RNG stream)."""
    from stylegan_v_tpu.models import Generator
    from test_models import small_gen_cfg
    cfg = small_gen_cfg(**{"img_resolution": 16, "channel_base": 512})
    G = Generator(cfg)
    z = jnp.zeros((1, cfg.z_dim))
    t = jnp.zeros((1, 2))
    variables = jax.jit(lambda r, z, t: G.init(r, z, None, t, noise_mode="none"))(
        {"params": jax.random.PRNGKey(0), "motion": jax.random.PRNGKey(1)}, z, t)

    kw = dict(detector_name="jit_vid", detector_kwargs={},
              capture_mean_cov=True, capture_all=True, max_items=16,
              num_video_frames=2, temporal_detector=True,
              batch_size=16)                     # batch_videos = 8 both paths
    host = compute_feature_stats_for_generator(
        MetricOptions(G=G, G_variables=variables, cache=False,
                      dataset_kwargs=dataset_kwargs(ds_path)), **kw)
    mesh = create_mesh(frame=1)
    sharded = compute_feature_stats_for_generator(
        MetricOptions(G=G, G_variables=variables, cache=False,
                      dataset_kwargs=dataset_kwargs(ds_path), mesh=mesh), **kw)

    assert host.num_items == sharded.num_items == 16
    np.testing.assert_allclose(sharded.get_all(), host.get_all(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(sharded.get_mean_cov()[0], host.get_mean_cov()[0],
                               rtol=1e-5, atol=1e-6)


def test_frame_sharded_128f_generator_stats_match_1d(ds_path):
    """Long-clip (128-frame) generator feature extraction on a 2-D
    data x frame mesh must produce the same features as the 1-D data mesh:
    the frame axis is the context-parallel analog (SURVEY §5.7), wired into
    compute_feature_stats_for_generator for fvd2048_128f-class extraction
    (VERDICT r3 task 6 done-criterion)."""
    from stylegan_v_tpu.models import Generator
    from test_models import small_gen_cfg
    cfg = small_gen_cfg(**{"img_resolution": 16, "channel_base": 512})
    G = Generator(cfg)
    z = jnp.zeros((1, cfg.z_dim))
    t = jnp.zeros((1, 2))
    variables = jax.jit(lambda r, z, t: G.init(r, z, None, t, noise_mode="none"))(
        {"params": jax.random.PRNGKey(0), "motion": jax.random.PRNGKey(1)}, z, t)

    # 128 consecutive frames per clip, 4 clips: the fvd2048_128f extraction
    # shape family (reference frechet_video_distance.py:14,29) at test scale
    kw = dict(detector_name="jit_vid", detector_kwargs={},
              capture_mean_cov=True, capture_all=True, max_items=4,
              num_video_frames=128, temporal_detector=True,
              batch_size=512)                    # batch_videos = 4 both paths
    flat = compute_feature_stats_for_generator(
        MetricOptions(G=G, G_variables=variables, cache=False,
                      dataset_kwargs=dataset_kwargs(ds_path),
                      mesh=create_mesh(frame=1)), **kw)
    mesh2 = create_mesh(frame=2)                 # 4 x 2 (data x frame)
    sharded = compute_feature_stats_for_generator(
        MetricOptions(G=G, G_variables=variables, cache=False,
                      dataset_kwargs=dataset_kwargs(ds_path), mesh=mesh2), **kw)

    assert flat.num_items == sharded.num_items == 4
    np.testing.assert_allclose(sharded.get_all(), flat.get_all(),
                               rtol=1e-4, atol=1e-5)

def test_no_fuse_two_program_matches_fused(ds_path, monkeypatch):
    """SGV_METRIC_NO_FUSE=1 swaps the fused z->G->detector program for two
    jitted programs with a device-resident handoff; stats must be identical
    (same RNG stream, same math — only the program boundary moves)."""
    from stylegan_v_tpu.models import Generator
    from test_models import small_gen_cfg
    cfg = small_gen_cfg(**{"img_resolution": 16, "channel_base": 512})
    G = Generator(cfg)
    z = jnp.zeros((1, cfg.z_dim))
    t = jnp.zeros((1, 2))
    variables = jax.jit(lambda r, z, t: G.init(r, z, None, t, noise_mode="none"))(
        {"params": jax.random.PRNGKey(0), "motion": jax.random.PRNGKey(1)}, z, t)

    kw = dict(detector_name="jit_vid", detector_kwargs={},
              capture_mean_cov=True, capture_all=True, max_items=16,
              num_video_frames=2, temporal_detector=True, batch_size=16)
    mesh = create_mesh(frame=1)
    opts = lambda: MetricOptions(G=G, G_variables=variables, cache=False,
                                 dataset_kwargs=dataset_kwargs(ds_path),
                                 mesh=mesh)
    fused = compute_feature_stats_for_generator(opts(), **kw)
    monkeypatch.setenv("SGV_METRIC_NO_FUSE", "1")
    two_prog = compute_feature_stats_for_generator(opts(), **kw)

    assert fused.num_items == two_prog.num_items == 16
    np.testing.assert_allclose(two_prog.get_all(), fused.get_all(),
                               rtol=1e-4, atol=1e-5)
