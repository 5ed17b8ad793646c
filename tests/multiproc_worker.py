"""Worker for the 2-process x 4-device multihost CPU test (launched by
tests/test_multiprocess.py — NOT a pytest module).

Exercises every multi-host code path on a jax.distributed local cluster (the
JAX analog of the reference's file://-rendezvous multi-process simulation,
reference train.py:359-366):
  * global-mesh batch assembly (make_array_from_process_local_data) + psum;
  * cross-host replica hash check;
  * replica-sharded metric feature extraction with cross-process merge;
  * metric result broadcast (every process must print identical numbers).

Prints ONE JSON line with the results; the parent compares across processes.
"""
import json
import os
import sys


def main():
    port, pid, nproc, ds_path = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    os.environ["SGV_STUB_DETECTORS"] = "1"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.local_devices()) == 4

    import numpy as np
    import jax.numpy as jnp
    out = {"pid": pid, "n_devices": len(jax.devices())}

    # ---- global mesh + per-host batch assembly + implicit psum ----------
    from stylegan_v_tpu.parallel import create_mesh, shard_batch
    mesh = create_mesh(frame=1)                       # 8 global devices
    local = {"x": np.arange(8, dtype=np.float32)[:, None] + 100 * pid}
    batch = shard_batch(mesh, local)                  # global [16, 1]
    assert batch["x"].shape == (16, 1)
    total = jax.jit(lambda b: jnp.sum(b["x"]))(batch)
    out["batch_sum"] = float(total)                   # must agree everywhere

    # ---- replica consistency hash check ----------------------------------
    from stylegan_v_tpu.utils.summary import check_replica_consistency
    tree = {"w": np.full((3, 3), 7.0, np.float32)}
    out["consistency_ok"] = bool(check_replica_consistency(tree))

    # ---- replica-sharded dataset stats + cross-process merge -------------
    from stylegan_v_tpu.metrics.metric_utils import (
        MetricOptions, compute_feature_stats_for_dataset)
    from stylegan_v_tpu.models.config import SamplingConfig
    sampling = SamplingConfig(num_frames_per_video=2, max_num_frames=16,
                              total_dists=(1, 2), max_dist=4)
    dkw = dict(path=ds_path, sampling=sampling, max_num_frames=16,
               load_n_consecutive=4, discard_short_videos=True)
    stats = compute_feature_stats_for_dataset(
        MetricOptions(dataset_kwargs=dkw, cache=False,
                      num_replicas=nproc, replica=pid, rank=pid),
        "i3d", {}, capture_mean_cov=True, capture_all=True, max_items=6,
        temporal_detector=True, batch_size=2)
    out["stats_num_items"] = stats.num_items          # merged: full dataset
    mu, cov = stats.get_mean_cov()
    out["stats_mu_head"] = [round(float(v), 12) for v in mu[:4]]
    out["stats_all_shape"] = list(stats.get_all().shape)

    # zero-share replica: max_items=1 with 2 processes leaves rank 1 with
    # no items; the cross-process merge must still converge on every rank
    # (feature dim learned from peers) instead of assert-crash + peer hang
    stats1 = compute_feature_stats_for_dataset(
        MetricOptions(dataset_kwargs=dkw, cache=False,
                      num_replicas=nproc, replica=pid, rank=pid),
        "i3d", {}, capture_mean_cov=True, max_items=1,
        temporal_detector=True, batch_size=2)
    out["stats1_num_items"] = stats1.num_items
    out["stats1_mu0"] = round(float(stats1.get_mean_cov()[0][0]), 12)

    # ---- full metric with result broadcast --------------------------------
    from stylegan_v_tpu.metrics import metric_main
    r = metric_main.calc_metric(
        metric="fvd2048_16f",
        dataset_kwargs=dict(path=ds_path, sampling=sampling, max_num_frames=16),
        gen_dataset_kwargs=dict(path=ds_path, sampling=sampling,
                                max_num_frames=16),
        generator_as_dataset=True, cache=False)
    out["fvd"] = float(r["results"]["fvd2048_16f"])

    # ---- mesh + multi-process: calc_metric must restrict the GLOBAL mesh
    # to this process's local devices (device_put of per-replica batches on
    # a spanning mesh would touch non-addressable devices), and the replica
    # merge must still produce identical numbers everywhere.
    r2 = metric_main.calc_metric(
        metric="fvd2048_16f",
        dataset_kwargs=dict(path=ds_path, sampling=sampling, max_num_frames=16),
        gen_dataset_kwargs=dict(path=ds_path, sampling=sampling,
                                max_num_frames=16),
        generator_as_dataset=True, cache=False, mesh=mesh)
    out["fvd_mesh"] = float(r2["results"]["fvd2048_16f"])

    print("RESULT " + json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
