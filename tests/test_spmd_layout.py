"""SPMD layout regression: the 8-way train step must compile WITHOUT
"Involuntary full rematerialization".

Round 3's dryrun exposed the partitioner resolving the Dr1 second-order path
through the D frame-fusion/epilogue reshapes (reference topology
networks.py:659-662) by replicating the tensor on every Dr1 step. The fix is
`constrain_data_axis` pins at those reshapes (models/discriminator.py) traced
under the ambient abstract mesh (training/train_step.py). This test compiles
the Dr1 program over an 8-device mesh in a subprocess and greps the XLA
compile log (VERDICT r3 task 2 done-criterion).
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMPILE_SCRIPT = r"""
import os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from stylegan_v_tpu.models import (Discriminator, DiscriminatorConfig,
                                   Generator, GeneratorConfig, MotionConfig,
                                   SamplingConfig, TimeEncConfig)
from stylegan_v_tpu.parallel import create_mesh, shard_batch, zero1_state_sharding
from stylegan_v_tpu.training import (LossConfig, OptimizerConfig, TrainingConfig,
                                     init_train_state, make_train_step)

sampling = SamplingConfig(num_frames_per_video=3, max_num_frames=128)
gcfg = GeneratorConfig(
    w_dim=64, z_dim=64, img_resolution=32, channel_base=1024, channel_max=64,
    num_bf16_res=0, mapping_layers=2,
    motion=MotionConfig(z_dim=32, v_dim=32, motion_z_distance=16),
    time_enc=TimeEncConfig(dim=32), sampling=sampling)
dcfg = DiscriminatorConfig(
    img_resolution=32, channel_base=1024, channel_max=64, num_bf16_res=0,
    concat_res=8, mbstd_group_size=2, mapping_layers=2, sampling=sampling)
G, D = Generator(gcfg), Discriminator(dcfg)
B = 8
tcfg = TrainingConfig(batch_size=B, ada_target=0.6, zero1=True)
state = init_train_state(jax.random.PRNGKey(0), G, D, OptimizerConfig(),
                         OptimizerConfig(), tcfg)
mesh = create_mesh(devices=jax.devices()[:8], frame=1)
state_sharding = zero1_state_sharding(mesh, state)
state = jax.device_put(state, state_sharding)
step = make_train_step(G, D, LossConfig(r1_gamma=1.0, pl_weight=0.0),
                       OptimizerConfig(), OptimizerConfig(), tcfg,
                       donate=False, state_sharding=state_sharding)
F = sampling.num_frames_per_video
rng = np.random.RandomState(0)
t = np.sort(rng.randint(0, 60, size=(B, F)).astype(np.float32), axis=1)
batch = shard_batch(mesh, {
    "real_img": rng.randint(0, 255, size=(B, F, 32, 32, 3)).astype(np.uint8),
    "real_c": np.zeros((B, 0), np.float32),
    "real_t": t,
    "gen_c": np.zeros((B, 3, 0), np.float32),
    "gen_t": np.stack([t, t + 1, t + 2], axis=1),
})
# compile (not run) the Dr1 variant — the remat warning is emitted by the
# SPMD partitioner during compilation
new_state, stats = step(state, batch, jax.random.PRNGKey(1), do_dr1=True)
jax.block_until_ready(new_state.params_D)
print("COMPILED_OK")
"""


def test_dr1_compiles_without_involuntary_remat():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run([sys.executable, "-c", COMPILE_SCRIPT], cwd=REPO,
                       capture_output=True, text=True, timeout=900, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "COMPILED_OK" in r.stdout
    assert "Involuntary full rematerialization" not in r.stderr, \
        "SPMD partitioner fell back to full remat:\n" + r.stderr[-3000:]
