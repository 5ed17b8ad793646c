"""stylegan_v_tpu — a TPU-native (JAX/XLA/Pallas/pjit) continuous-time video GAN framework.

A from-scratch rebuild of the capabilities of the StyleGAN-V reference
(universome/stylegan-v): a StyleGAN2 image generator conditioned on continuous
timestamps through a motion-trajectory encoder with acyclic sine positional
embeddings, trained adversarially against a sparse-frame video discriminator.

Design notes (TPU-first, not a port):
  * All image tensors are NHWC (TPU-native layout); conv weights are HWIO.
  * The reference's CUDA extensions (upfirdn2d.cu, bias_act.cu) are replaced by
    XLA-fusible `lax` compositions and Pallas kernels in `ops/`.
  * Arbitrary-order gradients (R1 / path-length penalties) use `jax.grad`
    natively — no *_gradfix shims are needed.
  * Data parallelism is a sharded `jit` program over a `jax.sharding.Mesh`,
    not per-process DDP; in-step collectives ride ICI.
"""

__version__ = "0.1.0"
