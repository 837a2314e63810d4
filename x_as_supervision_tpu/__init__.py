"""x_as_supervision_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the
X-as-Supervision unsupervised monocular 3D human pose estimation framework.

Re-designed TPU-first: single jitted GAN train step over a
``jax.sharding.Mesh``, cross-replica batch statistics via global-batch
reductions under GSPMD, Pallas kernels for the integral soft-argmax decode and
the differentiable skeleton line renderer, host-side C++-backed data pipeline.

Layout:
  ops/       pure-JAX geometry, losses, integral decode, line renderer
  models/    ResNet backbone, deconv head, detectors, GCN discriminators,
             physique net, SMPL body model
  parallel/  mesh construction + sharding helpers
  data/      dataset index builders + host input pipeline
  train/     trainer, eval harness, metrics, checkpointing, logging
  tools/     offline converters (SMPL pkl->npz, torch weights->npz, SURREAL)
"""

__version__ = "0.1.0"
