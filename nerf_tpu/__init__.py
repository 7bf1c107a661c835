"""nerf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) NeRF framework.

Re-implements the full capability surface of the reference PyTorch repo
(Enigmatisms/NeRF: NeRF / Mip-NeRF / Mip-NeRF-360 proposal distillation /
Ref-NeRF, single-device + DDP + model-averaging training) as a functional,
jit-compiled, mesh-sharded JAX framework.

Layering (bottom up):
  core/      pure math: rays, encodings, sampling, volume rendering
  ops/       Pallas TPU kernels for the hot path (+ XLA reference impls)
  models/    flax.linen modules: ProposalNetwork, VanillaNeRF, RefNeRF
  train/     losses, LR schedule, jitted train step, trainer loop
  parallel/  device-mesh data parallelism + periodic model averaging
  data/      Blender-synthetic loader, procedural scene generator, samplers
  utils/     checkpointing, metrics, timers, image IO, debug tools
"""

__version__ = "0.1.0"
