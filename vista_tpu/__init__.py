"""vista_tpu: a TPU-native (JAX/XLA/Pallas) video-diffusion world-model framework.

Re-implements the capabilities of OpenDriveLab/Vista (NeurIPS 2024) — a driving
world model fine-tuned from Stable Video Diffusion — as an idiomatic
JAX/Flax/Pallas framework designed for TPU hardware:

- ``vista_tpu.diffusion``: pure-function EDM diffusion math (preconditioning,
  Karras discretizations, classifier-free guidance, Euler sampler as a
  ``lax.scan``, training losses with dynamics enhancement).
- ``vista_tpu.models``: Flax networks — the SVD-XT spatiotemporal VideoUNet
  with Vista's conditional time embedding, LoRA and action-control adapters,
  the image VAE with temporal video decoder, and the conditioner stack.
- ``vista_tpu.ops``: Pallas TPU kernels for the hot ops (flash attention).
- ``vista_tpu.parallel``: mesh construction and sharding rules (data / FSDP /
  tensor axes) replacing the reference's DDP/DeepSpeed stack.
- ``vista_tpu.engine``: the diffusion engine, autoregressive rollout, reward
  estimation and the training loop.
- ``vista_tpu.data``: host-side input pipeline.
- ``vista_tpu.utils``: checkpointing (Orbax + safetensors interop), video IO.
"""

__version__ = "0.1.0"
