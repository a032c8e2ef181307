"""hcpdiff_tpu — TPU-native (JAX/XLA/Pallas/pjit) Stable-Diffusion toolbox.

A from-scratch rebuild of the capabilities of IrisRainbowNeko/HCP-Diffusion
(config-driven SD1.5/SD2.x/SDXL training + inference: layer-wise LoRA,
prompt-tuning embeddings, DreamArtist++, ControlNet, ARB bucketing, Min-SNR,
workflow graphs) designed TPU-first: pure-functional models under jit,
parameter-overlay adaptation instead of forward hooks, shard_map/pjit data
parallelism over ICI meshes, and Pallas kernels on the hot path.
"""

__version__ = '0.1.0'
