"""maua_tpu — TPU-native audio-reactive StyleGAN framework.

A ground-up JAX / XLA / Pallas / pjit rebuild of the capabilities of
JCBrouwer/maua-stylegan2 (reference at /root/reference): StyleGAN2 training and
synthesis, audio feature extraction, audio-reactive latent / noise / bend /
rewrite pipelines, streaming video rendering, and FID/PPL/PRDC evaluation —
designed for TPU meshes rather than translated from the CUDA reference.

Layer map (mirrors SURVEY.md §1, rebuilt TPU-first):
  ops/       L1  resampling + activation primitives (XLA-native, Pallas fused)
  models/    L3  StyleGAN2 generator/discriminator, StyleGAN1 inference, VAEs
  io/        L2  torch-checkpoint ingestion, orbax checkpoints, datasets
  audio/     L4  signal analysis (stft/mel/onset/chroma/rms/segmentation)
  reactive/  L4  latent ops, noise, network bending, model rewriting
  pipeline/  L5  generate() API + plugin protocol
  render/    L5  device->host streaming + ffmpeg/MJPEG encode
  train/     L4/6 GAN losses, ADA, lookahead-minimax, EMA, mesh-DP train step
  eval/      L4  FID / PPL / PRDC / LPIPS
  parallel/  L2  mesh construction, sharding helpers, collectives
"""

__version__ = "0.1.0"
