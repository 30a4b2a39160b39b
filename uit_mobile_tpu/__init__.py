"""uit_mobile_tpu — a TPU-native (JAX/XLA/Pallas) audio tagging + keyword spotting framework.

A ground-up rebuild of the capabilities of RicherMans/UIT_Mobile (ICASSP 2023,
"Unified Keyword Spotting and Audio Tagging on Mobile Devices with Transformers",
arXiv:2303.01812) designed TPU-first:

- the torchaudio STFT->log-mel frontend is a fused Pallas kernel
  (framing + windowed rDFT-as-matmul + mel filterbank + dB in one VMEM pass),
- the UiT ViT encoder runs as a single jitted XLA program over static shapes,
- long-clip evaluation decomposes into fixed 102-frame windows folded into the
  batch axis (no sequential Python crop loop),
- scaling is data-parallel over a `jax.sharding.Mesh` (batch sharded over ICI,
  the <2M-param weights replicated).

Layout:
  frontend/   log-mel DSP (pure-JAX reference + Pallas fused kernel)
  ops/        Pallas kernels and fused compute paths
  models/     UiT transformer family + MobileNetV2 (functional pytree modules)
  ckpt/       torch<->jax checkpoint conversion, save/load, model averaging
  data/       host-side HDF5/manifest pipeline, samplers, batching, wav I/O
  augment/    waveform/spectrogram augmentation + mixup (JAX RNG)
  train/      jitted train step, schedules, PSL distillation, training loop
  evaluate/   metric suite + AudioSet/GSC evaluation protocols
  parallel/   device mesh + sharding policies
  utils/      config system, registries, logging
  cli/        infer / train / evaluate / bench entry points
"""

__version__ = "0.1.0"
