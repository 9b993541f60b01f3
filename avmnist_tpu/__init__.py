"""AVMNIST-TPU: a TPU-native (JAX/XLA/Pallas/pjit) multimodal SSL framework.

A from-scratch rebuild of the capabilities of the `wardvdnb/Multimodal-SSL-AVMNIST`
reference (PyTorch/Lightning, see /root/reference) as an idiomatic JAX framework:

- ``avmnist_tpu.data``       host-side memmap `.npy` pipeline + synthetic data
- ``avmnist_tpu.dsp``        batched on-device spectrogram generation (audio_gen rewrite)
- ``avmnist_tpu.augment``    fused on-device multi-crop / SimCLR view pipelines
- ``avmnist_tpu.models``     encoder zoo (conv, LSTM, ViT, MobileNetV3, ResNet18, CentralNet)
- ``avmnist_tpu.objectives`` DINO (+hybrids), SimCLR NT-Xent, InfoNCE, autoencoders, supervised
- ``avmnist_tpu.parallel``   mesh / sharding / collective helpers (DP over ICI, optional TP axis)
- ``avmnist_tpu.train``      functional train states, jitted steps, multi-seed experiment loops
- ``avmnist_tpu.eval``       kNN + linear (MLP) probes, metrics, summary/visualization writers
- ``avmnist_tpu.config``     YAML config schema compatible with the reference configs
- ``avmnist_tpu.tuning``     hyperparameter / augmentation search (Optuna-compatible, with
                             a built-in fallback sampler when optuna is unavailable)

Design stance (not a port): pure ``step(state, batch, rng) -> (state, metrics)``
functions under ``jit`` over a ``jax.sharding.Mesh``; multi-crop views folded into the
batch axis (one fused forward instead of a Python loop over views); augmentations are
vmapped pure functions driven by explicit PRNG keys; contrastive losses see the global
(all-device) batch so negatives are all-gathered over ICI.
"""

__version__ = "0.1.0"
