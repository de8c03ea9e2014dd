"""tailored_avsr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) audio-visual speech
recognition framework, built from scratch with the capabilities of the
`david-gimeno/tailored-avsr` PyTorch/ESPnet reference.

Layer map (mirrors SURVEY.md §1, re-designed TPU-first):

- ``ops/``        : compute primitives (log-mel frontend, SpecAug, MVN,
                    attention incl. rel-pos + Pallas flash kernels, cgMLP,
                    FFN, subsampling, positional encodings, CTC, losses).
- ``models/``     : flax.linen model tree (visual frontend, Branchformer,
                    tailored/conventional AV encoders, adaptive fusion,
                    decoders, E2E ASR/VSR/AVSR models, Mask-CTC, LM).
- ``tasks/``      : config -> model factories (registry equivalents of the
                    reference's ClassChoices task builders).
- ``data/``       : host-side input pipeline (CSV splits, WAV/NPZ loading,
                    transforms, bucketed padding batching, tokenizers).
- ``decode/``     : jitted decoding engines (greedy CTC, tensorized joint
                    CTC/attention beam search with LM shallow fusion,
                    Mask-CTC iterative refinement).
- ``train/``      : jitted train/eval steps, Noam/OneCycle schedules,
                    checkpointing with top-K averaging.
- ``parallel/``   : device-mesh construction and sharding rules (pjit).
- ``evaluation/`` : WER/CER + bootstrap confidence intervals (C++ `tasas`
                    twins with ctypes bindings + pure-Python fallback).

Conventions:
- arrays are ``(B, T, D)``; masks are boolean ``(B, T)`` with True = valid
  frame (the reference uses espnet ``(B, 1, T)`` non-pad masks).
- every stochastic op takes an explicit ``jax.random`` key or a flax RNG
  collection; nothing reads global RNG state.
- all shapes under ``jit`` are static; variable lengths ride in masks.
"""

__version__ = "0.1.0"
