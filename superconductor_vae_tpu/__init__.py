"""superconductor_vae_tpu — a TPU-native (JAX/Flax/Pallas) rebuild of the
superconductor multi-task formula generator.

Re-implements, TPU-first, the capabilities of the reference PyTorch framework
(jamesconde/superconductor-vae): a deterministic multi-task encoder
(`FullMaterialsVAE` analogue) producing a 2048-dim latent, a 12-layer
transformer formula decoder with 24 cross-attention memory tokens and
fixed-shape KV-cache decoding, a 4,752-token fraction/isotope-aware semantic
tokenizer, a 17-term multi-task loss with SCST/RLOO policy-gradient training,
and latent-space discovery pipelines — all expressed as jitted, shardable JAX
programs over a `jax.sharding.Mesh`.

Layer map (mirrors reference SURVEY.md §1):
  chem/        L0  periodic-table + isotope property tables (dense numpy)
  tokenizer/   L1  FractionAwareTokenizer (semantic FRAC:p/q + ISO tokens)
  data/        L2  CSV -> fixed-shape arrays, normalization, weighted sampling
  models/      L3  Flax encoder/decoder/set-decoder + surgery utilities
  ops/         L4  losses, rewards, constraint zoo, sampling, Pallas kernels
  training/    L5/L6  jitted train step, host-side scheduler state machines
  parallel/        mesh + sharding rules (DP/TP axes over ICI)
  checkpoint/      Orbax checkpointing, manifests, torch-checkpoint conversion
  generation/  L7  KV-cache generation, latent-space strategies, discovery
  validation/, postprocessing/, analysis/  L7 aux pipelines
"""

__version__ = "0.1.0"
