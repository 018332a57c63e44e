"""prot2text_tpu — a TPU-native (JAX/XLA/Pallas/pjit) protein→text framework.

Brand-new implementation with the capabilities of the reference
`RockingMat/Prot2Text-V2-esm3` (see SURVEY.md): ESM2/ESMC protein encoders,
Llama/Qwen3 causal decoders, MLP/RGCN modality adapters, placeholder-token and
concat fusion, contrastive alignment + LoRA instruction SFT training, and
batched KV-cached generation — all designed TPU-first: SPMD over
`jax.sharding.Mesh`, jitted train/decode steps, Pallas flash attention.
"""

__version__ = "0.1.0"
