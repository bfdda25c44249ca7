"""TPU-native Multimodal Prompt Retrieval (MPR_Gen) framework.

A from-scratch JAX / XLA / Pallas / pjit rebuild of the capabilities of
tossowski/MultimodalPromptRetrieval (ACL Findings 2023): generative medical
VQA on SLAKE / VQA-RAD / synthetic ROCO with a CLIP ViT-B/32 visual prefix,
a task-prefixed question and an optional retrieved natural-language hint
produced by top-k nearest-neighbour search over a device-resident CLIP
image (+) text embedding index.

Layout:
  ops/        Pallas kernels + lax reference implementations (attention, top-k,
              image preprocessing, normalization layers).
  models/     From-scratch T5 encoder-decoder and CLIP towers as pure
              functional pytree modules; checkpoint converters; the four
              T5Vision model variants.
  text/       Host-side tokenizers (sentencepiece-unigram Viterti encoder with
              optional C++ acceleration, CLIP BPE).
  data/       SLAKE / VQA_RAD / ROCO parsers and fixed-shape batching.
  retrieval/  Device-resident retrieval index build + query.
  parallel/   Mesh construction and sharding rules (data parallel first-class).
  train/      Train/eval driver, metrics, checkpointing.
  native/     C++ host-runtime components (tokenizer encoder, fuzzy matcher).
"""

__version__ = "0.1.0"
