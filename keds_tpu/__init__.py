"""keds_tpu — a TPU-native (JAX/XLA/Pallas) zero-shot composed-image-retrieval framework.

A from-scratch rebuild of the capabilities of suoych/KEDs (CVPR 2024,
"Knowledge-Enhanced Dual-stream Zero-shot Composed Image Retrieval"):

* frozen CLIP ViT image/text towers (reference: ``src/model/model.py``),
* a pic2word-style pseudo-token mapper (``IM2TEXT``) and dual cross-attention
  knowledge-fusion streams (``CrossFormer``),
* brute-force top-k retrieval over a 0.5M-row bi-modality embedding database
  (reference uses Faiss-GPU; here a fused Pallas matmul+top-k MIPS kernel over
  mesh-sharded HBM-resident embeddings),
* the full train / eval / demo CLI surface with checkpoint-format parity.

Everything on the compute path is pure-functional JAX: parameters are pytrees,
models are jitted functions, distribution is a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"
