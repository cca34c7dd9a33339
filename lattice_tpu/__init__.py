"""lattice-tpu: a TPU-native hybrid code-retrieval framework.

Capabilities of `iAmLakshya/code-rag` re-designed for TPU hardware:
- HBM-resident vector index with fused Pallas score+select kernels
  (replaces Qdrant, reference `embeddings/client.py`).
- CSR relationship graph with frontier-expansion kernels
  (replaces Memgraph, reference `graph/client.py` + Cypher).
- On-device UniXcoder (Flax) chunk embedding
  (replaces torch, reference `providers/unixcoder_provider.py`).
- Multi-chip sharding via jax.sharding Mesh with top-k merge over ICI.
"""

__version__ = "0.1.0"
