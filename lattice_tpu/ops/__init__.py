"""Device kernels: scoring/top-k, IVF, graph frontier, ranking fuse."""

from lattice_tpu.ops import graph_kernels, topk

__all__ = ["graph_kernels", "topk"]
