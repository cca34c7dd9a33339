from lattice_tpu.index.chunk_store import ChunkStore
from lattice_tpu.index.graph_store import GraphStore, NodeRecord

__all__ = ["ChunkStore", "GraphStore", "NodeRecord"]
