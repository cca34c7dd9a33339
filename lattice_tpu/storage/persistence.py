"""Index persistence: save/load the graph + vector stores to disk.

Replaces the durability the reference delegates to its database servers
(state "lives in the databases, so a killed run resumes by re-running
index", SURVEY §5 checkpoint/resume). Layout under `<repo>/.lattice/`:

- `manifest.json` — project name, dims, dtype, provider, per-file content
  hashes (the delta-upsert key, reference `graph/queries.py:57-60` +
  `embeddings/client.py:178-202`)
- `graph.npz` — numeric node columns + per-edge-type COO arrays
- `graph_strings.json` — qualified names / names / file paths
- `chunks.npz` + `chunks_payloads.json` — live embedding rows (compacted)
  + payloads, for each collection

Arrays are written with NumPy (orbax is geared to pytree checkpoints of
training state; a retrieval index is a flat columnar snapshot, and npz
round-trips it without ceremony).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import numpy as np

from lattice_tpu.core.errors import StorageError
from lattice_tpu.core.types import EdgeType
from lattice_tpu.embeddings.indexer import VectorIndexer
from lattice_tpu.index.chunk_store import ChunkStore
from lattice_tpu.index.graph_store import GraphStore

logger = logging.getLogger(__name__)

FORMAT_VERSION = 1


# ---- manifest -----------------------------------------------------------


def embedder_fingerprint(embedder) -> str:
    """Identify which weights produced the vectors.

    After `lattice train` writes `finetuned_params.npz`, the query path
    embeds with the fine-tuned encoder while saved corpus vectors may have
    been embedded with base weights — a silent query/document encoder
    mismatch (ADVICE r1). The fingerprint is saved in the manifest and
    compared at load time.
    """
    provider = getattr(embedder, "provider", embedder)
    fp = getattr(provider, "fingerprint", None)
    if fp:
        return str(fp)
    # unixcoder: the model tracks exactly which checkpoint it loaded
    impl = getattr(provider, "_impl", None)
    model = getattr(impl, "model", None) or getattr(provider, "model", None)
    model_fp = getattr(model, "weights_fingerprint", None)
    if model_fp:
        return str(model_fp)
    name = getattr(getattr(provider, "config", None), "name", None) \
        or type(provider).__name__
    dims = getattr(provider, "dimensions", None) \
        or getattr(getattr(provider, "config", None), "dimensions", "?")
    return f"{name}-d{dims}"


def write_manifest(data_dir: Path, *, project: str, dims: int,
                   provider: str, dtype: str,
                   file_hashes: dict[str, str],
                   weights_fingerprint: str | None = None) -> None:
    data_dir.mkdir(parents=True, exist_ok=True)
    manifest = {
        "version": FORMAT_VERSION,
        "project": project,
        "dims": dims,
        "provider": provider,
        "dtype": dtype,
        "weights_fingerprint": weights_fingerprint,
        "file_hashes": file_hashes,
    }
    (data_dir / "manifest.json").write_text(json.dumps(manifest, indent=1))


def read_manifest(data_dir: Path) -> dict | None:
    path = data_dir / "manifest.json"
    if not path.is_file():
        return None
    try:
        return json.loads(path.read_text())
    except (OSError, json.JSONDecodeError) as exc:
        raise StorageError(f"corrupt manifest at {path}", cause=exc) from exc


# ---- graph store --------------------------------------------------------


def save_graph(store: GraphStore, data_dir: Path) -> None:
    data_dir.mkdir(parents=True, exist_ok=True)
    arrays: dict[str, np.ndarray] = {
        "types": np.asarray(store._types, dtype=np.int32),
        "file_ids": np.asarray(store._file_ids, dtype=np.int32),
        "start_lines": np.asarray(store._start_lines, dtype=np.int32),
        "end_lines": np.asarray(store._end_lines, dtype=np.int32),
        "alive": np.asarray(store._alive, dtype=bool),
    }
    for etype in EdgeType:
        es = store._edges[etype]
        arrays[f"src_{etype.value}"] = np.asarray(es.src, dtype=np.int32)
        arrays[f"dst_{etype.value}"] = np.asarray(es.dst, dtype=np.int32)
    np.savez_compressed(data_dir / "graph.npz", **arrays)
    strings = {
        "project": store.project,
        "qns": store._qns,
        "names": store._names,
        "file_paths": store._file_paths,
    }
    (data_dir / "graph_strings.json").write_text(json.dumps(strings))


def load_graph(data_dir: Path) -> GraphStore:
    npz_path = data_dir / "graph.npz"
    str_path = data_dir / "graph_strings.json"
    if not npz_path.is_file() or not str_path.is_file():
        raise StorageError(f"no saved graph under {data_dir}")
    arrays = np.load(npz_path)
    strings = json.loads(str_path.read_text())
    store = GraphStore()
    store.project = strings.get("project")
    store._qns = list(strings["qns"])
    store._names = list(strings["names"])
    store._file_paths = list(strings["file_paths"])
    store._files = {p: i for i, p in enumerate(store._file_paths)}
    store._types = arrays["types"].tolist()
    store._file_ids = arrays["file_ids"].tolist()
    store._start_lines = arrays["start_lines"].tolist()
    store._end_lines = arrays["end_lines"].tolist()
    store._alive = arrays["alive"].tolist()
    store._ids = {qn: i for i, qn in enumerate(store._qns) if store._alive[i]}
    store._file_nodes = {}
    for nid, fid in enumerate(store._file_ids):
        if fid >= 0:
            store._file_nodes.setdefault(fid, []).append(nid)
    for etype in EdgeType:
        es = store._edges[etype]
        es.src = arrays[f"src_{etype.value}"].tolist()
        es.dst = arrays[f"dst_{etype.value}"].tolist()
    store.finalize()
    return store


# ---- chunk stores -------------------------------------------------------


def save_chunks(store: ChunkStore, data_dir: Path, name: str) -> None:
    """Compact to live rows on save; row ids are remapped on load."""
    data_dir.mkdir(parents=True, exist_ok=True)
    live_rows = [i for i, p in enumerate(store._payloads) if p is not None]
    emb = np.zeros((len(live_rows), store.dim), dtype=np.float32)
    payloads = []
    for out_i, row in enumerate(live_rows):
        emb[out_i] = store.get_vector(row)
        payloads.append(store._payloads[row])
    np.savez_compressed(data_dir / f"{name}.npz", embeddings=emb)
    (data_dir / f"{name}_payloads.json").write_text(json.dumps(payloads))
    _save_ivf(store, data_dir, name, live_rows)


def _save_ivf(store: ChunkStore, data_dir: Path, name: str,
              live_rows: list[int]) -> None:
    """Persist the IVF partition (or its refusal verdict) with the rows.

    Clustering + the recall self-measure cost 12-19 s at 1M rows; the
    bucket data itself is a cheap device gather, so only centroids + the
    id table (remapped to the compacted row numbering) need to survive.
    A hollow (recall-refused) index saves just centroids + verdict so a
    reloaded isotropic corpus skips the build-then-refuse cycle."""
    ivf_path = data_dir / f"{name}_ivf.npz"
    ivf = getattr(store, "_ivf", None)
    if (ivf is None or store._ivf_dirty or ivf.measured_recall is None):
        ivf_path.unlink(missing_ok=True)
        return
    if ivf.hollow:
        bucket_ids = np.zeros((0, 0), np.int32)
    else:
        remap = np.full(store._cap, -1, np.int32)
        remap[np.asarray(live_rows, np.int64)] = np.arange(
            len(live_rows), dtype=np.int32)
        old = np.asarray(ivf.bucket_ids)
        bucket_ids = np.where(old >= 0, remap[np.maximum(old, 0)], -1)
    np.savez_compressed(
        ivf_path,
        centroids=np.asarray(ivf.centroids, np.float32),
        bucket_ids=bucket_ids.astype(np.int32),
        measured_recall=np.float64(ivf.measured_recall),
        measured_nprobe=np.int64(ivf.measured_nprobe or 0),
        hollow=np.bool_(ivf.hollow))


def _load_ivf(store: ChunkStore, data_dir: Path, name: str) -> None:
    ivf_path = data_dir / f"{name}_ivf.npz"
    if not ivf_path.is_file() or store._size == 0:
        return
    try:
        from lattice_tpu.ops.ivf import IVFIndex
        z = np.load(ivf_path)
        ivf = IVFIndex.restore(
            z["centroids"], z["bucket_ids"], store._emb,
            float(z["measured_recall"]),
            int(z["measured_nprobe"]) or None,
            dtype=str(store.dtype), hollow=bool(z["hollow"]))
        store.adopt_ivf(ivf)
    except Exception:
        logger.exception("IVF restore failed; it will rebuild on demand")


def load_chunks(data_dir: Path, name: str, dim: int,
                dtype: str = "float32") -> ChunkStore:
    npz_path = data_dir / f"{name}.npz"
    payload_path = data_dir / f"{name}_payloads.json"
    store = ChunkStore(dim=dim, dtype=dtype)
    if not npz_path.is_file():
        return store
    emb = np.load(npz_path)["embeddings"]
    payloads = json.loads(payload_path.read_text()) if payload_path.is_file() else []
    if len(emb):
        store.add(emb, payloads)
    _load_ivf(store, data_dir, name)
    return store


# ---- whole-index --------------------------------------------------------


def save_index(data_dir: str | Path, graph_store: GraphStore,
               indexer: VectorIndexer, *, project: str, provider: str,
               file_hashes: dict[str, str],
               weights_fingerprint: str | None = None) -> None:
    data_dir = Path(data_dir)
    save_graph(graph_store, data_dir)
    save_chunks(indexer.code, data_dir, "code_chunks")
    save_chunks(indexer.summaries, data_dir, "summaries")
    if weights_fingerprint is None:
        weights_fingerprint = embedder_fingerprint(indexer.embedder)
    write_manifest(data_dir, project=project, dims=indexer.code.dim,
                   provider=provider, dtype=str(indexer.code.dtype),
                   file_hashes=file_hashes,
                   weights_fingerprint=weights_fingerprint)
    logger.info("index saved to %s", data_dir)


def load_index(data_dir: str | Path, embedder) -> tuple[GraphStore, VectorIndexer, dict]:
    data_dir = Path(data_dir)
    manifest = read_manifest(data_dir)
    if manifest is None:
        raise StorageError(
            f"no index found at {data_dir}; run `lattice index` first")
    if manifest.get("dims") != embedder.dimensions:
        raise StorageError(
            f"index dims {manifest.get('dims')} != embedder dims "
            f"{embedder.dimensions} (provider changed? re-index)")
    saved_fp = manifest.get("weights_fingerprint")
    current_fp = embedder_fingerprint(embedder)
    if saved_fp and saved_fp != current_fp:
        # queries embedded with different weights than the corpus silently
        # degrade recall — surface it loudly (ADVICE r1)
        logger.warning(
            "index was built with weights %r but the current embedder is "
            "%r; re-run `lattice index` to avoid a query/document encoder "
            "mismatch", saved_fp, current_fp)
    graph = load_graph(data_dir)
    indexer = VectorIndexer(embedder, dtype=manifest.get("dtype", "float32"))
    indexer.code = load_chunks(data_dir, "code_chunks", embedder.dimensions,
                               manifest.get("dtype", "float32"))
    indexer.summaries = load_chunks(data_dir, "summaries", embedder.dimensions,
                                    manifest.get("dtype", "float32"))
    return graph, indexer, manifest
