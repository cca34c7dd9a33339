"""UniXcoder embedding provider: tokenize on host, encode on TPU.

Parity target: reference `src/lattice/providers/unixcoder_provider.py:87-282`
— mode-token framing `<encoder-only>` with CLS/SEP, max_length 512 with
padding, mask-weighted mean-pool sentence embeddings, an lru-cached
singleton model, and batched no-grad embedding. The torch module becomes the
Flax encoder in `models/unixcoder.py`; the 1-worker ThreadPoolExecutor that
serialized torch inference (`:260-282`) disappears — JAX dispatch is
async and the jitted forward is reentrant.
"""

from __future__ import annotations

import logging
from functools import lru_cache

import numpy as np

from lattice_tpu.models.unixcoder import UniXcoderConfig, UniXcoderModel
from lattice_tpu.providers.base import BaseEmbeddingProvider, ProviderConfig
from lattice_tpu.text.tokenizer import CodeTokenizer

logger = logging.getLogger(__name__)

EMBEDDING_DIM = 768          # reference `unixcoder_provider.py:229`
MAX_LENGTH = 512             # reference `unixcoder_provider.py:90`


@lru_cache(maxsize=2)
def _get_model(weights_dir: str | None, finetune_dir: str | None = None,
               seed: int = 0) -> UniXcoderModel:
    """Singleton model (reference lru-cached loader, `:157-174`)."""
    return UniXcoderModel(UniXcoderConfig(), weights_dir=weights_dir,
                          seed=seed, finetune_dir=finetune_dir)


class UniXcoderEmbedder:
    """Synchronous core satisfying the `Embedder` protocol."""

    def __init__(self, weights_dir: str | None = None,
                 max_length: int = MAX_LENGTH, batch_size: int = 128,
                 finetune_dir: str | None = None):
        self.model = _get_model(weights_dir, finetune_dir)
        # LATTICE_BF16_SERVE=1: cast matrix params to bf16 for serving
        # (+4% chunks/s on v5e, R3 batch 3; mean self-cosine vs f32
        # 0.985 at the real config — opt-in because near-tie orderings
        # can shift)
        import os as _os
        if (_os.environ.get("LATTICE_BF16_SERVE") == "1"
                and "+bf16serve" not in self.model.weights_fingerprint):
            self.model.enable_bf16_inference()
        self.tokenizer = CodeTokenizer(
            vocab_size=self.model.config.vocab_size,
            vocab_dir=weights_dir)
        self.max_length = max_length
        self.batch_size = batch_size
        self._maybe_shard()
        # AOT layout pinning at the bulk-encode shape: with the paired
        # attention kernel it measured 771 vs 730 chunks/s on v5e
        # (R4_TPU_RESULTS1). TPU-only (one extra AOT compile at init);
        # LATTICE_PIN_LAYOUTS=0 opts out.
        try:
            import jax as _jax
            on_tpu = _jax.default_backend().lower() in ("tpu", "axon")
        except Exception:
            on_tpu = False
        if (on_tpu and _os.environ.get("LATTICE_PIN_LAYOUTS", "1") == "1"
                and getattr(self.model, "mesh", None) is None):
            self.model.pin_serving_layouts(self.batch_size,
                                           self.max_length)
        if not self.model.loaded_pretrained:
            logger.info(
                "UniXcoder running with random-init weights (no checkpoint "
                "at %r); use the hash provider for offline retrieval quality",
                weights_dir)

    def _maybe_shard(self) -> None:
        """Batch-DP the encoder over all attached chips (SURVEY §2.4 row 4).

        With >1 device the forward pass shards its batch over the mesh's
        data axis; per-shard batch stays `batch_size`, so the host-facing
        batch scales with the mesh. LATTICE_EMBED_DP=0 opts out."""
        import os

        import jax
        if os.environ.get("LATTICE_EMBED_DP") == "0":
            return
        try:
            n = len(jax.devices())
        except Exception:
            return
        if n > 1 and getattr(self.model, "mesh", None) is None:
            from lattice_tpu.parallel.mesh import make_mesh
            self.model.use_mesh(make_mesh(n))
            self.batch_size *= self.model.data_shards

    @property
    def dimensions(self) -> int:
        return EMBEDDING_DIM

    def embed(self, text: str) -> list[float]:
        return self.embed_batch([text])[0]

    def embed_batch(self, texts: list[str]) -> list[list[float]]:
        out: list[list[float]] = []
        for start in range(0, len(texts), self.batch_size):
            group = texts[start:start + self.batch_size]
            ids, mask = self.tokenizer.encode_batch(group, self.max_length)
            pooled = self.model.encode(np.asarray(ids), np.asarray(mask))
            out.extend(pooled.astype(np.float32).tolist())
        return out

    def embed_batch_device(self, texts: list[str]):
        """[B, 768] pooled embeddings LEFT ON DEVICE.

        Bulk-indexing fast path: the per-batch pooled readback costs
        ~30% of encoder throughput through a relay-attached chip (798
        vs 1130 chunks/s, R4_TPU_RESULTS2). `ChunkStore.add` accepts
        the device array directly, so ingestion never materializes
        embeddings on the host."""
        import jax.numpy as jnp
        parts = []
        for start in range(0, len(texts), self.batch_size):
            group = texts[start:start + self.batch_size]
            ids, mask = self.tokenizer.encode_batch(group, self.max_length)
            parts.append(self.model.encode_device(np.asarray(ids),
                                                  np.asarray(mask)))
        if not parts:
            return jnp.zeros((0, EMBEDDING_DIM), jnp.float32)
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


class UniXcoderEmbeddingProvider(BaseEmbeddingProvider):
    """Async provider seam (reference `:229-282`)."""

    def __init__(self, config: ProviderConfig | None = None,
                 weights_dir: str | None = None,
                 finetune_dir: str | None = None):
        config = config or ProviderConfig(name="unixcoder",
                                          dimensions=EMBEDDING_DIM)
        config.dimensions = EMBEDDING_DIM
        super().__init__(config)
        self._impl = UniXcoderEmbedder(weights_dir=weights_dir,
                                       finetune_dir=finetune_dir)

    async def _embed(self, text: str) -> list[float]:
        return self._impl.embed(text)

    async def _embed_batch(self, texts: list[str]) -> list[list[float]]:
        return self._impl.embed_batch(texts)

    def embed_batch_device(self, texts: list[str]):
        """Sync device-resident bulk path (see UniXcoderEmbedder)."""
        return self._impl.embed_batch_device(texts)
