"""Training-data mining + fine-tuning driver tests (tiny config)."""

import asyncio

import numpy as np
import pytest

from lattice_tpu.embeddings.embedder import Embedder
from lattice_tpu.models.data import PairBatcher, mine_pairs
from lattice_tpu.models.unixcoder import UniXcoderConfig
from lattice_tpu.pipeline.orchestrator import PipelineOrchestrator
from lattice_tpu.providers.hash_provider import HashEmbedder
from lattice_tpu.text.tokenizer import CodeTokenizer

TINY = UniXcoderConfig(
    vocab_size=512, hidden_size=32, num_layers=2, num_heads=4,
    intermediate_size=64, max_position_embeddings=600, dtype="float32")


@pytest.fixture(scope="module")
def indexed(sample_project_path):
    from lattice_tpu.config.settings import Settings
    settings = Settings()
    settings.metadata.enabled = False
    embedder = Embedder(HashEmbedder(dimensions=64))
    orchestrator = PipelineOrchestrator(
        sample_project_path, embedder, project_name="ft", settings=settings)
    return asyncio.run(orchestrator.run())


class TestMining:
    def test_docstring_pairs_mined(self, indexed):
        pairs = mine_pairs(indexed.indexer.code, indexed.indexer.summaries)
        assert len(pairs) >= 5
        sources = {p.source for p in pairs}
        assert "docstring" in sources
        sample = next(p for p in pairs if p.source == "docstring")
        assert len(sample.anchor) >= 12
        assert len(sample.positive) >= 40

    def test_batcher_shapes_bucketed(self, indexed):
        pairs = mine_pairs(indexed.indexer.code, indexed.indexer.summaries)
        tok = CodeTokenizer(vocab_size=512)
        batcher = PairBatcher(pairs, tok, batch_size=4, max_length=128)
        batch = next(batcher.batches())
        assert batch["anchor_ids"].shape == batch["positive_ids"].shape
        assert batch["anchor_ids"].shape[1] in (32, 64, 128)
        assert batch["anchor_mask"].dtype == np.int32


class TestFinetuneDriver:
    def test_end_to_end_tiny(self, indexed, tmp_path):
        from lattice_tpu.models.finetune import finetune_from_index
        report = finetune_from_index(
            indexed.indexer.code, indexed.indexer.summaries,
            data_dir=tmp_path, config=TINY, steps=3, batch_size=4,
            max_length=64, learning_rate=1e-3)
        assert report["status"] == "completed"
        assert report["steps"] == 3
        assert np.isfinite(report["last_loss"])
        assert (tmp_path / "finetuned_params.npz").is_file()
        assert (tmp_path / "finetune_report.json").is_file()
        params = np.load(tmp_path / "finetuned_params.npz")
        assert any("word_embeddings" in k for k in params.files)

    def test_too_few_pairs_skips(self, tmp_path):
        from lattice_tpu.index.chunk_store import ChunkStore
        from lattice_tpu.models.finetune import finetune_from_index
        empty = ChunkStore(dim=8)
        report = finetune_from_index(empty, data_dir=tmp_path, config=TINY,
                                     steps=2, batch_size=4)
        assert report["status"] == "skipped"


class TestCheckpointRoundtrip:
    def test_finetuned_weights_reload(self, indexed, tmp_path):
        from lattice_tpu.models.finetune import finetune_from_index
        from lattice_tpu.models.unixcoder import UniXcoderModel
        report = finetune_from_index(
            indexed.indexer.code, indexed.indexer.summaries,
            data_dir=tmp_path, config=TINY, steps=2, batch_size=4,
            max_length=64, learning_rate=1e-3)
        assert report["status"] == "completed"
        model = UniXcoderModel(TINY, weights_dir=tmp_path)
        assert model.loaded_pretrained
        saved = np.load(tmp_path / "finetuned_params.npz")
        got = np.asarray(model.params["word_embeddings"]["embedding"])
        np.testing.assert_allclose(
            got, saved["word_embeddings/embedding"], rtol=1e-6)

    def test_finetune_dir_autoload(self, indexed, tmp_path):
        # the seam the CLI uses: project data dir passed as finetune_dir
        # picks up the `lattice train` checkpoint over random init
        from lattice_tpu.models.finetune import finetune_from_index
        from lattice_tpu.models.unixcoder import UniXcoderModel
        finetune_from_index(
            indexed.indexer.code, indexed.indexer.summaries,
            data_dir=tmp_path, config=TINY, steps=2, batch_size=4,
            max_length=64, learning_rate=1e-3)
        model = UniXcoderModel(TINY, finetune_dir=tmp_path)
        assert model.loaded_finetuned and model.loaded_pretrained
        saved = np.load(tmp_path / "finetuned_params.npz")
        got = np.asarray(model.params["word_embeddings"]["embedding"])
        np.testing.assert_allclose(
            got, saved["word_embeddings/embedding"], rtol=1e-6)
        # missing checkpoint: silent random init, no crash
        empty = UniXcoderModel(TINY, finetune_dir=tmp_path / "nope")
        assert not empty.loaded_finetuned

    def test_shape_mismatch_falls_back(self, indexed, tmp_path):
        from lattice_tpu.models.finetune import finetune_from_index
        from lattice_tpu.models.unixcoder import UniXcoderConfig, UniXcoderModel
        finetune_from_index(
            indexed.indexer.code, indexed.indexer.summaries,
            data_dir=tmp_path, config=TINY, steps=1, batch_size=4,
            max_length=64)
        other = UniXcoderConfig(
            vocab_size=128, hidden_size=16, num_layers=1, num_heads=2,
            intermediate_size=32, max_position_embeddings=64,
            dtype="float32")
        model = UniXcoderModel(other, weights_dir=tmp_path)
        assert not model.loaded_pretrained  # mismatch -> random init
