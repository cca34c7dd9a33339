"""`lattice validate-weights <dir>` (VERDICT r4 #6): the env-blocked
real-checkpoint validation reduced to "mount weights, run one command",
proven here against a FULL-SIZE synthetic checkpoint (the real
unixcoder-base config: 12 layers / 768 hidden / 50265 vocab) plus a tiny
vocab.json/merges.txt fixture — the exact file layout a mounted HF
checkpoint dir has."""

from __future__ import annotations

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from lattice_tpu.models.validate_weights import validate_weights  # noqa: E402

FULL = dict(vocab_size=50265, hidden_size=768, num_hidden_layers=12,
            num_attention_heads=12, intermediate_size=3072,
            max_position_embeddings=514, type_vocab_size=10,
            layer_norm_eps=1e-5, pad_token_id=1)


@pytest.fixture(scope="module")
def checkpoint_dir(tmp_path_factory):
    """Synthetic full-size checkpoint in HF layout."""
    d = tmp_path_factory.mktemp("unixcoder_ckpt")
    tcfg = transformers.RobertaConfig(
        hidden_act="gelu", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, **FULL)
    torch.manual_seed(0)
    ref = transformers.RobertaModel(tcfg, add_pooling_layer=False).eval()
    torch.save(ref.state_dict(), d / "pytorch_model.bin")
    (d / "config.json").write_text(json.dumps(
        {**FULL, "model_type": "roberta"}))
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3,
             "h": 10, "e": 11, "t": 12, "l": 13, "o": 14, "w": 15,
             "d": 16, "r": 17, "a": 18, "i": 19, "n": 20,
             "he": 30, "the": 31, "dr": 32, "drain": 33, "Ġ": 34}
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text(
        "#version: test\nh e\nt he\nd r\ndr a\ndra i\ndrai n\n")
    return d


@pytest.fixture(scope="module")
def report(checkpoint_dir):
    return validate_weights(checkpoint_dir)


class TestValidateWeights:
    def test_overall_ok(self, report):
        assert report["ok"], json.dumps(report, indent=2)

    def test_mapping_at_checkpoint_config(self, report):
        assert report["checks"]["param_mapping"]["ok"]
        cfg = report["checks"]["state_dict"]["config"]
        assert cfg["hidden_size"] == 768 and cfg["num_layers"] == 12
        assert cfg["vocab_size"] == 50265

    def test_full_config_torch_parity(self, report):
        tp = report["checks"]["torch_parity"]
        assert tp["ok"], tp
        assert tp["max_abs_diff"] <= tp["atol"]
        assert not tp["missing_keys"]

    def test_tokenizer_check_runs_real_vocab(self, report):
        tok = report["checks"]["tokenizer"]
        # the native BPE may be unavailable in stripped envs; when it
        # runs it must be ok, never silently skipped with files present
        assert tok["ok"] is not None
        if tok["ok"]:
            assert all(r["native"] > 0 for r in tok["samples"])
            assert tok["real_vocab_ids"] > 0

    def test_embedding_probe(self, report):
        probe = report["checks"]["embedding_probe"]
        assert probe["ok"] and probe["finite"] and probe["distinct_rows"]

    def test_missing_dir_fails_cleanly(self, tmp_path):
        rep = validate_weights(tmp_path / "nope")
        assert rep["ok"] is False

    def test_empty_dir_fails_cleanly(self, tmp_path):
        rep = validate_weights(tmp_path)
        assert rep["ok"] is False
        assert rep["checks"]["state_dict"]["ok"] is False

    def test_corrupt_mapping_reported(self, checkpoint_dir, tmp_path):
        """A checkpoint missing a tensor fails the mapping check with
        the offending key, not a traceback."""
        state = torch.load(checkpoint_dir / "pytorch_model.bin",
                           map_location="cpu", weights_only=True)
        state.pop("embeddings.word_embeddings.weight")
        torch.save(state, tmp_path / "pytorch_model.bin")
        (tmp_path / "config.json").write_text(
            (checkpoint_dir / "config.json").read_text())
        rep = validate_weights(tmp_path)
        assert rep["ok"] is False

    def test_cli_entrypoint(self, checkpoint_dir, capsys):
        from lattice_tpu.models.validate_weights import main
        rc = main([str(checkpoint_dir)])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["ok"]
