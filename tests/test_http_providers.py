"""HTTP provider request-shaping tests with a mocked transport.

Parity model: the reference tests its providers against mocked SDK clients
(`test_summarization.py` etc.); here the seam is the JSON POST itself, so
these assert each vendor's wire format without network.
"""

import asyncio

import pytest

import lattice_tpu.providers.http_providers as hp
from lattice_tpu.providers.base import ProviderConfig


@pytest.fixture()
def transport(monkeypatch):
    calls = []

    async def fake_apost(url, payload, headers, timeout):
        calls.append({"url": url, "payload": payload, "headers": headers})
        if "embeddings" in url:
            n = len(payload["input"])
            return {"data": [{"index": i, "embedding": [0.1] * 4}
                             for i in reversed(range(n))]}
        if "chat/completions" in url:
            return {"choices": [{"message": {"content": "chat-reply"}}]}
        if "messages" in url:
            return {"content": [{"type": "text", "text": "claude-"},
                                {"type": "text", "text": "reply"}]}
        if "generateContent" in url:
            return {"candidates": [{"content": {"parts": [{"text": "gem"}]}}]}
        if "embedContent" in url:
            return {"embedding": {"values": [0.5] * 4}}
        raise AssertionError(f"unexpected url {url}")

    monkeypatch.setattr(hp, "_apost", fake_apost)
    return calls


class TestOpenAI:
    def test_chat_payload(self, transport):
        p = hp.OpenAILLMProvider(ProviderConfig(name="openai", model="gpt-x",
                                                api_key="sk-test"))
        out = asyncio.run(p.complete(
            [{"role": "user", "content": "hi"}], temperature=0.2))
        assert out == "chat-reply"
        call = transport[0]
        assert call["url"].endswith("/chat/completions")
        assert call["payload"]["model"] == "gpt-x"
        assert call["payload"]["temperature"] == 0.2
        assert call["headers"]["Authorization"] == "Bearer sk-test"

    def test_embeddings_order_restored(self, transport):
        p = hp.OpenAIEmbeddingProvider(ProviderConfig(
            name="openai", model="emb", api_key="k", dimensions=4))
        out = asyncio.run(p.embed_batch(["a", "b", "c"]))
        assert len(out) == 3  # fake returns reversed indices; sorted back
        assert transport[0]["payload"]["input"] == ["a", "b", "c"]


class TestAnthropic:
    def test_system_split(self, transport):
        p = hp.AnthropicLLMProvider(ProviderConfig(
            name="anthropic", model="claude-x", api_key="ak"))
        out = asyncio.run(p.complete([
            {"role": "system", "content": "be terse"},
            {"role": "user", "content": "hi"},
        ]))
        assert out == "claude-reply"
        payload = transport[0]["payload"]
        assert payload["system"] == "be terse"
        assert all(m["role"] != "system" for m in payload["messages"])
        assert transport[0]["headers"]["x-api-key"] == "ak"
        assert "anthropic-version" in transport[0]["headers"]
        assert payload["max_tokens"] > 0


class TestGoogle:
    def test_contents_conversion(self, transport):
        p = hp.GoogleLLMProvider(ProviderConfig(
            name="google", model="gemini-x", api_key="gk"))
        out = asyncio.run(p.complete([
            {"role": "system", "content": "sys"},
            {"role": "user", "content": "q"},
            {"role": "assistant", "content": "a"},
        ]))
        assert out == "gem"
        payload = transport[0]["payload"]
        roles = [c["role"] for c in payload["contents"]]
        assert roles == ["user", "model"]
        assert payload["systemInstruction"]["parts"][0]["text"] == "sys"
        assert "key=gk" in transport[0]["url"]

    def test_embed_task_type(self, transport):
        p = hp.GoogleEmbeddingProvider(ProviderConfig(
            name="google", model="emb-x", api_key="gk", dimensions=4))
        out = asyncio.run(p.embed("text"))
        assert out == [0.5] * 4
        assert transport[0]["payload"]["taskType"] == "RETRIEVAL_DOCUMENT"


class TestOllama:
    def test_local_base_and_no_auth(self, transport):
        p = hp.OllamaLLMProvider(ProviderConfig(
            name="ollama", model="llama3.2",
            base_url="http://localhost:11434"))
        asyncio.run(p.complete([{"role": "user", "content": "hi"}]))
        assert transport[0]["url"].startswith("http://localhost:11434/v1/")
        assert transport[0]["headers"] == {}


class TestFactoryRouting:
    def test_anthropic_embeddings_rejected(self):
        from lattice_tpu.config.settings import AISettings
        from lattice_tpu.core.errors import ConfigurationError
        from lattice_tpu.providers.factory import get_embedding_provider
        with pytest.raises(ConfigurationError):
            get_embedding_provider(AISettings(embedding_provider="anthropic"))

    def test_unknown_provider_rejected(self):
        from lattice_tpu.config.settings import AISettings
        from lattice_tpu.core.errors import ConfigurationError
        from lattice_tpu.providers.factory import get_llm_provider
        with pytest.raises(ConfigurationError):
            get_llm_provider(AISettings(llm_provider="skynet"))

    def test_none_llm_provider(self):
        from lattice_tpu.config.settings import AISettings
        from lattice_tpu.providers.factory import get_llm_provider
        assert get_llm_provider(AISettings(llm_provider="none")) is None
