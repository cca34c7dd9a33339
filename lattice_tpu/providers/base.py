"""Provider base classes: retry + bounded concurrency.

Parity target: reference `src/lattice/providers/base.py:21-225`
(`ProviderConfig` with env-prefix construction, `BaseLLMProvider.complete`
and `BaseEmbeddingProvider.embed/embed_batch` wrapped in tenacity retry
(5 attempts, exponential backoff 1-60s) and an asyncio.Semaphore;
`set_concurrency`).
"""

from __future__ import annotations

import abc
import asyncio
import os
from dataclasses import dataclass, field
from typing import Any, Sequence

from tenacity import (
    retry,
    stop_after_attempt,
    wait_exponential,
)

RETRY = retry(
    stop=stop_after_attempt(5),
    wait=wait_exponential(multiplier=1.0, min=1.0, max=60.0),
    reraise=True,
)


@dataclass
class ProviderConfig:
    """Reference: `providers/base.py:21-64`."""

    name: str
    model: str | None = None
    api_key: str | None = None
    base_url: str | None = None
    dimensions: int = 768
    max_concurrent: int = 5
    timeout_s: float = 60.0
    extra: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_env_prefix(cls, prefix: str, name: str, **overrides: Any) -> "ProviderConfig":
        """Build from `{PREFIX}_API_KEY` / `{PREFIX}_MODEL` / `{PREFIX}_BASE_URL`."""
        def g(suffix: str) -> str | None:
            return os.environ.get(f"{prefix}_{suffix}")
        cfg = cls(
            name=name,
            model=g("MODEL"),
            api_key=g("API_KEY"),
            base_url=g("BASE_URL"),
        )
        for k, v in overrides.items():
            setattr(cfg, k, v)
        return cfg


class BaseLLMProvider(abc.ABC):
    """Reference: `providers/base.py:67-135`."""

    def __init__(self, config: ProviderConfig):
        self.config = config
        self._semaphore = asyncio.Semaphore(config.max_concurrent)

    def set_concurrency(self, n: int) -> None:
        self._semaphore = asyncio.Semaphore(max(1, n))

    async def complete(self, messages: Sequence[dict], **kwargs: Any) -> str:
        async with self._semaphore:
            return await self._complete_with_retry(messages, **kwargs)

    @RETRY
    async def _complete_with_retry(self, messages: Sequence[dict],
                                   **kwargs: Any) -> str:
        return await self._complete(messages, **kwargs)

    @abc.abstractmethod
    async def _complete(self, messages: Sequence[dict], **kwargs: Any) -> str: ...


class BaseEmbeddingProvider(abc.ABC):
    """Reference: `providers/base.py:138-225`."""

    def __init__(self, config: ProviderConfig):
        self.config = config
        self._semaphore = asyncio.Semaphore(config.max_concurrent)

    @property
    def dimensions(self) -> int:
        return self.config.dimensions

    def set_concurrency(self, n: int) -> None:
        self._semaphore = asyncio.Semaphore(max(1, n))

    async def embed(self, text: str) -> list[float]:
        async with self._semaphore:
            return await self._embed_with_retry(text)

    async def embed_batch(self, texts: Sequence[str]) -> list[list[float]]:
        async with self._semaphore:
            return await self._embed_batch_with_retry(list(texts))

    @RETRY
    async def _embed_with_retry(self, text: str) -> list[float]:
        return await self._embed(text)

    @RETRY
    async def _embed_batch_with_retry(self, texts: list[str]) -> list[list[float]]:
        return await self._embed_batch(texts)

    @abc.abstractmethod
    async def _embed(self, text: str) -> list[float]: ...

    async def _embed_batch(self, texts: list[str]) -> list[list[float]]:
        return [await self._embed(t) for t in texts]
