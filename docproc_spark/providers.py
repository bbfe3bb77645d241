"""Caption/chat provider interface (analog of docproc/providers/*).

The reference ships 5 thin HTTP providers behind an ABC with an instance
cache (providers/factory.py:18-131, base.py:26-52). This engine's
invariant path uses the deterministic stub (the reference's own tests run
vision-off); real providers plug in behind the same batch signature and
run inside mapInPandas — one provider instance per executor partition,
Arrow-batched, never per-row.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import pandas as pd


class CaptionProvider(ABC):
    """Batch captioner: (media_ref, context) series in → caption series out."""

    provider_id: str = "base"

    @abstractmethod
    def caption_batch(self, media_ref: pd.Series, context: pd.Series) -> pd.Series: ...


class DeterministicStubProvider(CaptionProvider):
    """Pure function of (media_ref, context) — the invariant-path default."""

    provider_id = "stub"

    def caption_batch(self, media_ref: pd.Series, context: pd.Series) -> pd.Series:
        from docproc_spark.kernels.captions import caption_series

        return caption_series(media_ref, context)


class HttpVisionProvider(CaptionProvider):
    """Placeholder for an OpenAI/Azure/Anthropic/Ollama-style vision API.

    Deliberately NOT implemented in this container (no network, no keys);
    the class documents the integration point: instantiate per partition
    inside the iterator-form kernel, batch ≤ N images per request
    (reference VISION_BATCH_SIZE=5), timeout + skip-and-log per batch.
    """

    provider_id = "http"

    def __init__(self, endpoint: str = "", api_key: str = "", model: str = ""):
        self.endpoint, self.api_key, self.model = endpoint, api_key, model

    def caption_batch(self, media_ref: pd.Series, context: pd.Series) -> pd.Series:
        raise NotImplementedError(
            "network vision providers are a deployment concern; "
            "use DeterministicStubProvider for the invariant path"
        )


class ChatProvider(ABC):
    """Chat model for the LLM refine stage (reference providers/base.py:26-52
    `chat`; the orchestration that calls it is refiners/llm_refine.py:156-201).
    One instance per executor partition inside iterator-form mapInPandas."""

    provider_id: str = "chat-base"

    @abstractmethod
    def chat(self, system: str, user: str) -> str: ...


class DeterministicStubChatProvider(ChatProvider):
    """Stands in for the refine model on the invariant path: extracts the
    fenced CONTENT block from the user prompt and applies the mechanical
    refine rules (marker strip + symbol table) — a pure function, so the
    full chunk→chat→rejoin orchestration is testable without a network."""

    provider_id = "stub-chat"

    def chat(self, system: str, user: str) -> str:
        import re

        from docproc_spark.kernels.refine import refine_mechanical

        m = re.search(r"CONTENT:\n```\n(.*)\n```\s*$", user, re.S)
        content = m.group(1) if m else user
        return refine_mechanical(content)


class FailingChatProvider(ChatProvider):
    """Always raises — exercises the refine failure→raw-text fallback
    (reference llm_refine.py:196-201)."""

    provider_id = "failing-chat"

    def chat(self, system: str, user: str) -> str:
        raise ConnectionError("synthetic provider failure")


class EmptyChatProvider(ChatProvider):
    """Always returns "" — exercises the no-refined-parts→raw fallback
    (reference llm_refine.py:193-195)."""

    provider_id = "empty-chat"

    def chat(self, system: str, user: str) -> str:
        return ""


_CACHE: dict[str, CaptionProvider | ChatProvider] = {}

_FACTORIES = {
    "stub": DeterministicStubProvider,
    "http": HttpVisionProvider,
    "stub-chat": DeterministicStubChatProvider,
    "failing-chat": FailingChatProvider,
    "empty-chat": EmptyChatProvider,
}


def get_provider(provider_id: str = "stub", **kwargs):
    """Instance cache keyed by provider id (reference factory.py:73-80)."""
    if provider_id not in _CACHE:
        if provider_id not in _FACTORIES:
            raise ValueError(f"Unsupported provider: {provider_id}")
        _CACHE[provider_id] = _FACTORIES[provider_id](**kwargs)
    return _CACHE[provider_id]
