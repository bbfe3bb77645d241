"""Thin HTTP request/response wrappers for the real model providers.

Mirrors the reference's 5-provider surface (docproc/providers/
openai_provider.py:53-68, azure_provider.py:33-46, anthropic_provider.py,
ollama_provider.py:47-63, litellm_provider.py — all behind factory.py:18-131)
with one structural change: every provider takes an injectable ``HttpClient``
instead of importing an SDK, so the request shapes, auth headers, retry
policy and response parsing are all real, unit-testable code (canned
responses, no network) — the only deployment-bound piece is the 20-line
stdlib client at the bottom.

Layering: ChatProvider (docproc_spark.providers) is the engine-facing seam
used by the refine orchestration; VisionTransport is the seam under
BatchingVisionProvider (batch caps, timeouts, skip-and-log all live there).
These classes only translate one call into one HTTP round trip.
"""

from __future__ import annotations

import json
import logging
from abc import ABC, abstractmethod
from collections.abc import Callable

from docproc_spark.providers import ChatProvider, VisionTransport

logger = logging.getLogger(__name__)


class HttpClient(ABC):
    """One JSON POST. Implementations: UrllibHttpClient (deployment),
    canned fakes (tests). Raises HttpError for non-2xx responses."""

    @abstractmethod
    def post_json(
        self, url: str, headers: dict, payload: dict, timeout_s: float
    ) -> dict: ...


class HttpError(Exception):
    def __init__(self, status: int, body: str = ""):
        super().__init__(f"HTTP {status}: {body[:200]}")
        self.status = status
        self.body = body


#: statuses worth retrying: rate limit + transient server errors
RETRYABLE_STATUSES = frozenset({429, 500, 502, 503, 504})


def _post_with_retries(
    client: HttpClient,
    url: str,
    headers: dict,
    payload: dict,
    timeout_s: float,
    max_retries: int,
    backoff_s: float = 1.0,
    sleep: Callable[[float], None] | None = None,
) -> dict:
    """Reference parity: OpenAI(max_retries=3) (openai_provider.py:20,36-39).
    Exponential backoff on retryable statuses / transport errors; the last
    error propagates (callers have their own skip-and-log / fallback)."""
    import time

    sleep = sleep or time.sleep
    attempt = 0
    while True:
        try:
            return client.post_json(url, headers, payload, timeout_s)
        except HttpError as e:
            if e.status not in RETRYABLE_STATUSES or attempt >= max_retries:
                raise
        except (ConnectionError, OSError, TimeoutError):
            if attempt >= max_retries:
                raise
        sleep(backoff_s * (2**attempt))
        attempt += 1


# ---------------------------------------------------------------------------
# Chat providers (the refine-stage seam)
# ---------------------------------------------------------------------------
class OpenAIChatProvider(ChatProvider):
    """POST {base_url}/chat/completions with a Bearer key — the OpenAI shape
    (reference openai_provider.py:53-68). ``litellm`` and any OpenAI-
    compatible gateway are the same wire shape with a different base_url
    (reference litellm_provider.py routes through the litellm shim for the
    same reason)."""

    provider_id = "openai-chat"

    def __init__(
        self,
        client: HttpClient,
        api_key: str = "",
        base_url: str = "https://api.openai.com/v1",
        model: str = "gpt-4o",
        timeout_s: float = 60.0,
        max_retries: int = 3,
    ):
        self.client = client
        self.api_key = api_key
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.timeout_s = timeout_s
        self.max_retries = max_retries

    def _headers(self) -> dict:
        return {
            "Authorization": f"Bearer {self.api_key}",
            "Content-Type": "application/json",
        }

    def _complete(self, messages: list, **kwargs) -> str:
        data = _post_with_retries(
            self.client,
            f"{self.base_url}/chat/completions",
            self._headers(),
            {"model": self.model, "messages": messages, **kwargs},
            self.timeout_s,
            self.max_retries,
        )
        # reference: resp.choices[0].message.content or ""
        return (data.get("choices") or [{}])[0].get("message", {}).get(
            "content"
        ) or ""

    def chat(self, system: str, user: str) -> str:
        return self._complete(
            [
                {"role": "system", "content": system},
                {"role": "user", "content": user},
            ]
        )

    def embed(self, texts: list, model: str | None = None) -> list:
        """POST {base_url}/embeddings (reference openai_provider.py:80-83)."""
        data = _post_with_retries(
            self.client,
            f"{self.base_url}/embeddings",
            self._headers(),
            {"model": model or "text-embedding-3-small", "input": list(texts)},
            self.timeout_s,
            self.max_retries,
        )
        return [d.get("embedding", []) for d in data.get("data", [])]


class AzureOpenAIChatProvider(OpenAIChatProvider):
    """Azure shape: deployment-scoped URL + ``api-key`` header (reference
    azure_provider.py:33-46: AzureOpenAI(endpoint, api_version))."""

    provider_id = "azure-chat"

    def __init__(
        self,
        client: HttpClient,
        api_key: str = "",
        endpoint: str = "",
        deployment: str = "gpt-4o",
        embedding_deployment: str = "text-embedding-ada-002",
        api_version: str = "2024-02-15-preview",
        timeout_s: float = 60.0,
        max_retries: int = 3,
    ):
        base = (
            f"{endpoint.rstrip('/')}/openai/deployments/{deployment}"
        )
        super().__init__(
            client,
            api_key=api_key,
            base_url=base,
            model=deployment,
            timeout_s=timeout_s,
            max_retries=max_retries,
        )
        self.endpoint = endpoint.rstrip("/")
        self.embedding_deployment = embedding_deployment
        self.api_version = api_version

    def _headers(self) -> dict:
        return {"api-key": self.api_key, "Content-Type": "application/json"}

    def _complete(self, messages: list, **kwargs) -> str:
        data = _post_with_retries(
            self.client,
            f"{self.base_url}/chat/completions?api-version={self.api_version}",
            self._headers(),
            # Azure ignores the model field (deployment is in the URL) but
            # accepts it; keep the body shape identical to OpenAI's
            {"model": self.model, "messages": messages, **kwargs},
            self.timeout_s,
            self.max_retries,
        )
        return (data.get("choices") or [{}])[0].get("message", {}).get(
            "content"
        ) or ""

    def embed(self, texts: list, model: str | None = None) -> list:
        """Azure embeddings address the EMBEDDING deployment in the URL
        path and need api-version — the inherited OpenAI embed() would hit
        the chat deployment with no api-version and 400/404 (reference
        azure_provider.py:70-73: deployment = model or
        embedding_deployment)."""
        dep = model or self.embedding_deployment
        data = _post_with_retries(
            self.client,
            f"{self.endpoint}/openai/deployments/{dep}/embeddings"
            f"?api-version={self.api_version}",
            self._headers(),
            {"input": list(texts)},
            self.timeout_s,
            self.max_retries,
        )
        return [d.get("embedding", []) for d in data.get("data", [])]


class AnthropicChatProvider(ChatProvider):
    """POST {base_url}/v1/messages with x-api-key + anthropic-version;
    system is a top-level param and the reply content is a block list
    (reference anthropic_provider.py; the default model mirrors its
    public default at anthropic_provider.py:16)."""

    provider_id = "anthropic-chat"

    def __init__(
        self,
        client: HttpClient,
        api_key: str = "",
        base_url: str = "https://api.anthropic.com",
        model: str = "claude-sonnet-4-20250514",
        max_tokens: int = 4096,
        timeout_s: float = 60.0,
        max_retries: int = 3,
    ):
        self.client = client
        self.api_key = api_key
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.max_tokens = max_tokens
        self.timeout_s = timeout_s
        self.max_retries = max_retries

    def chat(self, system: str, user: str) -> str:
        data = _post_with_retries(
            self.client,
            f"{self.base_url}/v1/messages",
            {
                "x-api-key": self.api_key,
                "anthropic-version": "2023-06-01",
                "Content-Type": "application/json",
            },
            {
                "model": self.model,
                "max_tokens": self.max_tokens,
                "system": system,
                "messages": [{"role": "user", "content": user}],
            },
            self.timeout_s,
            self.max_retries,
        )
        blocks = data.get("content") or []
        return "".join(
            b.get("text", "") for b in blocks if b.get("type") == "text"
        )


class OllamaChatProvider(ChatProvider):
    """POST {base_url}/api/chat, stream off (reference
    ollama_provider.py:47-63)."""

    provider_id = "ollama-chat"

    def __init__(
        self,
        client: HttpClient,
        base_url: str = "http://localhost:11434",
        model: str = "llava",
        timeout_s: float = 120.0,
        max_retries: int = 3,
    ):
        self.client = client
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.timeout_s = timeout_s
        self.max_retries = max_retries

    def chat(self, system: str, user: str) -> str:
        data = _post_with_retries(
            self.client,
            f"{self.base_url}/api/chat",
            {"Content-Type": "application/json"},
            {
                "model": self.model,
                "messages": [
                    {"role": "system", "content": system},
                    {"role": "user", "content": user},
                ],
                "stream": False,
            },
            self.timeout_s,
            self.max_retries,
        )
        return data.get("message", {}).get("content", "")

    def embed(self, texts: list, model: str | None = None) -> list:
        """POST {base_url}/api/embeddings once PER TEXT (the Ollama embed
        endpoint takes a single `prompt` — reference ollama_provider.py:
        72-84, model default nomic-embed-text)."""
        out: list = []
        for t in texts:
            data = _post_with_retries(
                self.client,
                f"{self.base_url}/api/embeddings",
                {"Content-Type": "application/json"},
                {"model": model or "nomic-embed-text", "prompt": t},
                self.timeout_s,
                self.max_retries,
            )
            out.append(data.get("embedding", []))
        return out


class LiteLLMChatProvider(OpenAIChatProvider):
    """The reference's litellm route (litellm_provider.py, factory.py:18-131):
    litellm is an OpenAI-compatible proxy/shim, so the wire shape IS the
    OpenAI chat-completions shape with the gateway's base_url and the
    model string passed through verbatim (e.g. "anthropic/claude-…" —
    litellm does the per-backend translation server-side)."""

    provider_id = "litellm-chat"

    def __init__(
        self,
        client: HttpClient,
        api_key: str = "",
        base_url: str = "http://localhost:4000",
        model: str = "gpt-4o",
        timeout_s: float = 60.0,
        max_retries: int = 3,
    ):
        super().__init__(
            client,
            api_key=api_key,
            base_url=base_url,
            model=model,
            timeout_s=timeout_s,
            max_retries=max_retries,
        )


# ---------------------------------------------------------------------------
# Raw HTTP (binary submit + JSON GET) — the Azure Read async-OCR wire
# ---------------------------------------------------------------------------
class RawHttpClient(ABC):
    """Two raw ops the async-OCR wire needs beyond JSON POST: a binary
    POST that exposes the response HEADERS (Operation-Location carries the
    poll URL) and a JSON GET. Implementations: UrllibRawHttpClient
    (deployment), canned fakes (tests)."""

    @abstractmethod
    def post_bytes(
        self, url: str, headers: dict, body: bytes, timeout_s: float
    ) -> tuple[int, dict, bytes]:
        """→ (status_code, response_headers, body). Non-2xx returns, does
        not raise — the transport decides (Azure 400 = skip, not error)."""

    @abstractmethod
    def get_json(self, url: str, headers: dict, timeout_s: float) -> dict: ...


class AzureReadOcrTransport:
    """Azure Computer Vision Read API v3.2 async OCR, the reference's
    exact wire shape (extractors/vision_llm.py:214-255):

      submit  POST {endpoint}/vision/v3.2/read/analyze, body = raw image
              bytes, headers Ocp-Apim-Subscription-Key + octet-stream;
              HTTP 400 → unreadable image, skip (reference returns None);
              success → the Operation-Location response header IS the
              poll URL (missing header → skip).
      poll    GET Operation-Location with the key header; status field
              "succeeded" → lines = analyzeResult.readResults[].lines[]
              .text stripped non-empty; "failed" → failed; anything else
              → still running.

    Implements the OcrTransport protocol consumed by PollingOcrProvider
    (providers.py:232) — the poll cadence, max_polls, <100-byte skip and
    skip-and-log all live THERE; this class is one HTTP call per method.
    Read v3.2 has no caption/tags (the describe endpoint is a separate
    wire), so poll returns empty caption/tags."""

    def __init__(
        self,
        raw_client: RawHttpClient,
        endpoint: str,
        api_key: str = "",
        submit_timeout_s: float = 30.0,
        poll_timeout_s: float = 10.0,
    ):
        self.raw_client = raw_client
        self.endpoint = endpoint.rstrip("/")
        self.api_key = api_key
        self.submit_timeout_s = submit_timeout_s
        self.poll_timeout_s = poll_timeout_s

    class Unreadable(Exception):
        """Azure 400 = not-an-image / unreadable — a per-image skip
        (reference :230-231 returns None), not a transport failure."""

    def submit(self, blob: bytes) -> str:
        status, headers, body = self.raw_client.post_bytes(
            f"{self.endpoint}/vision/v3.2/read/analyze",
            {
                "Ocp-Apim-Subscription-Key": self.api_key,
                "Content-Type": "application/octet-stream",
            },
            blob,
            self.submit_timeout_s,
        )
        if status == 400:
            raise self.Unreadable("azure read: 400 (unreadable image)")
        if not 200 <= status < 300:
            raise HttpError(status, body.decode("utf-8", "replace"))
        op = {k.lower(): v for k, v in headers.items()}.get("operation-location")
        if not op:
            raise ValueError("azure read: no Operation-Location header")
        return op

    def poll(self, op_id: str) -> tuple:
        data = self.raw_client.get_json(
            op_id,
            {"Ocp-Apim-Subscription-Key": self.api_key},
            self.poll_timeout_s,
        )
        status = data.get("status", "")
        if status == "succeeded":
            lines = []
            for ar in data.get("analyzeResult", {}).get("readResults", []):
                for line in ar.get("lines", []):
                    t = (line.get("text") or "").strip()
                    if t:
                        lines.append(t)
            return ("succeeded", lines, "", [])
        if status == "failed":
            return ("failed", [], "", [])
        return ("running", [], "", [])


# ---------------------------------------------------------------------------
# Vision transport (the seam under BatchingVisionProvider)
# ---------------------------------------------------------------------------
class OpenAIVisionTransport(VisionTransport):
    """One batched vision round trip in the reference's wire shape
    (vision_llm.py:129-165): a single chat completion carrying one batch
    prompt + N image_url data-URL blocks, reply expected as a JSON array
    of N descriptions (markdown fences tolerated). Shape violations raise
    — BatchingVisionProvider's skip-and-log blanks that batch only.

    ``ref_to_data_url`` resolves a media_ref (content hash) to a base64
    data URL from whatever blob store the deployment uses; there is no
    blob store in this engine's tables, so the default refuses loudly.
    """

    BATCH_PROMPT = (
        "Describe each of the %d images. Reply with a JSON array of %d "
        "strings, one description per image, in order."
    )

    def __init__(
        self,
        client: HttpClient,
        api_key: str = "",
        base_url: str = "https://api.openai.com/v1",
        model: str = "gpt-4o",
        timeout_s: float = 120.0,
        max_retries: int = 3,
        ref_to_data_url: Callable[[str], str] | None = None,
    ):
        self.client = client
        self.api_key = api_key
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.timeout_s = timeout_s
        self.max_retries = max_retries
        self.ref_to_data_url = ref_to_data_url or self._no_blob_store

    @staticmethod
    def _no_blob_store(ref: str) -> str:
        raise NotImplementedError(
            "wire a blob store: ref_to_data_url(media_ref) -> data URL"
        )

    @staticmethod
    def _strip_fences(raw: str) -> str:
        """Reference vision_llm.py:145-156: models may wrap JSON in ```."""
        raw = raw.strip()
        if not raw.startswith("```"):
            return raw
        lines, out, in_block = raw.split("\n"), [], False
        for line in lines:
            if line.startswith("```"):
                in_block = not in_block
                continue
            if in_block:
                out.append(line)
        return "\n".join(out)

    def describe_batch(self, items: list) -> list:
        n = len(items)
        content = [{"type": "text", "text": self.BATCH_PROMPT % (n, n)}]
        for ref, ctx in items:
            content.append(
                {
                    "type": "image_url",
                    "image_url": {"url": self.ref_to_data_url(ref)},
                }
            )
        data = _post_with_retries(
            self.client,
            f"{self.base_url}/chat/completions",
            {
                "Authorization": f"Bearer {self.api_key}",
                "Content-Type": "application/json",
            },
            {
                "model": self.model,
                "messages": [{"role": "user", "content": content}],
            },
            self.timeout_s,
            self.max_retries,
        )
        raw = (data.get("choices") or [{}])[0].get("message", {}).get(
            "content"
        ) or ""
        arr = json.loads(self._strip_fences(raw))  # ValueError → skip-and-log
        if not isinstance(arr, list):
            raise ValueError(f"vision reply is not a JSON array: {type(arr)}")
        return [str(x or "") for x in arr]


# ---------------------------------------------------------------------------
# Deployment client (stdlib; the only network-touching code in the repo)
# ---------------------------------------------------------------------------
class UrllibHttpClient(HttpClient):
    def post_json(
        self, url: str, headers: dict, payload: dict, timeout_s: float
    ) -> dict:
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            url,
            data=json.dumps(payload).encode("utf-8"),
            headers=headers,
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as e:
            raise HttpError(e.code, e.read().decode("utf-8", "replace")) from e
        except urllib.error.URLError as e:
            raise ConnectionError(str(e.reason)) from e


class UrllibRawHttpClient(RawHttpClient):
    def post_bytes(
        self, url: str, headers: dict, body: bytes, timeout_s: float
    ) -> tuple[int, dict, bytes]:
        import urllib.error
        import urllib.request

        req = urllib.request.Request(url, data=body, headers=headers, method="POST")
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                return resp.status, dict(resp.headers.items()), resp.read()
        except urllib.error.HTTPError as e:
            # contract: non-2xx is RETURNED (Azure 400 = per-image skip)
            return e.code, dict(e.headers.items() if e.headers else []), e.read()
        except urllib.error.URLError as e:
            raise ConnectionError(str(e.reason)) from e

    def get_json(self, url: str, headers: dict, timeout_s: float) -> dict:
        import urllib.error
        import urllib.request

        req = urllib.request.Request(url, headers=headers, method="GET")
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as e:
            raise HttpError(e.code, e.read().decode("utf-8", "replace")) from e
        except urllib.error.URLError as e:
            raise ConnectionError(str(e.reason)) from e
