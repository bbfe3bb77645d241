"""HTTP provider layer: wire shapes, auth headers, retry policy and reply
parsing against canned responses — no network (reference parity:
docproc/providers/openai_provider.py, azure_provider.py,
anthropic_provider.py, ollama_provider.py behind factory.py)."""

from __future__ import annotations

import json

import pandas as pd
import pytest

from docproc_spark.providers_http import (
    AnthropicChatProvider,
    AzureOpenAIChatProvider,
    HttpClient,
    HttpError,
    OllamaChatProvider,
    OpenAIChatProvider,
    OpenAIVisionTransport,
    _post_with_retries,
)


class CannedClient(HttpClient):
    """Replays a scripted list of responses; records every request."""

    def __init__(self, responses):
        self.responses = list(responses)
        self.requests: list = []

    def post_json(self, url, headers, payload, timeout_s):
        self.requests.append(
            {"url": url, "headers": headers, "payload": payload, "timeout": timeout_s}
        )
        r = self.responses.pop(0)
        if isinstance(r, Exception):
            raise r
        return r


def _openai_reply(text):
    return {"choices": [{"message": {"content": text}}]}


class TestOpenAIChat:
    def test_request_shape_and_parse(self):
        c = CannedClient([_openai_reply("refined")])
        p = OpenAIChatProvider(c, api_key="sk-x", model="gpt-4o")
        assert p.chat("SYS", "USER") == "refined"
        req = c.requests[0]
        assert req["url"] == "https://api.openai.com/v1/chat/completions"
        assert req["headers"]["Authorization"] == "Bearer sk-x"
        assert req["payload"]["model"] == "gpt-4o"
        assert req["payload"]["messages"] == [
            {"role": "system", "content": "SYS"},
            {"role": "user", "content": "USER"},
        ]

    def test_null_content_becomes_empty(self):
        c = CannedClient([{"choices": [{"message": {"content": None}}]}])
        assert OpenAIChatProvider(c).chat("s", "u") == ""

    def test_retries_on_429_then_succeeds(self):
        c = CannedClient([HttpError(429, "slow down"), _openai_reply("ok")])
        sleeps = []
        out = _post_with_retries(
            c, "u", {}, {}, 1.0, 3, backoff_s=0.5, sleep=sleeps.append
        )
        assert out == _openai_reply("ok")
        assert sleeps == [0.5]
        assert len(c.requests) == 2

    def test_non_retryable_status_raises_immediately(self):
        c = CannedClient([HttpError(401, "bad key"), _openai_reply("never")])
        with pytest.raises(HttpError):
            OpenAIChatProvider(c, max_retries=3).chat("s", "u")
        assert len(c.requests) == 1

    def test_retry_exhaustion_raises_last_error(self):
        c = CannedClient([HttpError(503)] * 4)
        with pytest.raises(HttpError):
            _post_with_retries(c, "u", {}, {}, 1.0, 3, sleep=lambda s: None)
        assert len(c.requests) == 4

    def test_embeddings_endpoint(self):
        c = CannedClient(
            [{"data": [{"embedding": [0.1, 0.2]}, {"embedding": [0.3]}]}]
        )
        p = OpenAIChatProvider(c, api_key="k")
        assert p.embed(["a", "b"]) == [[0.1, 0.2], [0.3]]
        assert c.requests[0]["url"].endswith("/embeddings")
        assert c.requests[0]["payload"]["input"] == ["a", "b"]


class TestAzureChat:
    def test_deployment_url_and_api_key_header(self):
        c = CannedClient([_openai_reply("azure ok")])
        p = AzureOpenAIChatProvider(
            c,
            api_key="az-key",
            endpoint="https://unit.openai.azure.com/",
            deployment="gpt4o-prod",
        )
        assert p.chat("s", "u") == "azure ok"
        req = c.requests[0]
        assert req["url"] == (
            "https://unit.openai.azure.com/openai/deployments/gpt4o-prod"
            "/chat/completions?api-version=2024-02-15-preview"
        )
        assert req["headers"]["api-key"] == "az-key"
        assert "Authorization" not in req["headers"]


class TestAnthropicChat:
    def test_system_param_and_block_parse(self):
        c = CannedClient(
            [{"content": [{"type": "text", "text": "claude "},
                          {"type": "tool_use", "id": "x"},
                          {"type": "text", "text": "says"}]}]
        )
        p = AnthropicChatProvider(c, api_key="ak", model="m")
        assert p.chat("SYS", "USER") == "claude says"
        req = c.requests[0]
        assert req["url"].endswith("/v1/messages")
        assert req["headers"]["x-api-key"] == "ak"
        assert req["headers"]["anthropic-version"]
        assert req["payload"]["system"] == "SYS"
        assert req["payload"]["messages"] == [{"role": "user", "content": "USER"}]


class TestOllamaChat:
    def test_chat_shape(self):
        c = CannedClient([{"message": {"content": "local"}}])
        p = OllamaChatProvider(c, base_url="http://h:11434", model="llava")
        assert p.chat("s", "u") == "local"
        req = c.requests[0]
        assert req["url"] == "http://h:11434/api/chat"
        assert req["payload"]["stream"] is False

    def test_embed_loops_per_text(self):
        """Ollama's embed endpoint takes ONE prompt per call (reference
        ollama_provider.py:72-84): N texts = N POSTs to /api/embeddings,
        model defaulting to nomic-embed-text."""
        c = CannedClient(
            [{"embedding": [0.1, 0.2]}, {"embedding": [0.3, 0.4]}]
        )
        p = OllamaChatProvider(c, base_url="http://h:11434")
        assert p.embed(["alpha", "beta"]) == [[0.1, 0.2], [0.3, 0.4]]
        assert len(c.requests) == 2
        for req, prompt in zip(c.requests, ["alpha", "beta"]):
            assert req["url"] == "http://h:11434/api/embeddings"
            assert req["payload"] == {
                "model": "nomic-embed-text",
                "prompt": prompt,
            }

    def test_embed_model_override_and_missing_key(self):
        c = CannedClient([{}])  # reply without an `embedding` key
        p = OllamaChatProvider(c)
        assert p.embed(["x"], model="custom-embed") == [[]]
        assert c.requests[0]["payload"]["model"] == "custom-embed"


class TestOpenAIVisionTransport:
    def _transport(self, canned):
        return OpenAIVisionTransport(
            canned,
            api_key="k",
            ref_to_data_url=lambda ref: f"data:image/png;base64,{ref[:6]}",
        )

    def test_batch_request_and_json_array_reply(self):
        c = CannedClient([_openai_reply(json.dumps(["a desc", "b desc"]))])
        t = self._transport(c)
        out = t.describe_batch([("ref_a", "ctx1"), ("ref_b", "ctx2")])
        assert out == ["a desc", "b desc"]
        content = c.requests[0]["payload"]["messages"][0]["content"]
        assert content[0]["type"] == "text" and "2" in content[0]["text"]
        assert [b["image_url"]["url"] for b in content[1:]] == [
            "data:image/png;base64,ref_a",
            "data:image/png;base64,ref_b",
        ]

    def test_markdown_fenced_reply_tolerated(self):
        fenced = "```json\n[\"one\", \"two\"]\n```"
        c = CannedClient([_openai_reply(fenced)])
        assert self._transport(c).describe_batch([("r1", ""), ("r2", "")]) == [
            "one",
            "two",
        ]

    def test_garbage_reply_raises_for_skip_and_log(self):
        c = CannedClient([_openai_reply("sorry, I cannot")])
        with pytest.raises(ValueError):
            self._transport(c).describe_batch([("r", "")])

    def test_default_blob_resolver_refuses(self):
        t = OpenAIVisionTransport(CannedClient([]), api_key="k")
        with pytest.raises(NotImplementedError):
            t.describe_batch([("ref", "")])

    def test_drives_batching_provider_end_to_end(self):
        """VERDICT done-criterion: get_provider wires the real wire shape
        under BatchingVisionProvider — batch caps and wrong-length blanking
        still owned by the batching layer."""
        import docproc_spark.providers as P

        replies = [
            _openai_reply(json.dumps([f"d{i}" for i in range(5)])),
            _openai_reply(json.dumps(["short"])),  # wrong length for 2 items
        ]
        c = CannedClient(replies)
        P._CACHE.pop("batching-vision", None)
        prov = P.get_provider(
            "batching-vision",
            transport=self._transport(c),
            batch_size=5,
            max_parallel=1,
        )
        refs = pd.Series([f"ref{i}" for i in range(7)])
        ctx = pd.Series([""] * 7)
        out = list(prov.caption_batch(refs, ctx))
        assert out[:5] == ["d0", "d1", "d2", "d3", "d4"]
        assert out[5:] == ["", ""]  # wrong-length batch blanked, not failed
        # 2 HTTP calls: ceil(7/5) batches
        assert len(c.requests) == 2
        P._CACHE.pop("batching-vision", None)

    def test_get_provider_rejects_config_drift(self):
        """A cache hit with DIFFERENT kwargs must raise, not silently hand
        back the first instance's credentials/endpoint."""
        import docproc_spark.providers as P

        P._CACHE.pop("openai-chat", None)
        c = CannedClient([])
        first = P.get_provider("openai-chat", client=c, api_key="sk-A")
        assert P.get_provider("openai-chat", client=c, api_key="sk-A") is first
        with pytest.raises(ValueError, match="different +config"):
            P.get_provider("openai-chat", client=c, api_key="sk-B")
        P._CACHE.pop("openai-chat", None)


# ---------------------------------------------------------------------------
# Azure Read v3.2 async OCR wire (reference extractors/vision_llm.py:214-255)
# ---------------------------------------------------------------------------
from docproc_spark.providers_http import (  # noqa: E402
    AzureReadOcrTransport,
    LiteLLMChatProvider,
    RawHttpClient,
)


class CannedRawClient(RawHttpClient):
    def __init__(self, post_responses, get_responses):
        self.post_responses = list(post_responses)
        self.get_responses = list(get_responses)
        self.posts: list = []
        self.gets: list = []

    def post_bytes(self, url, headers, body, timeout_s):
        self.posts.append({"url": url, "headers": headers, "body": body})
        r = self.post_responses.pop(0)
        if isinstance(r, Exception):
            raise r
        return r

    def get_json(self, url, headers, timeout_s):
        self.gets.append({"url": url, "headers": headers})
        r = self.get_responses.pop(0)
        if isinstance(r, Exception):
            raise r
        return r


_OP_URL = "https://eastus.example.invalid/vision/v3.2/read/analyzeResults/abc123"


def _read_result(status, lines=()):
    data = {"status": status}
    if status == "succeeded":
        data["analyzeResult"] = {
            "readResults": [{"lines": [{"text": t} for t in lines]}]
        }
    return data


def _transport(posts, gets):
    return AzureReadOcrTransport(
        CannedRawClient(posts, gets),
        endpoint="https://eastus.example.invalid/",
        api_key="k-ocr",
    )


class TestAzureReadOcrTransport:
    def test_submit_wire_shape(self):
        t = _transport([(202, {"Operation-Location": _OP_URL}, b"")], [])
        assert t.submit(b"\x89PNG...") == _OP_URL
        req = t.raw_client.posts[0]
        assert req["url"] == (
            "https://eastus.example.invalid/vision/v3.2/read/analyze"
        )
        assert req["headers"]["Ocp-Apim-Subscription-Key"] == "k-ocr"
        assert req["headers"]["Content-Type"] == "application/octet-stream"
        assert req["body"] == b"\x89PNG..."

    def test_submit_400_is_unreadable_skip(self):
        t = _transport([(400, {}, b"bad image")], [])
        with pytest.raises(AzureReadOcrTransport.Unreadable):
            t.submit(b"x" * 200)

    def test_submit_missing_operation_location_raises(self):
        t = _transport([(202, {}, b"")], [])
        with pytest.raises(ValueError, match="Operation-Location"):
            t.submit(b"x" * 200)

    def test_submit_5xx_raises_http_error(self):
        t = _transport([(503, {}, b"overloaded")], [])
        with pytest.raises(HttpError):
            t.submit(b"x" * 200)

    def test_poll_succeeded_collects_stripped_lines(self):
        t = _transport([], [_read_result("succeeded", ["  E = mc^2 ", "", "x"])])
        status, lines, caption, tags = t.poll(_OP_URL)
        assert status == "succeeded"
        assert lines == ["E = mc^2", "x"]  # stripped, empties dropped
        assert caption == "" and tags == []
        req = t.raw_client.gets[0]
        assert req["url"] == _OP_URL
        assert req["headers"] == {"Ocp-Apim-Subscription-Key": "k-ocr"}

    def test_poll_statuses(self):
        t = _transport([], [_read_result("running"), _read_result("failed")])
        assert t.poll(_OP_URL)[0] == "running"
        assert t.poll(_OP_URL)[0] == "failed"

    def test_end_to_end_under_polling_provider(self):
        """submit → notStarted → running → succeeded through the engine's
        PollingOcrProvider orchestration; lines joined \\n."""
        from docproc_spark.providers import PollingOcrProvider

        t = _transport(
            [(202, {"Operation-Location": _OP_URL}, b"")],
            [
                _read_result("notStarted"),
                _read_result("running"),
                _read_result("succeeded", ["line one", "line two"]),
            ],
        )
        prov = PollingOcrProvider(t, max_polls=5)
        out = prov.ocr_batch(pd.Series([b"\x89PNG" + b"x" * 200]))
        assert list(out) == ["line one\nline two"]

    def test_small_blob_skipped_without_submit(self):
        t = _transport([], [])
        from docproc_spark.providers import PollingOcrProvider

        out = PollingOcrProvider(t).ocr_batch(pd.Series([b"tiny"]))
        assert list(out) == [""]
        assert t.raw_client.posts == []  # never hit the wire

    def test_failed_and_timeout_blank_not_raise(self):
        from docproc_spark.providers import PollingOcrProvider

        t = _transport(
            [(202, {"Operation-Location": _OP_URL}, b"")],
            [_read_result("failed")],
        )
        assert list(PollingOcrProvider(t).ocr_batch(pd.Series([b"x" * 200]))) == [""]
        t2 = _transport(
            [(202, {"Operation-Location": _OP_URL}, b"")],
            [_read_result("running")] * 3,
        )
        prov = PollingOcrProvider(t2, max_polls=3)
        assert list(prov.ocr_batch(pd.Series([b"x" * 200]))) == [""]

    def test_factory_registration(self):
        import docproc_spark.providers as P

        P._CACHE.pop("azure-read-ocr", None)
        raw = CannedRawClient([], [])
        t = P.get_provider(
            "azure-read-ocr", raw_client=raw, endpoint="https://e.invalid",
            api_key="k",
        )
        assert isinstance(t, AzureReadOcrTransport)
        P._CACHE.pop("azure-read-ocr", None)


class TestLiteLLMProvider:
    def test_openai_wire_with_gateway_base_url(self):
        c = CannedClient([_openai_reply("routed")])
        p = LiteLLMChatProvider(
            c, api_key="sk-l", base_url="http://gw:4000",
            model="anthropic/claude-sonnet-4-5",
        )
        assert p.chat("S", "U") == "routed"
        req = c.requests[0]
        assert req["url"] == "http://gw:4000/chat/completions"
        assert req["payload"]["model"] == "anthropic/claude-sonnet-4-5"
        assert req["headers"]["Authorization"] == "Bearer sk-l"

    def test_factory_registration(self):
        import docproc_spark.providers as P

        P._CACHE.pop("litellm-chat", None)
        p = P.get_provider("litellm-chat", client=CannedClient([]), api_key="k")
        assert p.provider_id == "litellm-chat"
        P._CACHE.pop("litellm-chat", None)


class TestDriftGuardObjectKwargs:
    def test_fresh_equal_object_raises_with_identity_message(self):
        import docproc_spark.providers as P

        P._CACHE.pop("openai-chat", None)
        P.get_provider("openai-chat", client=CannedClient([]), api_key="sk-A")
        # same primitive config, FRESH client object: deliberate identity
        # error naming the kwarg — not a repr-address accident
        with pytest.raises(ValueError, match="identity.*client"):
            P.get_provider("openai-chat", client=CannedClient([]), api_key="sk-A")
        P._CACHE.pop("openai-chat", None)

    def test_custom_repr_object_cannot_mask_drift(self):
        import docproc_spark.providers as P

        class SneakyClient(CannedClient):
            def __repr__(self):  # omits all config
                return "SneakyClient()"

        P._CACHE.pop("openai-chat", None)
        a, b = SneakyClient([]), SneakyClient([])
        P.get_provider("openai-chat", client=a, api_key="sk-A")
        with pytest.raises(ValueError):
            P.get_provider("openai-chat", client=b, api_key="sk-A")
        P._CACHE.pop("openai-chat", None)


    def test_equal_container_kwargs_compare_by_value(self):
        """Fresh-but-equal dict/list kwargs (the per-partition pattern)
        must produce the SAME cache signature — containers of primitives
        compare by value; only opaque objects fall to identity."""
        from docproc_spark.providers import _kw_sig

        c = CannedClient([])
        a = _kw_sig({"client": c, "key": "k", "hdrs": {"x": "1", "y": [2, 3]}})
        b = _kw_sig({"client": c, "key": "k", "hdrs": {"y": [2, 3], "x": "1"}})
        assert a == b  # equal containers, any key order → same signature
        drift = _kw_sig({"client": c, "key": "k", "hdrs": {"x": "2"}})
        assert drift[0] != a[0]  # container VALUE drift is primitive drift
        # opaque object nested in a container → whole kwarg is identity
        obj = object()
        s1 = _kw_sig({"hdrs": {"x": obj}})
        s2 = _kw_sig({"hdrs": {"x": obj}})
        assert s1 != s2 or s1[1]  # lands in the identity bucket
        assert s1[1] and s1[1][0][0] == "hdrs"
