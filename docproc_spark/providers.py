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
    """Legacy placeholder — superseded by the real wire layer: compose
    get_provider("batching-vision", transport=OpenAIVisionTransport(...))
    (providers_http.py) for an OpenAI/Azure-shape vision API with the
    batching/timeout/skip-and-log contract on top. Kept so older configs
    naming "http" fail with a pointer instead of a KeyError.
    """

    provider_id = "http"

    def __init__(self, endpoint: str = "", api_key: str = "", model: str = ""):
        self.endpoint, self.api_key, self.model = endpoint, api_key, model

    def caption_batch(self, media_ref: pd.Series, context: pd.Series) -> pd.Series:
        raise NotImplementedError(
            "'http' is a legacy placeholder. For a real vision API use "
            "get_provider('batching-vision', transport=OpenAIVisionTransport(...)) "
            "(docproc_spark.providers_http); for the deterministic invariant "
            "path use DeterministicStubProvider."
        )


class VisionTransport(ABC):
    """One vision-API round trip: [(media_ref, context)] → [caption].

    The seam between the engine's batching/error contract (below, fully
    implemented and tested) and the actual HTTP client (a deployment
    concern — no network in this container)."""

    @abstractmethod
    def describe_batch(self, items: list) -> list: ...


class FakeVisionTransport(VisionTransport):
    """Deterministic in-process transport with scriptable failure modes —
    stands in for the HTTP client so the batching contract is testable."""

    def __init__(self, fail_on_call: int | None = None,
                 wrong_length_on_call: int | None = None,
                 delay_s: float = 0.0):
        self.calls: list = []
        self._fail = fail_on_call
        self._wrong = wrong_length_on_call
        self._delay = delay_s

    def describe_batch(self, items: list) -> list:
        import time as _time

        self.calls.append(list(items))
        n_call = len(self.calls)
        if self._delay:
            _time.sleep(self._delay)
        if self._fail is not None and n_call == self._fail:
            raise ConnectionError("synthetic transport failure")
        if self._wrong is not None and n_call == self._wrong:
            return ["bogus"]  # wrong length on purpose
        return [f"desc({ref[:8]}|{ctx})" for ref, ctx in items]


class BatchingVisionProvider(CaptionProvider):
    """The reference's vision request shape, transport-agnostic:

    - ≤ ``batch_size`` images per call (VISION_BATCH_SIZE=5,
      vision_llm.py:349-351, batching loop :128-165)
    - ≤ ``max_parallel`` calls in flight (VISION_BATCH_PARALLEL=3,
      :352,415-447) via a thread pool INSIDE the executor task — Spark
      partitions give cross-machine parallelism, the pool overlaps HTTP
      latency within one partition exactly like the reference's pool
    - wrong-length reply → [""] * n for that batch (:157-158)
    - per-call timeout + any transport error → skip-and-log, captions ""
      for that batch only, never a failed task (:448-482)

    Wall-time bound: ``timeout_s`` is a NO-PROGRESS deadline, not a
    per-slot grace restarted as the collection loop reaches each batch —
    the whole call ends at most one timeout window after the last batch
    completion. A slow-but-working transport never trips it (every
    completion resets the window); if every worker hangs, ALL remaining
    batches blank after one window instead of burning
    len(batches)/max_parallel independent windows.
    """

    provider_id = "batching-vision"

    def __init__(self, transport: VisionTransport, batch_size: int = 5,
                 max_parallel: int = 3, timeout_s: float = 120.0):
        self.transport = transport
        self.batch_size = batch_size
        self.max_parallel = max_parallel
        self.timeout_s = timeout_s

    def caption_batch(self, media_ref: pd.Series, context: pd.Series) -> pd.Series:
        import logging
        import queue
        import threading

        items = list(zip(media_ref.fillna(""), context.fillna("")))
        batches = [
            items[i : i + self.batch_size]
            for i in range(0, len(items), self.batch_size)
        ]
        if not batches:
            return pd.Series([], dtype=object, index=media_ref.index)

        # Hand-rolled bounded pool of DAEMON threads — deliberately not
        # ThreadPoolExecutor: its workers are non-daemon and joined by
        # concurrent.futures' atexit hook, so one hung transport call would
        # block interpreter exit forever. Here the per-batch timeout bounds
        # OUR wall time, stragglers are abandoned for real (daemon threads
        # die with the process), and a hung worker leaks at most
        # max_parallel threads per call — the trade for never failing the
        # Spark task (reference: vision_llm.py:448-482 skip-and-log).
        import time as _time

        slots = [{"ev": threading.Event(), "val": None, "err": None} for _ in batches]
        work: queue.Queue = queue.Queue()
        for i, b in enumerate(batches):
            work.put((i, b))
        # monotonic stamp of the LAST batch completion — the no-progress
        # deadline below compares against it, so the timeout window slides
        # forward with every completed batch
        progress = {"t": _time.monotonic()}

        def worker():
            while True:
                try:
                    i, b = work.get_nowait()
                except queue.Empty:
                    return
                s = slots[i]
                try:
                    s["val"] = self.transport.describe_batch(b)
                except Exception as exc:  # noqa: BLE001 — transport errors blank the batch
                    s["err"] = exc
                # stamp BEFORE set: the main thread wakes on set() and may
                # immediately evaluate the deadline for the NEXT slot — a
                # pre-set stale stamp there spuriously blanked every
                # remaining batch when completions ran near timeout_s
                progress["t"] = _time.monotonic()
                s["ev"].set()

        for _ in range(min(self.max_parallel, len(batches))):
            threading.Thread(target=worker, daemon=True).start()

        def wait_with_progress_deadline(ev) -> bool:
            """True if ev set; False once timeout_s elapses with NO batch
            completing anywhere. Deadline is checked BEFORE paying a poll
            tick: once progress has stopped, every remaining queued batch
            must blank immediately — a tick-first loop would add one tick
            per remaining batch (1000 queued batches ≈ 16 extra minutes
            on a global hang) after the window already expired."""
            tick = min(1.0, self.timeout_s / 10 or 1.0)
            while True:
                if ev.is_set():
                    return True
                if _time.monotonic() - progress["t"] > self.timeout_s:
                    return False
                if ev.wait(timeout=tick):
                    return True

        out: list = []
        log = logging.getLogger(__name__)
        try:
            for b, s in zip(batches, slots):
                res: list
                if not wait_with_progress_deadline(s["ev"]):
                    log.warning(
                        "vision batch skipped: no progress in %.1fs",
                        self.timeout_s,
                    )
                    res = [""] * len(b)
                elif s["err"] is not None:
                    log.warning("vision batch skipped: %s", s["err"])
                    res = [""] * len(b)
                else:
                    res = s["val"]
                    if len(res) != len(b):
                        log.warning(
                            "vision reply length %d != batch %d — blanking",
                            len(res), len(b),
                        )
                        res = [""] * len(b)
                out.extend(res)
        finally:
            # cancel not-yet-started batches (mirror of cancel_futures)
            while True:
                try:
                    work.get_nowait()
                except queue.Empty:
                    break
        return pd.Series(out, index=media_ref.index, dtype=object)


class OcrTransport(ABC):
    """Async-OCR round trips (the reference's Azure Read v3.2 shape,
    vision_llm.py:214-255): submit a blob → operation id; poll the id →
    (status, lines). The HTTP client is a deployment concern; the
    submit/poll/skip contract below is implemented and tested."""

    @abstractmethod
    def submit(self, blob: bytes) -> str: ...

    @abstractmethod
    def poll(self, op_id: str) -> tuple: ...  # (status, lines, caption, tags)


class FakeOcrTransport(OcrTransport):
    """Deterministic in-process OCR with scriptable latency/failure."""

    def __init__(self, polls_until_done: int = 2, fail_ids: set | None = None):
        self._until = polls_until_done
        self._fail = fail_ids or set()
        self._polls: dict = {}
        self.submitted: list = []

    def submit(self, blob: bytes) -> str:
        import hashlib

        op = hashlib.sha256(blob).hexdigest()[:16]
        self.submitted.append(op)
        return op

    def poll(self, op_id: str):
        n = self._polls.get(op_id, 0) + 1
        self._polls[op_id] = n
        if op_id in self._fail:
            return ("failed", [], "", [])
        if n < self._until:
            return ("running", [], "", [])
        lines = [f"line1({op_id[:6]})", f"line2({op_id[:6]})"]
        return ("succeeded", lines, f"caption({op_id[:6]})", ["tagA", "tagB", "tagC"])


class PollingOcrProvider:
    """The reference's OCR orchestration (vision_llm.py:214-289),
    transport-agnostic:

    - images smaller than ``min_bytes`` (100) are skipped outright (:223-224)
    - submit → poll loop with ``poll_interval`` up to ``max_polls``; a
      still-running or failed operation → "" for that image, never a failed
      task (skip-and-log, :244-252)
    - OCR lines joined "\\n" (:247)
    - describe_and_ocr combines caption + OCR text + "Tags: " +
      ", ".join(tags[:20]) (:258-289)
    """

    def __init__(self, transport: OcrTransport, min_bytes: int = 100,
                 max_polls: int = 30, poll_interval_s: float = 0.0):
        self.transport = transport
        self.min_bytes = min_bytes
        self.max_polls = max_polls
        self.poll_interval_s = poll_interval_s

    def _run_one(self, blob) -> tuple:
        import logging
        import time as _time

        if blob is None or len(blob) < self.min_bytes:
            return ("", "", [])
        try:
            op = self.transport.submit(bytes(blob))
            for _ in range(self.max_polls):
                status, lines, caption, tags = self.transport.poll(op)
                if status == "succeeded":
                    return ("\n".join(lines), caption, list(tags))
                if status == "failed":
                    raise RuntimeError(f"ocr operation {op} failed")
                if self.poll_interval_s:
                    _time.sleep(self.poll_interval_s)
            raise TimeoutError(f"ocr operation {op} still running")
        except Exception as exc:
            logging.getLogger(__name__).warning("ocr skipped: %s", exc)
            return ("", "", [])

    def ocr_batch(self, blobs: pd.Series) -> pd.Series:
        return blobs.map(lambda b: self._run_one(b)[0])

    def describe_and_ocr_batch(self, blobs: pd.Series) -> pd.Series:
        def combine(b):
            text, caption, tags = self._run_one(b)
            parts = [p for p in (caption, text) if p]
            if tags:
                parts.append("Tags: " + ", ".join(tags[:20]))
            return "\n".join(parts)

        return blobs.map(combine)


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


def _http_factory(name: str):
    """Lazy factory for the HTTP wrappers (providers_http) — injects the
    stdlib client unless the caller passes one (tests pass canned fakes)."""

    def make(**kwargs):
        import docproc_spark.providers_http as ph

        cls = getattr(ph, name)
        kwargs.setdefault("client", ph.UrllibHttpClient())
        return cls(**kwargs)

    return make


def _raw_http_factory(name: str):
    """Like _http_factory for transports built on RawHttpClient."""

    def make(**kwargs):
        import docproc_spark.providers_http as ph

        cls = getattr(ph, name)
        kwargs.setdefault("raw_client", ph.UrllibRawHttpClient())
        return cls(**kwargs)

    return make


_FACTORIES = {
    "stub": DeterministicStubProvider,
    "http": HttpVisionProvider,
    "stub-chat": DeterministicStubChatProvider,
    "failing-chat": FailingChatProvider,
    "empty-chat": EmptyChatProvider,
    # engine-facing batching layer over any VisionTransport
    "batching-vision": BatchingVisionProvider,
    # engine-facing async-OCR orchestration over any OcrTransport
    "polling-ocr": PollingOcrProvider,
    # real HTTP wire shapes over an injectable client (providers_http):
    "openai-chat": _http_factory("OpenAIChatProvider"),
    "azure-chat": _http_factory("AzureOpenAIChatProvider"),
    "anthropic-chat": _http_factory("AnthropicChatProvider"),
    "ollama-chat": _http_factory("OllamaChatProvider"),
    # litellm gateway = OpenAI wire shape with base_url routing
    # (reference litellm_provider.py behind factory.py:18-131)
    "litellm-chat": _http_factory("LiteLLMChatProvider"),
    "openai-vision": _http_factory("OpenAIVisionTransport"),
    # Azure Read v3.2 async OCR wire (submit/Operation-Location/poll)
    "azure-read-ocr": _raw_http_factory("AzureReadOcrTransport"),
}


_CACHE_KW: dict[str, tuple] = {}

#: kwarg value types whose repr IS their config (safe to compare by value)
_PRIMITIVE_KW_TYPES = (str, bytes, int, float, bool, tuple, frozenset, type(None))


def _value_repr(v):
    """Canonical repr for value-shaped data (primitives + dict/list/set
    containers of them), or None if v is an opaque object anywhere in the
    structure — opaque means identity-compared."""
    if isinstance(v, _PRIMITIVE_KW_TYPES) and not isinstance(v, (tuple, frozenset)):
        return repr(v)
    if isinstance(v, (list, tuple)):
        parts = [_value_repr(x) for x in v]
        return None if None in parts else "[" + ",".join(parts) + "]"
    if isinstance(v, (set, frozenset)):
        parts = [_value_repr(x) for x in v]
        return None if None in parts else "{" + ",".join(sorted(parts)) + "}"
    if isinstance(v, dict):
        items = [(repr(k), _value_repr(x)) for k, x in v.items()]
        if any(r is None for _, r in items):
            return None
        return "{" + ",".join(f"{k}:{r}" for k, r in sorted(items)) + "}"
    return None


def _kw_sig(kwargs: dict) -> tuple:
    """(value-compared kwargs, identity-compared kwargs). Primitives and
    dict/list/set containers OF primitives compare by canonical value —
    a fresh-but-equal {"x": "1"} headers dict on every partition must hit
    the cache, not raise. Opaque objects (clients/transports/callables)
    compare by id(): their default reprs carry addresses (equal configs
    would spuriously mismatch) while custom reprs may OMIT config (real
    drift would pass silently) — identity is the only honest comparison."""
    prim, objs = [], []
    for k, v in kwargs.items():
        r = _value_repr(v)
        if r is not None:
            prim.append((k, r))
        else:
            objs.append((k, id(v)))
    return tuple(sorted(prim)), tuple(sorted(objs))


def get_provider(provider_id: str = "stub", **kwargs):
    """Instance cache keyed by provider id (reference factory.py:73-80).

    Config-drift guard: the credentialed HTTP factories made the keyed-
    by-id cache dangerous — a second call with a DIFFERENT api_key /
    base_url / model would silently return the first instance and send
    requests to the wrong endpoint with the wrong credentials. A cache hit
    with different kwargs raises instead. Primitive kwargs are compared
    by value; object kwargs by identity (with a distinct error naming the
    kwarg, so an equal-but-fresh client raising is deliberate and
    explained, not an accident of address-bearing reprs)."""
    prim, objs = _kw_sig(kwargs)
    if provider_id in _CACHE:
        cached_prim, cached_objs = _CACHE_KW[provider_id]
        if prim != cached_prim:
            raise ValueError(
                f"provider {provider_id!r} already cached with different "
                "config; construct the class directly or clear the cache"
            )
        if objs != cached_objs:
            changed = [k for (k, i) in objs if (k, i) not in set(cached_objs)]
            raise ValueError(
                f"provider {provider_id!r} already cached with different "
                f"object-valued kwargs (by identity): {changed}; pass the "
                "same object, construct the class directly, or clear the cache"
            )
        return _CACHE[provider_id]
    if provider_id not in _FACTORIES:
        raise ValueError(f"Unsupported provider: {provider_id}")
    _CACHE[provider_id] = _FACTORIES[provider_id](**kwargs)
    _CACHE_KW[provider_id] = (prim, objs)
    return _CACHE[provider_id]
