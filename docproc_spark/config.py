"""Engine configuration (analog of the reference's config loader).

Reference search order (docproc/config/loader.py:59-70): explicit path →
$DOCPROC_CONFIG → ./docproc.yaml → ./docproc.yml → ~/.config/docproc/
docproc.yml → ~/.docproc.yaml; env vars override file values. The ingest
flags (schema.py:40-48) become pipeline-stage toggles here.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, fields


@dataclass
class IngestConfig:
    # NB: the reference also exposes a `sanitize` toggle (schema.py:40-48);
    # this engine always sanitizes (the span-sequence invariant is defined
    # over sanitized text), so the toggle is deliberately NOT offered — a
    # config knob must never promise behavior the engine doesn't implement.
    drop_exact_duplicates: bool = True
    drop_boilerplate: bool = True
    boilerplate_kinds: tuple = ("thank_you", "questions", "blank")
    # consumed by facade.caption_media: off = deterministic stub (the
    # invariant path); on = route to vision_provider
    use_vision: bool = False
    vision_provider: str = "stub"
    # consumed by facade.extract_table: on = reference's optional refine
    # stage (chunk → chat → rejoin, per-doc raw-text fallback)
    use_llm_refine: bool = False
    refine_provider: str = "stub-chat"


@dataclass
class SparkConfig:
    shuffle_partitions: int | None = None
    arrow_batch: int = 32768
    master: str | None = None


@dataclass
class RagConfig:
    """RAG block, reference schema parity (config/schema.py:72-80 —
    backend / top_k=5 / chunk_size=512 / namespace defaults, checked by
    reference tests/test_config.py:8-30). Engine-side consumers:
    facade.rag_chunks (chunk_size → operators/packing.chunk_documents)
    and facade.rag_search (top_k → operators/retrieval.bm25_topk);
    `backend` selects which similarity entry point a deployment wires
    ("embedding" → cosine/LSH/IVF ANN); namespace/persist_path are the
    index-location knobs for build_text_index/build_lsh_index paths."""

    backend: str = "embedding"
    top_k: int = 5
    chunk_size: int = 512
    namespace: str = "default"
    persist_path: str | None = None


@dataclass
class EngineConfig:
    ingest: IngestConfig = field(default_factory=IngestConfig)
    spark: SparkConfig = field(default_factory=SparkConfig)
    rag: RagConfig = field(default_factory=RagConfig)

    @property
    def drop_kinds(self) -> frozenset:
        if not self.ingest.drop_boilerplate:
            return frozenset()
        return frozenset(self.ingest.boilerplate_kinds)


_SEARCH = (
    lambda: os.environ.get("DOCPROC_SPARK_CONFIG"),
    lambda: "./docproc_spark.yaml" if os.path.exists("./docproc_spark.yaml") else None,
    lambda: "./docproc_spark.yml" if os.path.exists("./docproc_spark.yml") else None,
    lambda: os.path.expanduser("~/.config/docproc_spark/config.yml")
    if os.path.exists(os.path.expanduser("~/.config/docproc_spark/config.yml"))
    else None,
)


def _apply(dc, data: dict):
    for f in fields(dc):
        if f.name in data:
            v = data[f.name]
            cur = getattr(dc, f.name)
            if hasattr(cur, "__dataclass_fields__") and isinstance(v, dict):
                _apply(cur, v)
            else:
                setattr(dc, f.name, tuple(v) if isinstance(v, list) else v)


def parse_config(path: str | None = None) -> EngineConfig:
    """Pure: returns a fresh config, no global mutation (reference
    facade.py tests assert the same purity)."""
    cfg = EngineConfig()
    chosen = path
    if chosen is None:
        # DOCPROC_SPARK_CONFIG is EXPLICIT user intent — a typo'd path
        # must error like parse_config(bad_path) does, not silently fall
        # through to defaults with (e.g.) use_llm_refine quietly off
        env_path = os.environ.get("DOCPROC_SPARK_CONFIG")
        if env_path and not os.path.exists(env_path):
            raise FileNotFoundError(
                f"DOCPROC_SPARK_CONFIG points at a missing file: {env_path}"
            )
        for probe in _SEARCH:
            p = probe()
            if p and os.path.exists(p):
                chosen = p
                break
    if chosen:
        try:
            import yaml  # type: ignore

            with open(chosen) as fh:
                data = yaml.safe_load(fh) or {}
        except ImportError:
            data = _parse_minimal_yaml(chosen)
        _apply(cfg, data)
    # env overrides
    env_map = {
        "DOCPROC_SPARK_DROP_DUPES": ("ingest", "drop_exact_duplicates"),
        "DOCPROC_SPARK_DROP_BOILERPLATE": ("ingest", "drop_boilerplate"),
        "DOCPROC_SPARK_SHUFFLE_PARTITIONS": ("spark", "shuffle_partitions"),
        "DOCPROC_SPARK_MASTER": ("spark", "master"),
        "DOCPROC_SPARK_RAG_BACKEND": ("rag", "backend"),
        "DOCPROC_SPARK_RAG_TOP_K": ("rag", "top_k"),
        "DOCPROC_SPARK_RAG_CHUNK_SIZE": ("rag", "chunk_size"),
    }
    for env, (sec, name) in env_map.items():
        if env in os.environ:
            raw = os.environ[env]
            val: object = raw
            if raw.lower() in ("true", "false"):
                val = raw.lower() == "true"
            elif raw.isdigit():
                val = int(raw)
            setattr(getattr(cfg, sec), name, val)
    return cfg


def _parse_minimal_yaml(path: str) -> dict:
    """Two-level key: value YAML subset (no external dependency needed)."""
    out: dict = {}
    section = None
    with open(path) as fh:
        for line in fh:
            if not line.strip() or line.strip().startswith("#"):
                continue
            indent = len(line) - len(line.lstrip())
            key, _, val = line.strip().partition(":")
            val = val.strip()
            if indent == 0:
                if val == "":
                    section = key
                    out[section] = {}
                else:
                    out[key] = _coerce(val)
                    section = None
            elif section is not None:
                out[section][key] = _coerce(val)
    return out


def _coerce(v: str):
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    try:
        return int(v)
    except ValueError:
        return v
