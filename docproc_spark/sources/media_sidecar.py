"""Embedded-media catalogue ("media sidecar") over raw document bytes.

Span ingestion (ooxml.py / pdf.py) identifies every embedded image by
sha256-of-bytes in ``media_ref`` but deliberately carries no blobs —
the span contract is text + references. Corpus-scale media curation
needs the blob-level facts behind those references: size, container
format, pixel dimensions (beacon pixels! resolution floors!), how many
times one blob is shown per document. This module emits exactly that —
one row per distinct embedded media blob per document — by SHARING the
span parsers' single pass over the bytes (the ``media_facts`` sink on
``parse_pdf_bytes`` / ``parse_pptx_bytes``), never re-walking the file:

  pptx  blobs referenced by pic shapes (page-aware, identical refs to
        the span table by construction) PLUS unreferenced ``ppt/media/``
        members (slide-master art, embedded audio/video — shown count 0).
  docx / xlsx / xlsm
        package members under ``word/media/`` / ``xl/media/`` — these
        loaders emit no image spans (reference parity), but the embedded
        blobs are still corpus media worth cataloguing (n_refs 0).
  pdf   /Subtype /Image XObjects (the dict's /Width /Height are
        authoritative per ISO 32000 §8.9.5 — no codec needed; DCT
        payloads ARE JPEG files so ``format`` says what the identity
        bytes are) and inline BI/ID/EI images, same decoded-payload
        sha256 identity as span ingestion.

Header metadata for zip-package blobs comes from kernels/mediainfo
(public PNG/JPEG/GIF/WEBP/BMP/WAV/AVI/MP4 byte layouts) — so a deck
embedding an .mp4 gets duration, an embedded .wav gets sample rate.

Scale shape: ``load_media_sidecar`` is one ``mapInPandas`` crossing
over the same distributed ``binaryFile`` frame the span ingest reads —
run both in one job (facade ``ingest_files`` + ``media_sidecar``) and
the catalogue costs one extra CPU pass, zero extra shuffles. Downstream
joins hit it on ``media_ref`` (broadcast when small, hash otherwise);
corpus-wide frequency / template-media detection composes with
operators/interleave.py which keys on the same identity. HTML media is
intentionally absent here: web images are URLs resolved at extraction
time (kernels/html) — only data: URIs have in-document bytes, and those
already get sha256 identity in the span path.
"""

from __future__ import annotations

import hashlib
import io
import zipfile
from typing import Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from docproc_spark.kernels.mediainfo import sniff_media_header
from docproc_spark.sources.ooxml import (
    OOXML_OUT_SCHEMA,
    parse_docx_bytes,
    parse_pptx_bytes,
    parse_xlsx_bytes,
)
from docproc_spark.sources.pdf import parse_pdf_bytes

__all__ = [
    "MEDIA_SIDECAR_SCHEMA",
    "MEDIA_ARRAY_TYPE",
    "INGEST_MEDIA_SCHEMA",
    "media_rows",
    "load_media_sidecar",
    "load_files_with_media",
    "media_table",
    "html_media_rows",
    "html_media_table",
    "warc_media_catalogue",
    "MEDIA_SIGNATURE_SCHEMA",
    "signature_rows",
    "load_media_signatures",
]

_META_KEYS = (
    "format",
    "media_kind",
    "width",
    "height",
    "duration_ms",
    "sample_rate",
    "channels",
)

MEDIA_SIDECAR_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("first_page", T.IntegerType(), True),
        T.StructField("n_refs", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("media_kind", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("parse_error", T.StringType(), True),
    ]
)


def _row(ref: str, facts: dict, first_page: int | None, n_refs: int) -> dict:
    return {
        "media_ref": ref,
        "name": facts.get("name"),
        "first_page": first_page,
        "n_refs": n_refs,
        "n_bytes": facts.get("n_bytes"),
        **{k: facts.get(k) for k in _META_KEYS},
        "parse_error": None,
    }


def _referenced_rows(
    spans: Iterable[tuple], facts: dict[str, dict]
) -> list[dict]:
    """Group a span stream's image refs: one row per distinct ref, page
    of first showing, count of showings — emission order of first
    showing (deterministic, mirrors the span table)."""
    first: dict[str, tuple[int, int]] = {}  # ref → (first_page, n_refs)
    order: list[str] = []
    for kind, _text, ref, page in spans:
        if kind != "image" or ref is None:
            continue
        if ref in first:
            fp, n = first[ref]
            first[ref] = (fp, n + 1)
        else:
            first[ref] = (page, 1)
            order.append(ref)
    return [
        _row(r, facts.get(r, {"name": None}), first[r][0], first[r][1])
        for r in order
    ]


# Per-member inflation cap for catalogue/signature walks: a zip entry
# DECLARES its uncompressed size, so a crafted 10 MB member inflating
# to 10 GB is rejected before z.read materializes it in executor
# memory. 64 MB covers any real embedded image/clip.
_MAX_MEMBER_BYTES = 64 * 1024 * 1024


def _package_rows(
    data: bytes, prefixes: tuple[str, ...], skip_refs: frozenset = frozenset()
) -> list[dict]:
    """Catalogue zip members under media prefixes (zip member order —
    deterministic). Members whose content hash is already catalogued as
    referenced are skipped; a corrupt member (CRC error) or one whose
    DECLARED uncompressed size exceeds the inflation cap still gets a
    row with its part name as the ref fallback (same contract as the
    span path). n_refs 0 = present in the package, never shown."""
    rows: list[dict] = []
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        for info in z.infolist():
            fname = info.filename
            if info.is_dir() or not fname.startswith(prefixes):
                continue
            if info.file_size > _MAX_MEMBER_BYTES:  # zip-bomb guard
                rows.append(
                    _row(
                        fname,
                        {"name": fname, "n_bytes": info.file_size},
                        None,
                        0,
                    )
                )
                continue
            try:
                blob = z.read(info)
            except Exception:
                rows.append(
                    _row(fname, {"name": fname, "n_bytes": None}, None, 0)
                )
                continue
            ref = hashlib.sha256(blob).hexdigest()
            if ref in skip_refs:
                continue
            rows.append(
                _row(
                    ref,
                    {
                        "name": fname,
                        "n_bytes": len(blob),
                        **sniff_media_header(blob),
                    },
                    None,
                    0,
                )
            )
    return rows


def media_rows(fmt: str, data: bytes) -> list[dict]:
    """All sidecar rows for one document's raw bytes; raises on a
    malformed file or unknown format (callers quarantine per doc)."""
    fmt = (fmt or "").lower().lstrip(".")
    if fmt == "epub":
        from docproc_spark.sources.epub import parse_epub_bytes

        facts: dict[str, dict] = {}
        spans = parse_epub_bytes(data, media_facts=facts)
        return _referenced_rows(spans, facts)
    if fmt == "pdf":
        facts: dict[str, dict] = {}
        spans = parse_pdf_bytes(data, media_facts=facts)
        return _referenced_rows(spans, facts)
    if fmt == "pptx":
        facts = {}
        spans = parse_pptx_bytes(data, media_facts=facts)
        rows = _referenced_rows(spans, facts)
        shown = frozenset(r["media_ref"] for r in rows)
        return rows + _package_rows(data, ("ppt/media/",), skip_refs=shown)
    if fmt == "docx":
        return _package_rows(data, ("word/media/",))
    if fmt in ("xlsx", "xlsm"):
        return _package_rows(data, ("xl/media/",))
    raise ValueError(f"unsupported media-sidecar format: {fmt!r}")


# the sidecar row as a nested struct (no doc_id — it's the row key of
# the carrying document row; no parse_error — the document row has one)
MEDIA_ARRAY_TYPE = T.ArrayType(
    T.StructType([f for f in MEDIA_SIDECAR_SCHEMA if f.name not in ("doc_id", "parse_error")])
)

# span-table contract (OOXML_OUT_SCHEMA) + the per-document media array
INGEST_MEDIA_SCHEMA = T.StructType(
    list(OOXML_OUT_SCHEMA) + [T.StructField("media", MEDIA_ARRAY_TYPE, True)]
)


def _spans_names_media(fmt: str, data: bytes):
    """One parse of one document's bytes → (spans, sheet_names, media
    rows). This is the single-pass core: the span parsers' media_facts
    sink fills while THEY walk, so raw bytes are read exactly once."""
    fmt = (fmt or "").lower().lstrip(".")
    facts: dict[str, dict] = {}
    if fmt == "pdf":
        spans = parse_pdf_bytes(data, media_facts=facts)
        return spans, None, _referenced_rows(spans, facts)
    if fmt == "pptx":
        spans = parse_pptx_bytes(data, media_facts=facts)
        rows = _referenced_rows(spans, facts)
        shown = frozenset(r["media_ref"] for r in rows)
        return (
            spans,
            None,
            rows + _package_rows(data, ("ppt/media/",), skip_refs=shown),
        )
    if fmt == "docx":
        return (
            parse_docx_bytes(data),
            None,
            _package_rows(data, ("word/media/",)),
        )
    if fmt in ("xlsx", "xlsm"):
        spans, names = parse_xlsx_bytes(data)
        return spans, names, _package_rows(data, ("xl/media/",))
    if fmt == "epub":
        from docproc_spark.sources.epub import parse_epub_bytes

        spans = parse_epub_bytes(data, media_facts=facts)
        return spans, None, _referenced_rows(spans, facts)
    raise ValueError(f"unsupported format: {fmt!r}")


def load_files_with_media(
    docs: DataFrame,
    *,
    doc_id_col: str = "doc_id",
    fmt_col: str = "fmt",
    content_col: str = "content",
) -> DataFrame:
    """(doc_id, fmt, content:binary) → span table + per-document
    ``media`` catalogue array (INGEST_MEDIA_SCHEMA) in ONE pass over the
    raw bytes.

    This is the 100-TB ingestion shape: ``load_files`` + a separate
    ``load_media_sidecar`` each run their own binaryFile scan — 2× IO
    over the whole corpus — while this kernel parses once and emits
    both, ready for one parquet checkpoint that every downstream
    consumer (extraction, media curation) scans cheaply. Spans/
    quarantine semantics are identical to load_ooxml/load_pdf; the
    media array nests the sidecar rows (explode with ``media_table``)."""
    import pandas as pd

    id_c, f_c, b_c = doc_id_col, fmt_col, content_col
    cols = [f.name for f in INGEST_MEDIA_SCHEMA]
    media_cols = [f.name for f in MEDIA_ARRAY_TYPE.elementType]

    def gen(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for did, fmt, blob in zip(pdf[id_c], pdf[f_c], pdf[b_c]):
                row = dict.fromkeys(cols)
                row["doc_id"] = did
                row["doc_type"] = (fmt or "").lower().lstrip(".")
                try:
                    raw, names, media = _spans_names_media(fmt, bytes(blob))
                    row["spans"] = [
                        {"kind": k, "text": t, "media_ref": m, "page": p,
                         "offset": i}
                        for i, (k, t, m, p) in enumerate(raw)
                    ]
                    row["n_spans"] = len(raw)
                    row["sheet_names"] = names
                    row["media"] = [
                        {c: r.get(c) for c in media_cols} for r in media
                    ]
                except Exception as e:  # noqa: BLE001 — per-doc quarantine
                    row["parse_error"] = f"{type(e).__name__}: {e}"
                out.append(row)
            yield pd.DataFrame(out, columns=cols)

    return docs.mapInPandas(gen, schema=INGEST_MEDIA_SCHEMA)


def media_table(ingested: DataFrame) -> DataFrame:
    """Explode an INGEST_MEDIA_SCHEMA frame (typically the post-
    checkpoint parquet scan) into the flat per-blob catalogue:
    (doc_id, media_ref, name, first_page, n_refs, n_bytes, format,
    media_kind, width, height, duration_ms, sample_rate, channels)."""
    import pyspark.sql.functions as F

    return ingested.where(F.col("media").isNotNull()).select(
        "doc_id", F.explode("media").alias("m")
    ).select("doc_id", "m.*")


def html_media_rows(
    raw_html: str | None, base_url: str | None = None
) -> list[dict]:
    """Sidecar rows for one HTML document — the images the density
    kernel would SHOW (chrome/beacon imgs excluded), identified exactly
    like its spans (data: payload sha256 / resolved URL). data: blobs
    carry size + container-header facts; URL images carry the resolved
    URL as ``name`` and the author-DECLARED width/height attributes
    (the only dimension facts available without a fetch). first_page is
    0 for every row (HTML has no pages)."""
    from docproc_spark.kernels.html import html_main_blocks

    facts: dict[str, dict] = {}
    blocks = html_main_blocks(raw_html or "", base_url, media_facts=facts)
    spans = [(k, t, m, 0) for k, t, m in blocks]
    return _referenced_rows(spans, facts)


def html_media_table(
    docs: DataFrame,
    *,
    doc_id_col: str = "doc_id",
    html_col: str = "raw_html",
    url_col: str | None = None,
) -> DataFrame:
    """(doc_id, raw_html [, url]) → media catalogue
    (MEDIA_SIDECAR_SCHEMA) for HTML/WARC document tables: one row per
    distinct shown image per document, identity-compatible with the
    extraction pipeline's image spans (join on media_ref). Pass
    ``url_col`` (e.g. the WARC-Target-URI) so relative srcs resolve to
    the same absolute identities the span path emits. One mapInPandas
    crossing, no shuffle; the kernel never raises on bad markup (a
    malformed document simply catalogues nothing), so there is no
    quarantine path — parse_error stays NULL."""
    import pandas as pd

    cols = [f.name for f in MEDIA_SIDECAR_SCHEMA]
    sel = [doc_id_col, html_col] + ([url_col] if url_col else [])

    def gen(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: list[dict] = []
            urls = pdf[url_col] if url_col else [None] * len(pdf)
            for did, html, url in zip(pdf[doc_id_col], pdf[html_col], urls):
                base = url if isinstance(url, str) and url else None
                raw = html if isinstance(html, str) else None
                for row in html_media_rows(raw, base):
                    out.append({"doc_id": did, **row})
            yield pd.DataFrame(out, columns=cols)

    return docs.select(*sel).mapInPandas(gen, schema=MEDIA_SIDECAR_SCHEMA)


def warc_media_catalogue(captures: DataFrame) -> DataFrame:
    """The web corpus's media catalogue with FETCHED facts: images shown
    by HTML captures (html_media_table over the extract-ready pages),
    enriched by joining each URL-identified ref to the archive's own
    capture of that URL — crawlers archive page assets alongside pages,
    and sources/warc.py sniffs every non-HTML payload's header while the
    bytes are in hand (``media_meta``). Declared <img> width/height
    attributes fill in only where no fetched fact exists.

    Output = MEDIA_SIDECAR_SCHEMA minus parse_error, plus
    ``payload_sha256`` (the blob's CONTENT identity when fetched — the
    key that unifies one image served from two URLs, NULL when the
    archive never captured the URL) and ``fetched`` (whether blob facts
    are real or declared-only).

    Scale shape: both sides are per-URL/per-ref tables, orders of
    magnitude smaller than payloads; the asset side dedupes to the
    newest capture per URL (one window over url), then one hash join on
    the ref — AQE broadcasts when small. No payload bytes move."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from docproc_spark.sources.warc import extractable_capture_col

    pages = captures.where(extractable_capture_col())
    shown = html_media_table(pages, url_col="url")
    assets = (
        captures.where(
            F.col("parse_error").isNull()
            & F.col("raw_html").isNull()
            & F.col("url").isNotNull()
            & F.col("payload_sha256").isNotNull()
            & (F.coalesce(F.col("http_status"), F.lit(200)) < 400)
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("url").orderBy(
                    F.col("fetch_time").desc_nulls_last(),
                    F.col("payload_sha256").desc(),
                )
            ),
        )
        .where(F.col("_rn") == 1)
        .select(
            F.col("url").alias("_aurl"),
            F.col("payload_sha256"),
            F.col("payload_len").alias("_alen"),
            F.col("media_meta").alias("_am"),
        )
    )
    joined = shown.join(
        assets, on=shown["media_ref"] == assets["_aurl"], how="left"
    )

    def pick(field: str):
        return F.coalesce(F.col(f"_am.{field}"), F.col(field)).alias(field)

    return joined.select(
        "doc_id",
        "media_ref",
        "name",
        "first_page",
        "n_refs",
        F.coalesce(F.col("_alen"), F.col("n_bytes")).alias("n_bytes"),
        pick("format"),
        pick("media_kind"),
        pick("width"),
        pick("height"),
        pick("duration_ms"),
        pick("sample_rate"),
        pick("channels"),
        F.col("payload_sha256"),
        F.col("_aurl").isNotNull().alias("fetched"),
    )


def load_media_sidecar(
    docs: DataFrame,
    *,
    doc_id_col: str = "doc_id",
    fmt_col: str = "fmt",
    content_col: str = "content",
) -> DataFrame:
    """(doc_id, fmt, content:binary) → media catalogue
    (MEDIA_SIDECAR_SCHEMA): one row per distinct embedded media blob per
    document. One ``mapInPandas`` pass, Arrow-batched, no shuffle; a
    malformed file quarantines as ONE all-null row with ``parse_error``
    (same per-document contract as load_ooxml / load_pdf), so the
    catalogue's doc_id set matches the ingest frame's."""
    from docproc_spark.sources.loaderutil import quarantined_binary_loader

    cols = [f.name for f in MEDIA_SIDECAR_SCHEMA]
    return quarantined_binary_loader(
        docs,
        MEDIA_SIDECAR_SCHEMA,
        (doc_id_col, fmt_col, content_col),
        lambda did, fmt, blob: (
            {"doc_id": did, **row} for row in media_rows(fmt, blob)
        ),
        lambda did, fmt, blob, e: {
            "doc_id": did,
            **{c: None for c in cols[1:]},
            "parse_error": f"{type(e).__name__}: {e}",
        },
    )


# ---------------------------------------------------------------------------
# perceptual-signature catalogue (pixel-level media identity)
# ---------------------------------------------------------------------------

MEDIA_SIGNATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("blob_format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("gray_mean", T.IntegerType(), True),
        T.StructField("dhash64", T.LongType(), True),
        T.StructField("ahash64", T.LongType(), True),
        T.StructField("decode_error", T.StringType(), True),
        T.StructField("parse_error", T.StringType(), True),
    ]
)

_ZIP_SIG_FMTS = ("docx", "pptx", "xlsx", "xlsm", "epub")


def _sig_row(ref: str, name: str | None, blob_format: str | None,
             sig: dict) -> dict:
    return {
        "media_ref": ref,
        "name": name,
        "blob_format": blob_format,
        "width": sig["width"],
        "height": sig["height"],
        "gray_mean": sig["gray_mean"],
        "dhash64": sig["dhash64"],
        "ahash64": sig["ahash64"],
        "decode_error": sig["decode_error"],
        "parse_error": None,
    }


def _null_sig(msg: str) -> dict:
    return {
        "width": None, "height": None, "gray_mean": None,
        "dhash64": None, "ahash64": None, "decode_error": msg,
    }


def signature_rows(fmt: str, data: bytes) -> list[dict]:
    """Perceptual-signature rows for one document's raw bytes: one row
    per distinct embedded image blob, keyed by the SAME sha256 identity
    as the span table and the sidecar catalogue — so pixel-level
    near-dup clusters join straight onto extraction output.

    Zip packages (docx/pptx/xlsx/xlsm/epub) walk every member and sign
    the ones whose bytes sniff as images. PDFs sign every /Subtype
    /Image XObject: container payloads (kept DCT = literal JPEG files,
    now REALLY decoded by the baseline-JPEG path) go through the
    container decoder; fully-undone filter chains are
    containerless rasters decoded straight from the dict's
    /Width /Height /BitsPerComponent + simple color space
    (kernels/imagepix.rgb_from_raw_samples — PNG-predictor output is
    already unfiltered by the stream decoder). Formats that genuinely
    need a native codec (JPX/CCITT/JBIG2, WEBP, arithmetic JPEG)
    yield a row with the reason in ``decode_error`` — the catalogue still learns the
    blob exists and is an image.

    Raises on a malformed file or unknown format (callers quarantine
    per document, mirroring media_rows)."""
    from docproc_spark.kernels.imagepix import (
        ImageDecodeError,
        image_signature,
        rgb_from_raw_samples,
        signature_from_rgb,
    )

    fmt = (fmt or "").lower().lstrip(".")
    rows: list[dict] = []
    if fmt in _ZIP_SIG_FMTS:
        seen: set[str] = set()
        with zipfile.ZipFile(io.BytesIO(data)) as z:
            for info in z.infolist():
                if info.is_dir():
                    continue
                if info.file_size > _MAX_MEMBER_BYTES:
                    continue  # declared-size zip-bomb guard: never inflate
                try:
                    blob = z.read(info)
                except Exception:
                    continue  # corrupt member: no pixels to sign
                meta = sniff_media_header(blob)
                if meta["media_kind"] != "image":
                    continue
                ref = hashlib.sha256(blob).hexdigest()
                if ref in seen:
                    continue
                seen.add(ref)
                rows.append(
                    _sig_row(
                        ref, info.filename, meta["format"],
                        image_signature(blob),
                    )
                )
        return rows
    if fmt == "pdf":
        from docproc_spark.sources.pdf import iter_image_blobs

        for ref, blob, info in iter_image_blobs(data):
            if info["format"] == "raw":
                try:
                    rgb = rgb_from_raw_samples(
                        blob, info["width"] or 0, info["height"] or 0,
                        info["color"], info["bpc"],
                    )
                    sig = signature_from_rgb(
                        rgb, info["width"], info["height"], "raw"
                    )
                except ImageDecodeError as exc:
                    sig = _null_sig(str(exc))
            else:
                sig = image_signature(blob)
            rows.append(_sig_row(ref, info["name"], info["format"], sig))
        return rows
    raise ValueError(f"unsupported media-signature format: {fmt!r}")


def load_media_signatures(
    docs: DataFrame,
    *,
    doc_id_col: str = "doc_id",
    fmt_col: str = "fmt",
    content_col: str = "content",
) -> DataFrame:
    """(doc_id, fmt, content:binary) → perceptual-signature catalogue
    (MEDIA_SIGNATURE_SCHEMA): one row per distinct embedded image blob
    per document with pixel-decoded dims and dHash/aHash fingerprints.
    Same shape as load_media_sidecar: one mapInPandas pass, Arrow
    batches, no shuffle, malformed files quarantine as one all-null
    row with ``parse_error``. Feed the result to
    functions/media.perceptual_dup_clusters for corpus-wide template /
    re-encoded-logo detection over INGESTED documents."""
    from docproc_spark.sources.loaderutil import quarantined_binary_loader

    cols = [f.name for f in MEDIA_SIGNATURE_SCHEMA]
    return quarantined_binary_loader(
        docs,
        MEDIA_SIGNATURE_SCHEMA,
        (doc_id_col, fmt_col, content_col),
        lambda did, fmt, blob: (
            {"doc_id": did, **row} for row in signature_rows(fmt, blob)
        ),
        lambda did, fmt, blob, e: {
            "doc_id": did,
            **{c: None for c in cols[1:]},
            "parse_error": f"{type(e).__name__}: {e}",
        },
    )
