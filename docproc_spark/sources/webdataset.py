"""WebDataset tar-shard ingestion — the multimodal training format.

Large image-text corpora (LAION-scale) ship as WebDataset: .tar shards
whose members group into samples by key — `000123.jpg`, `000123.txt`,
`000123.json` are ONE sample; the key is the member path up to the
FIRST dot, the extension everything after it. Samples are stored with
their members consecutive, but this reader groups by key over the
whole shard so reordered archives still parse.

Each sample becomes one row: the text member (`.txt`), the metadata
member (`.json`, kept as its raw string — schema-free by design), and
every other member as a media entry with sha256-of-bytes identity plus
codec-free header facts (kernels/mediainfo) — the same catalogue shape
as the office/PDF sidecar, so dimension gates, dedupe, and media
reports compose unchanged.

``wds_documents`` lowers samples onto the shared span table: the
caption as a text span, each media member as an image/audio span in
member order — a WDS sample IS a small interleaved document, and this
makes it extractable/curatable by the exact machinery the rest of the
corpus uses.

Scale shape: one binaryFile scan over shards (one shard per task — the
WebDataset contract sizes shards for exactly this), one mapInPandas
crossing, bounded 2048-row chunks, zero shuffle. A corrupt shard
quarantines as one row; a corrupt MEMBER quarantines its sample only.
"""

from __future__ import annotations

import hashlib
import io
import tarfile
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from docproc_spark.kernels.mediainfo import sniff_media_header

__all__ = ["WDS_SAMPLE_SCHEMA", "iter_wds_samples", "load_webdataset",
           "wds_documents", "wds_media_table", "export_webdataset_text",
           "iter_wds_signatures", "load_wds_signatures"]

_TEXT_EXTS = ("txt", "text", "caption")
_JSON_EXTS = ("json",)

_MEDIA_ENTRY = T.StructType(
    [
        T.StructField("ext", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("media_kind", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
    ]
)

WDS_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("shard", T.StringType(), True),
        T.StructField("key", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("meta_json", T.StringType(), True),
        T.StructField("media", T.ArrayType(_MEDIA_ENTRY), True),
        T.StructField("parse_error", T.StringType(), True),
    ]
)


def _split_key(name: str) -> tuple[str, str]:
    """(key, ext) per the WebDataset rule: key = path up to the FIRST
    dot of the BASENAME (directories may contain dots), ext = the rest,
    lowercased."""
    d, _, base = name.rpartition("/")
    stem, dot, ext = base.partition(".")
    key = f"{d}/{stem}" if d else stem
    return key, ext.lower() if dot else ""


def iter_wds_samples(data: bytes, shard: str) -> Iterator[dict]:
    """WDS_SAMPLE_SCHEMA dicts for one shard's bytes, in first-seen key
    order. Raises on an unreadable archive (caller quarantines the
    shard); a member that fails to read quarantines only its sample."""
    samples: dict[str, dict] = {}
    order: list[str] = []
    with tarfile.open(fileobj=io.BytesIO(data)) as tf:
        for member in tf:
            if not member.isfile():
                continue
            key, ext = _split_key(member.name)
            if key not in samples:
                order.append(key)
                samples[key] = {
                    "doc_id": f"{shard}#{key}",
                    "shard": shard,
                    "key": key,
                    "text": None,
                    "meta_json": None,
                    "media": [],
                    "parse_error": None,
                }
            row = samples[key]
            try:
                blob = tf.extractfile(member).read()
            except Exception as e:  # noqa: BLE001 — per-sample quarantine
                row["parse_error"] = f"{type(e).__name__}: {e}"
                continue
            if ext in _TEXT_EXTS:
                row["text"] = blob.decode("utf-8", "replace")
            elif ext in _JSON_EXTS:
                row["meta_json"] = blob.decode("utf-8", "replace")
            else:
                meta = sniff_media_header(blob)
                row["media"].append(
                    {
                        "ext": ext or None,
                        "media_ref": hashlib.sha256(blob).hexdigest(),
                        "n_bytes": len(blob),
                        **meta,
                    }
                )
    for key in order:
        yield samples[key]


def load_webdataset(
    files: DataFrame,
    *,
    doc_id_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """(shard_id, content:binary) per .tar shard → one row per sample
    (WDS_SAMPLE_SCHEMA). One mapInPandas crossing, bounded chunks, zero
    shuffle; a corrupt shard yields ONE quarantine row."""
    from docproc_spark.sources.loaderutil import quarantined_binary_loader

    cols = [f.name for f in WDS_SAMPLE_SCHEMA]
    return quarantined_binary_loader(
        files,
        WDS_SAMPLE_SCHEMA,
        (doc_id_col, content_col),
        lambda fid, blob: iter_wds_samples(blob, fid),
        lambda fid, blob, e: {
            "doc_id": fid,
            "shard": fid,
            **{c: None for c in cols[2:-1]},
            "parse_error": f"{type(e).__name__}: {e}",
        },
    )


def wds_media_table(samples: DataFrame) -> DataFrame:
    """Samples → the flat per-blob catalogue (same column set as the
    document sidecar's media_table: doc_id, media_ref, name, first_page,
    n_refs, n_bytes + header facts) so WDS shards feed the SAME media
    reports, dimension gates, and dedupe as every other source. `name`
    carries the member extension (WDS's only naming), first_page is
    NULL (samples have no pages), n_refs is 1 per member."""
    return (
        samples.where(
            F.col("parse_error").isNull() & F.col("media").isNotNull()
        )
        .select("doc_id", F.explode("media").alias("m"))
        .select(
            "doc_id",
            F.col("m.media_ref").alias("media_ref"),
            F.col("m.ext").alias("name"),
            F.lit(None).cast("int").alias("first_page"),
            F.lit(1).cast("int").alias("n_refs"),
            F.col("m.n_bytes").alias("n_bytes"),
            F.col("m.format").alias("format"),
            F.col("m.media_kind").alias("media_kind"),
            F.col("m.width").alias("width"),
            F.col("m.height").alias("height"),
            F.col("m.duration_ms").alias("duration_ms"),
            F.col("m.sample_rate").alias("sample_rate"),
            F.col("m.channels").alias("channels"),
        )
    )


def export_webdataset_text(
    docs: DataFrame,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "markdown",
    meta_cols: tuple[str, ...] = (),
) -> None:
    """Write a TEXT corpus as WebDataset shards — the handoff format a
    training loader consumes: one ``shard-{pid:05d}.tar`` per partition
    (repartition upstream to size shards; the WebDataset contract is
    one-shard-per-reader-task), each document a ``{key}.txt`` member
    plus a ``{key}.json`` metadata member built from ``meta_cols``.
    Keys are the doc id with '/' flattened (tar member names must not
    re-introduce directories) and '.' replaced (everything after the
    first dot would parse as the extension on re-read).

    Executor-side via foreachPartition onto a shared filesystem, like
    the markdown exporter; round-trips through ``load_webdataset`` (the
    test's invariant). Deterministic per partition: member order is row
    order, mtimes pinned to 0."""
    import json as _json
    import os

    os.makedirs(out_dir, exist_ok=True)
    cols = [id_col, text_col, *meta_cols]

    def write_partition(rows):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"shard-{pid:05d}.tar")
        wrote = False
        with tarfile.open(path, "w") as tf:

            def add(name: str, blob: bytes) -> None:
                info = tarfile.TarInfo(name)
                info.size = len(blob)
                info.mtime = 0
                tf.addfile(info, io.BytesIO(blob))

            for r in rows:
                wrote = True
                key = (
                    str(r[id_col]).replace("/", "_").replace(".", "_")
                )
                add(f"{key}.txt", (r[text_col] or "").encode("utf-8"))
                meta = {c: r[c] for c in meta_cols}
                meta["doc_id"] = r[id_col]
                add(
                    f"{key}.json",
                    _json.dumps(meta, sort_keys=True).encode("utf-8"),
                )
        if not wrote:
            os.remove(path)  # no empty shards

    docs.select(*cols).foreachPartition(write_partition)


def wds_documents(samples: DataFrame) -> DataFrame:
    """Samples → the shared span table (OOXML_OUT_SCHEMA, doc_type
    'wds'): caption text as a text span, each media member as a media
    span (media_ref = blob sha256) in member order — the WDS sample as
    a small interleaved document, extractable and curatable by the same
    machinery as everything else. The span model's media kinds are
    image/figure, so image-kind blobs map to 'image' and everything
    else (audio/video/unknown) to 'figure' — both are media to every
    downstream operator, and the catalogue's media_kind keeps the
    truth. Pure column program (no Python): one transform over the
    nested media array."""
    from docproc_spark.sources.ooxml import OOXML_OUT_SCHEMA

    span_t = OOXML_OUT_SCHEMA["spans"].dataType
    text_span = F.expr(
        "IF(text IS NOT NULL AND length(trim(text)) > 0,"
        " array(named_struct('kind', 'text', 'text', text,"
        "   'media_ref', CAST(NULL AS STRING), 'page', 0, 'offset', 0)),"
        " array())"
    )
    media_spans = F.expr(
        "transform(coalesce(media, array()), (m, i) -> named_struct("
        " 'kind', IF(m.media_kind IS NULL OR m.media_kind <> 'image',"
        "   'figure', 'image'),"
        " 'text', CAST(NULL AS STRING),"
        " 'media_ref', m.media_ref, 'page', 0, 'offset', 0))"
    )
    spans = F.expr(
        "transform(_all_spans, (s, i) -> named_struct('kind', s.kind,"
        " 'text', s.text, 'media_ref', s.media_ref, 'page', s.page,"
        " 'offset', i))"
    )
    return (
        samples.where(F.col("parse_error").isNull())
        .withColumn("_all_spans", F.concat(text_span, media_spans))
        .select(
            "doc_id",
            F.lit("wds").alias("doc_type"),
            F.lit(None).cast("string").alias("raw_html"),
            spans.cast(span_t).alias("spans"),
            F.size("_all_spans").cast("long").alias("n_spans"),
            F.lit(None).cast("array<string>").alias("sheet_names"),
            F.lit(None).cast("string").alias("parse_error"),
        )
    )


def iter_wds_signatures(data: bytes, shard: str) -> Iterator[dict]:
    """Perceptual-signature rows (media_sidecar.MEDIA_SIGNATURE_SCHEMA
    minus doc_id prefixing) for one shard's image members — sha256
    identity equal to the sample table's media_ref, pixel decode via
    kernels/imagepix (PNG/BMP/GIF and baseline+progressive JPEG:
    exactly the formats LAION-style shards carry). Raises on an
    unreadable archive."""
    from docproc_spark.kernels.imagepix import image_signature
    from docproc_spark.sources.media_sidecar import (
        _MAX_MEMBER_BYTES,
        _sig_row,
    )

    with tarfile.open(fileobj=io.BytesIO(data)) as tf:
        seen: set[tuple[str, str]] = set()
        for member in tf:
            if not member.isfile() or member.size > _MAX_MEMBER_BYTES:
                continue
            key, ext = _split_key(member.name)
            if ext in _TEXT_EXTS or ext in _JSON_EXTS:
                continue
            try:
                blob = tf.extractfile(member).read()
            except Exception:
                continue  # the sample loader records the quarantine
            meta = sniff_media_header(blob)
            if meta["media_kind"] != "image":
                continue
            ref = hashlib.sha256(blob).hexdigest()
            if (key, ref) in seen:
                continue
            seen.add((key, ref))
            yield {
                "doc_id": f"{shard}#{key}",
                **_sig_row(
                    ref, ext or None, meta["format"], image_signature(blob)
                ),
            }


def load_wds_signatures(
    files: DataFrame,
    *,
    doc_id_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """(shard_id, content:binary) per .tar shard → the perceptual-
    signature catalogue for every image member
    (media_sidecar.MEDIA_SIGNATURE_SCHEMA, doc_id = shard#key): REAL
    pixel-decoded dims + dHash/aHash under the same sha256 identity as
    ``load_webdataset``'s media entries — so one
    functions/media.perceptual_dup_clusters pass dedupes WDS shards,
    office documents, and PDFs together. One mapInPandas crossing per
    shard, zero shuffle; a corrupt shard yields ONE quarantine row.

    The ``blob_format`` column carries the DECODED format; join on
    media_ref to the sample table for the declared ext/header facts.
    """
    from docproc_spark.sources.loaderutil import quarantined_binary_loader
    from docproc_spark.sources.media_sidecar import MEDIA_SIGNATURE_SCHEMA

    cols = [f.name for f in MEDIA_SIGNATURE_SCHEMA]
    return quarantined_binary_loader(
        files,
        MEDIA_SIGNATURE_SCHEMA,
        (doc_id_col, content_col),
        lambda fid, blob: iter_wds_signatures(blob, fid),
        lambda fid, blob, e: {
            "doc_id": fid,
            **{c: None for c in cols[1:]},
            "parse_error": f"{type(e).__name__}: {e}",
        },
    )
