"""Streaming extraction ingestion — resumable document ETL.

The batch pipeline's lineage table (sources/lineage.py) resumes ONE run
from its per-partition checkpoints; this module makes ingestion itself a
continuously-resumable job with Spark-native machinery: Structured
Streaming's file-source checkpoint tracks which input files are committed,
``foreachBatch`` runs the full batch ``extract()`` over each micro-batch
(documents arrive row-complete, so per-document extraction needs no
cross-batch state — the stateless-foreachBatch shape, not a stateful
operator), and every batch writes to its own deterministic
``batch_id=N`` subdirectory so a retried batch OVERWRITES its own partial
output instead of appending duplicates. Checkpoint + idempotent batch
output = exactly-once file results across restarts.

Per-document semantics are the batch pipeline's, unchanged — a
foreachBatch frame is a plain static DataFrame, so the span-sequence
equality oracle (tests/test_pipeline_oracle.py) applies to the streaming
path verbatim; tests assert streaming output == batch extract output.

Reference parity: the Spark-native replacement for the reference's
resume-on-rerun batch loop (docproc/pipeline.py: skip already-written
outputs); here the "already done" bookkeeping is the streaming
checkpoint, which also survives a mid-batch crash.

At 100 TB: the file source admits ``maxFilesPerTrigger`` so a backfill
over an arbitrarily large corpus proceeds in bounded micro-batches (each
a normal distributed extract), and a crashed run resumes at the first
uncommitted batch instead of rescanning committed input.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery



def _checkpoint_query_id(checkpoint_dir: str) -> str | None:
    """The streaming query id Spark records in <ckpt>/metadata — stable
    across restarts of the same checkpoint, different for a re-created
    one. None for a fresh (not-yet-started) checkpoint."""
    p = os.path.join(checkpoint_dir, "metadata")
    try:
        with open(p) as f:
            return json.load(f).get("id")
    except (OSError, ValueError):
        return None


def _guard_output_lineage(output_dir: str, checkpoint_dir: str) -> None:
    """Refuse to mix output lineages. Batch numbering restarts at 0 under
    a fresh checkpoint, and a shorter re-run only overwrites the batch_id
    dirs it reaches — stale higher-numbered dirs from a previous lineage
    would silently ride along in spark.read.parquet(output_dir). The
    output dir records its checkpoint's query id (_lineage/_checkpoint
    .json); a mismatch, or pre-existing batch dirs under a fresh
    checkpoint, is an error, not a silent merge. A marker-less output
    WITH batch dirs under an EXISTING checkpoint is adopted (the
    pre-marker layout, and the crash window between batch write and
    marker write)."""
    cid = _checkpoint_query_id(checkpoint_dir)
    marker_p = os.path.join(output_dir, "_lineage", "_checkpoint.json")
    marker = None
    try:
        with open(marker_p) as f:
            marker = json.load(f)
    except (OSError, ValueError):
        pass
    has_batches = os.path.isdir(output_dir) and any(
        name.startswith("batch_id=") for name in os.listdir(output_dir)
    )
    if marker is not None:
        if cid is None:
            raise ValueError(
                f"{output_dir} carries lineage from checkpoint query "
                f"{marker.get('query_id')!r}, but {checkpoint_dir} is a "
                "fresh checkpoint — its batch numbering restarts at 0 and "
                "stale batch_id dirs would silently duplicate. Use a new "
                "output_dir (or restore the original checkpoint)."
            )
        if marker.get("query_id") != cid:
            raise ValueError(
                f"{output_dir} belongs to checkpoint query "
                f"{marker.get('query_id')!r}, not {cid!r} — refusing to "
                "mix output lineages."
            )
    elif has_batches and cid is None:
        raise ValueError(
            f"{output_dir} already contains batch_id dirs but no lineage "
            f"marker, and {checkpoint_dir} is fresh — stale batches would "
            "silently merge. Use a new output_dir."
        )


def _write_output_marker(output_dir: str, checkpoint_dir: str) -> None:
    cid = _checkpoint_query_id(checkpoint_dir)
    if cid is None:
        return
    ldir = os.path.join(output_dir, "_lineage")
    os.makedirs(ldir, exist_ok=True)
    final = os.path.join(ldir, "_checkpoint.json")
    if os.path.exists(final):
        return
    tmp = f"{final}.tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"query_id": cid}, f)
    os.replace(tmp, final)


def extract_stream(
    spark: SparkSession,
    source_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    *,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    processing_time: str = "30 seconds",
    extract_kwargs: dict | None = None,
    query_name: str = "extract_stream",
) -> StreamingQuery:
    """Start the streaming extraction job over a parquet documents dir.

    ``available_now=True`` (default) drains everything currently in
    ``source_dir`` and stops — the backfill/batch-resume mode; False runs
    continuously with a ``processing_time`` trigger (the tail-ingestion
    mode). ``max_files_per_trigger`` bounds micro-batch size either way.

    Output layout: ``output_dir/batch_id=N/*.parquet`` — a Spark
    partition directory, so ``spark.read.parquet(output_dir)`` returns
    the full result with a ``batch_id`` lineage column. Each batch's
    write is ``overwrite`` into its own directory: replaying batch N
    after a crash replaces its partial output (idempotent), never
    duplicates it.

    The schema is taken from a static peek at ``source_dir`` (the file
    source requires an explicit schema); the directory must exist and
    contain at least one parquet file when the query starts.
    """
    from docproc_spark.pipeline import extract

    kwargs = dict(extract_kwargs or {})
    _guard_output_lineage(output_dir, checkpoint_dir)
    schema = spark.read.parquet(source_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        if max_files_per_trigger <= 0:
            raise ValueError("max_files_per_trigger must be positive")
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(source_dir)

    def _do_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Observation

        _write_output_marker(output_dir, checkpoint_dir)
        t0 = time.monotonic()
        # metrics piggyback on the write job itself (Observation) — no
        # second pass over the batch
        obs = Observation(f"extract_stream_b{batch_id}")
        out = extract(batch_df, **kwargs).observe(
            obs,
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size("spans")).alias("n_spans"),
            F.sum("n_pages").alias("n_pages"),
        )
        out.write.mode("overwrite").parquet(
            os.path.join(output_dir, f"batch_id={batch_id}")
        )
        wall = time.monotonic() - t0
        m = obs.get
        n_docs = int(m["n_docs"] or 0)
        rec = {
            "batch_id": int(batch_id),
            "n_docs": n_docs,
            "n_spans": int(m["n_spans"] or 0),
            "n_pages": int(m["n_pages"] or 0),
            "wall_s": round(wall, 3),
            "docs_per_sec": round(n_docs / wall, 2) if wall > 0 else None,
        }
        # one small json per batch under an underscore-prefixed dir
        # (parquet readers of output_dir ignore _-prefixed paths); a
        # REPLAYED batch overwrites its own record — lineage mirrors the
        # idempotent data write. tmp+rename so readers never see a torn
        # file.
        ldir = os.path.join(output_dir, "_lineage")
        os.makedirs(ldir, exist_ok=True)
        final = os.path.join(ldir, f"batch-{batch_id}.json")
        tmp = f"{final}.tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, final)

    writer = (
        docs.writeStream.foreachBatch(_do_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def run_extract_stream_once(
    spark: SparkSession,
    source_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    *,
    max_files_per_trigger: int | None = None,
    extract_kwargs: dict | None = None,
    timeout_s: float = 600.0,
) -> DataFrame:
    """Drain ``source_dir`` to completion (availableNow) and return the
    accumulated output as a batch DataFrame (empty-schema output dirs —
    a drain that found nothing new — return the previous runs' rows).
    Re-running with the same ``checkpoint_dir`` only processes files
    added since the last run: the resume contract."""
    q = extract_stream(
        spark,
        source_dir,
        output_dir,
        checkpoint_dir,
        max_files_per_trigger=max_files_per_trigger,
        available_now=True,
        extract_kwargs=extract_kwargs,
    )
    try:
        if not q.awaitTermination(timeout_s):
            raise TimeoutError(
                f"extract_stream did not drain within {timeout_s}s"
            )
    finally:
        if q.isActive:
            q.stop()
    if q.exception() is not None:
        raise q.exception()
    return spark.read.parquet(output_dir)


def stream_lineage(output_dir: str) -> list[dict]:
    """The per-batch lineage records written by extract_stream, sorted by
    batch_id — the resumable-run audit trail (what ran, how many docs and
    spans, at what throughput)."""
    ldir = os.path.join(output_dir, "_lineage")
    if not os.path.isdir(ldir):
        return []
    out = []
    for name in os.listdir(ldir):
        if name.startswith("batch-") and name.endswith(".json"):
            with open(os.path.join(ldir, name)) as f:
                out.append(json.load(f))
    return sorted(out, key=lambda r: r["batch_id"])
