"""Provider-backed media captioning over a table.

The distributed form of the reference's per-image vision calls
(vision_llm.py:432-482: ThreadPoolExecutor over extract_images_with_vision):
one CaptionProvider instance per executor partition (iterator-form
mapInPandas — the reference's provider instance cache, factory.py:73-80,
lives on each executor), pandas-Series batches through caption_batch, so
the deterministic stub and a real batching-vision HTTP stack share one
code path. Map-only: no shuffle, provider latency parallelizes with the
cluster exactly like the reference's thread pool but elastically.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def caption_media_table(
    media: DataFrame,
    *,
    ref_col: str = "media_ref",
    ctx_col: str = "context",
    provider_id: str = "stub",
) -> DataFrame:
    """(ref_col, ctx_col, caption) — one caption per input row.

    Failure semantics follow the provider (BatchingVisionProvider blanks
    timed-out batches and logs; the stub is pure). Input rows pass
    through; dedupe refs upstream if the table carries repeats — the
    engine's content-hash dedupe (pipeline M8) already guarantees one row
    per distinct ref on its own output.
    """
    ref_field = media.schema[ref_col]
    ctx_field = media.schema[ctx_col]
    out_schema = T.StructType(
        [
            T.StructField(ref_col, ref_field.dataType, ref_field.nullable),
            T.StructField(ctx_col, ctx_field.dataType, ctx_field.nullable),
            T.StructField("caption", T.StringType(), True),
        ]
    )

    def kernel(batches):
        from docproc_spark.providers import get_provider

        provider = get_provider(provider_id)
        for pdf in batches:
            yield pd.DataFrame(
                {
                    ref_col: pdf[ref_col],
                    ctx_col: pdf[ctx_col],
                    "caption": provider.caption_batch(pdf[ref_col], pdf[ctx_col]),
                }
            )

    return media.select(ref_col, ctx_col).mapInPandas(kernel, schema=out_schema)
