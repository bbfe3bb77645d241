"""LLM refine stage over a document table.

The distributed form of the reference's refine orchestration
(/root/reference/docproc/refiners/llm_refine.py:156-201): per document,
chunk at [Page N] boundaries (≤80k chars), one provider.chat call per
chunk, strip + "\n\n" rejoin, any failure → raw text. The provider is
resolved per executor PARTITION inside iterator-form mapInPandas (one
instance, reused across Arrow batches — the reference's instance cache,
factory.py:73-80, lives on each executor), so the deterministic stub and a
real HTTP model share one code path.

Scale shape: map-only — no shuffle, no driver involvement; per-doc work is
linear in text length; a real provider's latency parallelizes across
partitions exactly like the reference's thread pool (vision_llm.py:448-482)
but elastically with the cluster.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from docproc_spark.kernels.refine import CHUNK_CHARS, refine_with_provider


def refine_table(
    docs: DataFrame,
    text_col: str = "markdown",
    id_col: str = "doc_id",
    provider_id: str = "stub-chat",
    chunk_chars: int = CHUNK_CHARS,
) -> DataFrame:
    """→ (id_col, refined). Failure semantics are per-document: a provider
    error yields that document's raw text, never a failed task."""
    id_field = docs.schema[id_col]
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType, id_field.nullable),
            T.StructField("refined", T.StringType(), True),
        ]
    )

    def kernel(batches):
        from docproc_spark.providers import get_provider

        provider = get_provider(provider_id)
        for pdf in batches:
            refined = pdf[text_col].map(
                lambda t: refine_with_provider(t, provider, chunk_chars)
            )
            yield pd.DataFrame({id_col: pdf[id_col], "refined": refined})

    return docs.select(id_col, text_col).mapInPandas(kernel, schema=out_schema)
