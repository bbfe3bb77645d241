"""Shared mapInPandas harness for binary-file row loaders.

Four loaders (WebDataset samples + signatures, the media sidecar, the
signature catalogue) share one execution shape: for each input row
carrying raw bytes, stream out dict rows in bounded chunks, and fold
any per-file failure into ONE quarantine row instead of a task error.
The copies had already started drifting (different null-fill slices);
this is the single implementation.
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def quarantined_binary_loader(
    files: DataFrame,
    schema: T.StructType,
    sel: tuple[str, ...],
    rows_for: Callable[..., Iterable[dict]],
    quarantine_for: Callable[..., dict],
    chunk: int = 2048,
) -> DataFrame:
    """mapInPandas over ``files``: per input row, zip the ``sel``
    columns into ``rows_for(*vals)`` and stream its dict rows out in
    ``chunk``-row DataFrames; an exception anywhere in the iteration
    yields ``quarantine_for(*vals, exc)`` as one row. Binary columns
    arrive as ``bytes`` (Arrow hands back bytearray), ids as ``str``.
    One CPU pass, zero shuffles."""
    import pandas as pd

    cols = [f.name for f in schema]

    def _coerce(v):
        if isinstance(v, (bytes, bytearray, memoryview)):
            return bytes(v)
        return str(v) if v is not None else None

    def gen(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for vals in zip(*(pdf[c] for c in sel)):
                vals = tuple(_coerce(v) for v in vals)
                out: list[dict] = []
                try:
                    for row in rows_for(*vals):
                        out.append(row)
                        if len(out) >= chunk:
                            yield pd.DataFrame(out, columns=cols)
                            out = []
                except Exception as e:  # noqa: BLE001 — per-file quarantine
                    out.append(quarantine_for(*vals, e))
                if out:
                    yield pd.DataFrame(out, columns=cols)

    return files.mapInPandas(gen, schema=schema)
