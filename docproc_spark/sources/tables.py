"""Table loaders for the driver-provided parquet star schema.

Parquet scans get predicate pushdown + column pruning from Catalyst for
free; these helpers only centralize paths and names. Iceberg is the
production catalog (snapshots power the lineage/resume design in
sources/lineage.py) — its runtime jar is not in this container, so the
writer falls back to plain parquet behind try-import.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    d = sf_dir or DEFAULT_SF_DIR
    return spark.read.parquet(f"{d}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str | None = None, tables=TABLES) -> None:
    for t in tables:
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg runtime classes are actually loadable.

    NOT a bare attribute probe: py4j resolves a missing class path to a
    JavaPackage object without raising, so
    ``spark._jvm.org.apache.iceberg...`` "succeeds" on every cluster and
    the parquet fallback became dead code (verified live in this
    Iceberg-less container). Class.forName is the honest check — it
    raises ClassNotFoundException through py4j when the jar is absent."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.catalog.Catalog")
        return True
    except Exception:
        return False


def _is_table_identifier(target: str) -> bool:
    """catalog.db.table / db.table identifiers go to writeTo(); anything
    path-shaped (absolute or relative paths, file:/ s3a:// hdfs:// URIs)
    is a filesystem destination. startswith('/') misrouted relative paths
    and every URI scheme to the Iceberg branch."""
    import re

    return bool(
        re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*){1,2}", target)
    )


def write_table(df: DataFrame, path_or_table: str, mode: str = "overwrite") -> None:
    """Write to Iceberg when the runtime is present AND the target is a
    table identifier, else parquet to the path."""
    spark = df.sparkSession
    if _is_table_identifier(path_or_table) and iceberg_available(spark):
        df.writeTo(path_or_table).createOrReplace()
    else:
        df.write.mode(mode).parquet(path_or_table)
