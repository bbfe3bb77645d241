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
    try:
        spark._jvm.org.apache.iceberg.catalog.Catalog  # noqa: B018
        return True
    except Exception:
        return False


def write_table(df: DataFrame, path_or_table: str, mode: str = "overwrite") -> None:
    """Write to Iceberg when the runtime is present, else parquet."""
    spark = df.sparkSession
    if iceberg_available(spark) and not path_or_table.startswith("/"):
        df.writeTo(path_or_table).createOrReplace()
    else:
        df.write.mode(mode).parquet(path_or_table)
