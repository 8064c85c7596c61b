"""Table I/O behind one switchable module.

The reference has no file-format layer (graphs enter via in-memory wrappers
or the dask CSR loader, ``core/dask/loader.py:15-74``); our durable story is
columnar tables. Iceberg is the north-rule target; this sandbox has no
Iceberg runtime jar, so parquet-with-same-layout is the default and the
format is a config switch — call sites never name a format.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.spark.SparkCatalog  # noqa: B018
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one named table from an sf directory (parquet layout) or an
    Iceberg catalog path when configured via ``SPARK_GRAFT_ICEBERG_NS``."""
    ns = os.environ.get("SPARK_GRAFT_ICEBERG_NS")
    if ns and _iceberg_available(spark):
        return spark.read.format("iceberg").load(f"{ns}.{name}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def write_table(
    df: DataFrame, path: str, mode: str = "overwrite", table: str | None = None
) -> None:
    """Write ``df`` to ``path`` (parquet), or — when an Iceberg catalog is
    configured — to the logical table ``table`` (defaulting to a valid
    identifier derived from the path's basename, since callers pass
    filesystem paths). ``mode`` is honored in both branches."""
    spark = df.sparkSession
    ns = os.environ.get("SPARK_GRAFT_ICEBERG_NS")
    if ns and _iceberg_available(spark):
        ident = table or re.sub(
            r"[^A-Za-z0-9_]", "_",
            os.path.basename(path.rstrip("/")).removesuffix(".parquet"),
        )
        writer = df.writeTo(f"{ns}.{ident}")
        if mode == "append":
            writer.append()
        else:
            writer.createOrReplace()
        return
    df.write.mode(mode).parquet(path)
