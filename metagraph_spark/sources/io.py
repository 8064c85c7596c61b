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


def _iceberg_ident(path: str) -> str:
    """Sanitized Iceberg table identifier derived from the FULL path —
    distinct paths with the same basename must land in distinct tables.
    Prefixed when the sanitized form would start with a digit (invalid
    unquoted identifier)."""
    ident = re.sub(
        r"[^A-Za-z0-9_]", "_",
        path.rstrip("/").removesuffix(".parquet").lstrip("/"),
    )
    if ident and ident[0].isdigit():
        ident = "t_" + ident
    return ident


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one named table from an sf directory (parquet layout) or an
    Iceberg catalog path when configured via ``SPARK_GRAFT_ICEBERG_NS``.
    The Iceberg identifier is derived from the same full path
    :func:`write_table` uses, so write→read round-trips."""
    ns = os.environ.get("SPARK_GRAFT_ICEBERG_NS")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if ns and _iceberg_available(spark):
        return spark.read.format("iceberg").load(f"{ns}.{_iceberg_ident(path)}")
    return spark.read.parquet(path)


def write_table(
    df: DataFrame, path: str, mode: str = "overwrite", table: str | None = None
) -> None:
    """Write ``df`` to ``path`` (parquet), or — when an Iceberg catalog is
    configured — to the logical table ``table``. Without an explicit
    ``table``, the identifier is derived from the FULL path (sanitized),
    not just the basename: two runs writing ``.../run_a/edges.parquet``
    and ``.../run_b/edges.parquet`` must land in distinct tables, not
    silently clobber each other. Only ``append``/``overwrite`` are valid
    under Iceberg — other modes ("error", "ignore") have no
    non-destructive mapping onto ``createOrReplace`` and are rejected."""
    spark = df.sparkSession
    ns = os.environ.get("SPARK_GRAFT_ICEBERG_NS")
    if ns and _iceberg_available(spark):
        if table is None:
            table = _iceberg_ident(path)
        if mode == "append":
            df.writeTo(f"{ns}.{table}").append()
        elif mode == "overwrite":
            df.writeTo(f"{ns}.{table}").createOrReplace()
        else:
            raise ValueError(
                f"Iceberg write supports mode 'append' or 'overwrite', "
                f"got {mode!r} (no non-destructive createOrReplace mapping)"
            )
        return
    df.write.mode(mode).parquet(path)
