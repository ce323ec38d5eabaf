"""CSV ingestion with batch lineage — the raw layer.

Replicates the reference loader's observable behavior
(scripts/load_csvs_to_duckdb.py:39-77):

- one UTC batch timestamp per run, stamped on every row (``ingested_at``)
- the source filename stamped per row (``source_file``)
- ``replace`` mode = create-or-replace (S2); ``append`` mode = insert
  into existing table, creating it empty-first if missing (S3+S4).

Deviation from the reference (deliberate): schemas are EXPLICIT
(StructType), not inferred — inference differences across engines are a
correctness hazard (SURVEY §1.3). Pass ``schema=None`` to opt into
header+inferSchema for ad-hoc use.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .tables import Warehouse


def ingest_csv(
    wh: Warehouse,
    csv_path: str,
    table: str,
    schema: T.StructType | None = None,
    mode: str = "replace",
    batch_ts: datetime | None = None,
    raw_schema: str = "raw",
) -> DataFrame:
    """Read one CSV into ``raw.<table>`` with lineage columns.

    At 100 TB this is a plain distributed CSV->parquet job: executors
    read byte-range splits, stamp constant lineage columns (no shuffle),
    and write parquet. Nothing here touches the driver except the path
    listing.
    """
    spark: SparkSession = wh.spark
    batch_ts = batch_ts or datetime.now(timezone.utc)
    ts_str = batch_ts.strftime("%Y-%m-%d %H:%M:%S")

    reader = spark.read.option("header", True)
    reader = reader.schema(schema) if schema is not None else reader.option("inferSchema", True)
    df = reader.csv(csv_path)

    name = csv_path.rsplit("/", 1)[-1]
    df = df.withColumn("ingested_at", F.lit(ts_str).cast("timestamp")).withColumn(
        "source_file", F.lit(name)
    )

    if mode == "replace" or not wh.exists(raw_schema, table):
        wh.write(df, raw_schema, table, mode="overwrite")
    elif mode == "append":
        wh.write(df, raw_schema, table, mode="append")
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return wh.read(raw_schema, table)
