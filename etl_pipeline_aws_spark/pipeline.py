"""Reference-fidelity transform: the entire data path of the reference repo,
re-expressed as one declarative DataFrame pipeline.

Reference semantics preserved exactly (SURVEY.md §2.A, glue/job.py:19-44):

- blank/whitespace lines are skipped (job.py:25);
- every input field passes through untouched, whatever its name (job.py:28);
- ``processed`` is constant True (job.py:30);
- ``uppercase_name = upper(name or "")`` — an ABSENT/null ``name`` yields
  ``""``, not NULL (job.py:31) — hence the explicit ``coalesce``: Spark's
  ``upper(NULL)`` is NULL and would diverge;
- output lands under ``transformed/<key>`` (job.py:19).

What the reference does per-object in single-threaded CPython, this does
partition-parallel: the scan, the projection, and the sink all distribute,
and at 100 TB the same plan runs unchanged with ``s3a://`` paths.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_aws_spark.sources.ndjson import read_ndjson, write_ndjson


def enrich(df: DataFrame) -> DataFrame:
    """The transform step (glue/job.py:27-34): pass everything through, add
    ``processed=True`` and ``uppercase_name=upper(coalesce(name, ''))``."""
    name_col = F.col("name") if "name" in df.columns else F.lit(None).cast("string")
    return df.withColumn("processed", F.lit(True)).withColumn(
        "uppercase_name", F.upper(F.coalesce(name_col, F.lit("")))
    )


def run_pipeline(
    spark: SparkSession,
    source_path: str,
    output_dir: str,
    key: str | None = None,
    single_file: bool = True,
    mode: str = "FAILFAST",
) -> str:
    """End-to-end reference pipeline: NDJSON scan → enrich → NDJSON sink.

    Collapses the reference's four process boundaries (NestJS → Lambda → S3
    event → Glue; SURVEY.md §3) into one Spark job.  ``output_dir`` plays the
    role of the resolved output bucket (R11/R13 coalesce-chain resolution
    happens in the caller / config layer); the ``transformed/`` key prefix
    matches glue/job.py:19.
    """
    key = key or os.path.basename(source_path.rstrip("/"))
    out_path = os.path.join(output_dir, "transformed", key)
    df = read_ndjson(spark, source_path, mode=mode)
    write_ndjson(enrich(df), out_path, single_file=single_file)
    return out_path
