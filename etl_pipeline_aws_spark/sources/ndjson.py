"""NDJSON source/sink — the reference's native format, partition-parallel.

The reference reads ONE whole S3 object into driver memory and iterates
lines single-threaded (``/root/reference/glue/job.py:22-25``); this module
expresses the same logical scan as ``spark.read.json``, which splits files
across executors, skips blank lines natively, and infers per-record schema —
the #1 semantic upgrade called out in SURVEY.md §1.4.

Failure semantics: the reference aborts the whole job on one malformed line
(bare ``json.loads``, ``glue/job.py:25`` + Glue ``maxRetries: 0``).  Spark's
default is PERMISSIVE (quarantine into ``_corrupt_record``); ``FAILFAST``
matches the reference and is the default here, with PERMISSIVE exposed as the
documented upgrade for 100 TB runs where one bad line must not kill the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_ndjson(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    mode: str = "FAILFAST",
) -> DataFrame:
    """Scan NDJSON (reference R1+R2). One file or a whole directory/prefix;
    blank/whitespace-only lines are skipped by the JSON datasource, matching
    ``if line.strip()`` at glue/job.py:25."""
    reader = spark.read.option("mode", mode)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_ndjson(df: DataFrame, path: str, single_file: bool = False, mode: str = "overwrite") -> None:
    """NDJSON sink (reference R6+R7: ``json.dumps`` per record → PutObject).

    ``single_file=True`` reproduces the reference's one-object output via
    ``coalesce(1)`` — correct at demo scale, a deliberate anti-pattern at
    100 TB where the default (one part-file per partition, written in
    parallel) is the only sane layout (SURVEY.md §4.2 divergence note).
    """
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).json(path)


def to_json_lines(df: DataFrame) -> DataFrame:
    """Serialize rows to JSON strings as a column (reference R6 as an
    expression): ``to_json(struct(*))`` stays JVM-side / codegen'd."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("value"))
