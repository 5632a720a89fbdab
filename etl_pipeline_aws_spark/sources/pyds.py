"""Python Data Source API connector (Spark 4, SPARK-44076).

The reference's only source is "fetch an S3 object and parse it in Python"
(glue/job.py:22-25).  Spark 4's Python DataSource API is the *engine-native*
generalization of that pattern: arbitrary Python read logic that still
enters the plan as a real scan — partition-parallel, schema'd, composable
with every downstream operator, instead of a driver-side collect-and-
parallelize.

The demo source is a calendar dimension (the classic warehouse table that
lives in *no* upstream system and is always synthesized): one
``InputPartition`` per (year, month), so a 7-year calendar fans out as 84
independent Python read tasks.  Rows are generated with ``datetime`` —
deterministic, no RNG, no wall clock.

100 TB posture: the Python reader executes per-partition on executors
(Arrow-batched back to the JVM); a calendar is tiny, but the same class
shape scales to "read a million S3 manifests" — partition list = object
list, ``read`` = one object's records — which is exactly the reference's
Lambda-per-object model re-expressed as a parallel scan.
"""

from __future__ import annotations

import datetime

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


class CalendarDataSource(DataSource):
    """``spark.read.format("pyds_calendar")`` — a generated calendar dim.

    Options: ``start_year`` / ``end_year`` (inclusive bounds).
    """

    @classmethod
    def name(cls) -> str:
        return "pyds_calendar"

    def schema(self) -> str:
        return "d date, y int, q int, m int, dow int, is_weekend boolean"

    def reader(self, schema) -> "CalendarReader":  # noqa: ANN001 (API signature)
        return CalendarReader(self.options)


class CalendarReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.start_year = int(options.get("start_year", 1995))
        self.end_year = int(options.get("end_year", 2001))

    def partitions(self) -> list[InputPartition]:
        # One split per (year, month): the scan parallelizes across 12 x
        # n_years Python tasks, the same way a file source splits by file.
        return [
            InputPartition((y, m))
            for y in range(self.start_year, self.end_year + 1)
            for m in range(1, 13)
        ]

    def read(self, partition: InputPartition):
        y, m = partition.value
        day = datetime.date(y, m, 1)
        one = datetime.timedelta(days=1)
        while day.month == m:
            dow = day.isoweekday()  # 1=Mon .. 7=Sun, matches DuckDB isodow
            yield (day, y, (m - 1) // 3 + 1, m, dow, dow >= 6)
            day += one


def register(spark) -> None:  # noqa: ANN001
    """Idempotently register the source with the session."""
    spark.dataSource.register(CalendarDataSource)


class _ShardCommit(WriterCommitMessage):
    def __init__(self, shard: str, n_rows: int) -> None:
        self.shard = shard
        self.n_rows = n_rows


class NdjsonShardDataSource(DataSource):
    """``df.write.format("pyds_ndjson")`` — a PYTHON-implemented NDJSON
    sink: each partition writes one shard file from Python, commit
    messages flow back to the driver, and the job-level commit publishes
    a manifest — the reference's boto3 ``put_object`` loop
    (glue/job.py:38-44, lambda/ingest-handler.ts:36-56) re-expressed as
    an engine-native, partition-parallel, two-phase-commit writer."""

    @classmethod
    def name(cls) -> str:
        return "pyds_ndjson"

    def writer(self, schema, overwrite: bool) -> "NdjsonShardWriter":  # noqa: ANN001
        return NdjsonShardWriter(self.options, [f.name for f in schema.fields])


class NdjsonShardWriter(DataSourceWriter):
    def __init__(self, options: dict, columns: list[str]) -> None:
        self.path = options["path"]
        self.columns = columns

    def write(self, iterator) -> _ShardCommit:  # noqa: ANN001
        """Executor-side: stream one partition to one shard file.  The
        shard is named by partition id (deterministic layout); rows
        serialize as one JSON object per line in schema column order."""
        import json
        import os

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        shard = os.path.join(self.path, f"part-{pid:05d}.jsonl")
        n = 0
        with open(shard, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps({c: row[c] for c in self.columns}) + "\n")
                n += 1
        return _ShardCommit(shard, n)

    def commit(self, messages) -> None:  # noqa: ANN001
        """Driver-side job commit: publish the manifest (shard -> rows).
        Readers that trust only manifested shards get all-or-nothing
        visibility — the same role as the parquet streaming sink's
        _spark_metadata log."""
        import json
        import os

        manifest = {m.shard: m.n_rows for m in messages if m is not None}
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as fh:
            json.dump(manifest, fh, sort_keys=True)

    def abort(self, messages) -> None:  # noqa: ANN001
        """Failed job: no manifest is published; shards are dead files."""


def register_writer(spark) -> None:  # noqa: ANN001
    spark.dataSource.register(NdjsonShardDataSource)


class DocsStreamDataSource(DataSource):
    """``spark.readStream.format("pyds_docs_stream")`` — a PYTHON-implemented
    STREAMING source (Spark 4 SimpleDataSourceStreamReader): serves the
    documents table in bounded micro-batch chunks with real offset
    bookkeeping, completing the Python-connector story (batch reader:
    pyds_calendar; writer: pyds_ndjson; this: the streaming leg the
    reference's S3-notification trigger maps to when the upstream is an
    API/queue instead of a file drop).

    Options: ``path`` (the sf_dir), ``chunk`` (rows per micro-batch).
    Offsets are row positions in doc_id order — deterministic, so a
    restart from a checkpoint resumes EXACTLY where the last committed
    batch ended (exercised by the registry query, which restarts the
    stream until drained).
    """

    @classmethod
    def name(cls) -> str:
        return "pyds_docs_stream"

    def schema(self) -> str:
        return "doc_id long, lang string, n_chars long"

    def simpleStreamReader(self, schema) -> "DocsStreamReader":  # noqa: ANN001
        return DocsStreamReader(self.options)


class DocsStreamReader:
    """Driver-side simple stream reader: read() returns (rows, nextOffset)
    for one chunk; readBetweenOffsets replays a committed range exactly
    (the recovery path).  Rows come from a pyarrow scan of the parquet
    table sliced by row position in doc_id order."""

    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.chunk = int(options.get("chunk", "2000"))
        self._rows: list | None = None

    def _all_rows(self) -> list:
        if self._rows is None:
            import os

            import pyarrow.parquet as pq

            t = pq.read_table(
                os.path.join(self.path, "documents.parquet"),
                columns=["doc_id", "lang", "n_chars"],
            )
            rows = list(
                zip(
                    t.column("doc_id").to_pylist(),
                    t.column("lang").to_pylist(),
                    t.column("n_chars").to_pylist(),
                )
            )
            rows.sort(key=lambda r: r[0])
            self._rows = rows
        return self._rows

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):  # noqa: ANN001
        rows = self._all_rows()
        lo = start["pos"]
        hi = min(lo + self.chunk, len(rows))
        return iter(rows[lo:hi]), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: ANN001
        return iter(self._all_rows()[start["pos"] : end["pos"]])

    def commit(self, end: dict) -> None:  # noqa: ANN001
        pass


def register_stream(spark) -> None:  # noqa: ANN001
    spark.dataSource.register(DocsStreamDataSource)
