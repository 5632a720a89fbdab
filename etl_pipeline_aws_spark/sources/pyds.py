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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


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
