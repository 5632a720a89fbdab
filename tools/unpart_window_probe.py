"""One-off probe: list every registry query whose static plan contains a
Window / WindowGroupLimit node with an EMPTY partition spec (the
single-task-at-scale class from the r7 verdict), so the new plan guard's
allowlist can be sized honestly.  Not part of the test suite."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import etl_pipeline_aws_spark as engine
from etl_pipeline_aws_spark.plans.inspect import (
    unpartitioned_window_nodes as unpartitioned_window_lines,
)

SF_DIR = "/root/testdata/sf0.001"
SWEEP_SKIP_MODULES = ("stream_queries", "source_queries", "multimodal", "observability")


def main() -> None:
    spark = engine.get_spark("unpart-window-probe")
    qs = engine.all_queries()
    hits = {}
    errs = {}
    for name in sorted(qs):
        fn = qs[name]
        if fn.__module__.rsplit(".", 1)[-1] in SWEEP_SKIP_MODULES:
            continue
        try:
            plan = fn(spark, SF_DIR)._jdf.queryExecution().sparkPlan().toString()
        except Exception as exc:  # noqa: BLE001
            errs[name] = f"{type(exc).__name__}: {exc}"[:120]
            continue
        lines = unpartitioned_window_lines(plan)
        if lines:
            hits[name] = lines
        engine.clear_caches(spark)
    print(f"== {len(hits)} queries with unpartitioned windows ==")
    for name, lines in hits.items():
        print(f"{name}: {len(lines)}")
        for l in lines:
            print(f"    {l}")
    if errs:
        print(f"== {len(errs)} plan errors ==")
        for name, e in errs.items():
            print(f"{name}: {e}")
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
