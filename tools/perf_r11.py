#!/usr/bin/env python
"""Round-11 optimization profiler.

For each headline query (or an explicit --names list): time two runs of the
bench action (df.count(), matching bench.py's methodology) plus one noop-sink
run (guide §1.4 — materializes every column, isolating computation from the
count's column pruning), and dump .explain("formatted") to
plans/r11/<name>_<tag>.txt.

Usage:
    python tools/perf_r11.py --tag before
    python tools/perf_r11.py --tag after --names graph_connected_components
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import etl_pipeline_aws_spark as engine  # noqa: E402
from etl_pipeline_aws_spark.plans.inspect import formatted_plan  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--names", nargs="*", default=None)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out-dir", default="plans/r11")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--skip-noop", action="store_true")
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    spark = engine.get_spark("perf_r11")
    spark.sparkContext.setLogLevel("ERROR")
    qs = engine.all_queries()
    names = args.names or [n for n in bench.HEADLINE if n in qs]

    # identical warm-up to bench.py: JVM + parquet footers + Python workers
    qs[names[0]](spark, args.sf_dir).count()
    from pyspark.sql.functions import max as _fmax
    from pyspark.sql.functions import pandas_udf as _pudf

    _warm = _pudf(lambda s: s, "long")
    spark.range(64).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).select(
        _warm("id").alias("x")
    ).agg(_fmax("x")).collect()

    results: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"perf_r11:{name}")
        rec: dict = {"count_runs": [], "noop_runs": []}
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf_dir)
            df.count()
            rec["count_runs"].append(round(time.perf_counter() - t0, 4))
            engine.clear_caches(spark)
        if not args.skip_noop:
            for _ in range(args.runs):
                t0 = time.perf_counter()
                df = qs[name](spark, args.sf_dir)
                df.write.format("noop").mode("overwrite").save()
                rec["noop_runs"].append(round(time.perf_counter() - t0, 4))
                engine.clear_caches(spark)
        # plan dump from a fresh build (cheap, no execution)
        df = qs[name](spark, args.sf_dir)
        plan = formatted_plan(df)
        with open(os.path.join(args.out_dir, f"{name}_{args.tag}.txt"), "w") as fh:
            fh.write(plan)
        engine.clear_caches(spark)
        rec["count"] = min(rec["count_runs"])
        rec["noop"] = min(rec["noop_runs"]) if rec["noop_runs"] else None
        rec["exchanges"] = plan.count("Exchange")
        rec["python_eval"] = sum(
            plan.count(k) for k in ("BatchEvalPython", "ArrowEvalPython")
        )
        results[name] = rec
        print(json.dumps({name: rec}), flush=True)

    out_path = os.path.join(args.out_dir, f"perf_{args.tag}.json")
    merged: dict[str, dict] = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            merged = json.load(fh)
    merged.update(results)
    with open(out_path, "w") as fh:
        json.dump(merged, fh, indent=1, sort_keys=True)
    total = round(sum(r["count"] for r in results.values()), 3)
    print(json.dumps({"tag": args.tag, "total_count_sec": total, "n": len(results)}))
    spark.stop()


if __name__ == "__main__":
    main()
