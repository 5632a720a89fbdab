#!/usr/bin/env python
"""Oracle-verify specific declared queries at one or more scale factors,
using the same compare() the pytest suite and the driver use.

Usage:
    python tools/verify_queries.py --names asof_join_merge dedup_cluster_keepers \
        --sf-dirs /root/testdata/sf0.001 /root/testdata/sf0.01 /root/testdata/sf0.1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import etl_pipeline_aws_spark as engine  # noqa: E402
from tests.oracle import compare, duckdb_con  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", nargs="+", required=True)
    ap.add_argument(
        "--sf-dirs",
        nargs="+",
        default=[
            "/root/testdata/sf0.001",
            "/root/testdata/sf0.01",
            "/root/testdata/sf0.1",
        ],
    )
    args = ap.parse_args()

    spark = engine.get_spark("verify_queries")
    spark.sparkContext.setLogLevel("ERROR")
    qs = engine.all_queries()
    oracles = engine.oracle_sql()
    results: dict[str, dict[str, str]] = {}
    ok = True
    for sf_dir in args.sf_dirs:
        con = duckdb_con(sf_dir)
        for name in args.names:
            t0 = time.perf_counter()
            try:
                compare(qs[name](spark, sf_dir), con, oracles[name])
                verdict = f"ok ({time.perf_counter() - t0:.1f}s)"
            except Exception as exc:  # noqa: BLE001
                verdict = f"FAIL: {exc}"
                ok = False
            results.setdefault(name, {})[sf_dir] = verdict
            print(json.dumps({name: {sf_dir: verdict}}), flush=True)
            engine.clear_caches(spark)
        con.close()
    print(json.dumps(results, indent=1))
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
