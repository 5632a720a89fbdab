#!/usr/bin/env python
"""One-shot full-registry timing sweep at sf0.1 (ranking instrument for the
r11 optimization round — single count() run per query, session-warm; use
for ordering the tail, not for before/after claims)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import etl_pipeline_aws_spark as engine  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep_all_r11.json"
    spark = engine.get_spark("sweep_all_r11")
    spark.sparkContext.setLogLevel("ERROR")
    qs = engine.all_queries()
    names = sorted(engine.oracle_sql())
    qs[names[0]](spark, sf_dir).count()  # warm
    out: dict[str, float] = {}
    for i, name in enumerate(names):
        engine.clear_caches(spark)
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        t0 = time.perf_counter()
        try:
            qs[name](spark, sf_dir).count()
            out[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — ranking sweep must finish
            out[name] = -1.0
            print(f"ERR {name}: {exc}", flush=True)
        if i % 25 == 0:
            print(f"{i}/{len(names)}", flush=True)
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=0, sort_keys=True)
    top = sorted(out.items(), key=lambda kv: -kv[1])[:40]
    print(json.dumps(top, indent=0))
    spark.stop()


if __name__ == "__main__":
    main()
