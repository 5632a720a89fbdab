"""Reference-fidelity tests (SURVEY.md §5 / FIXTURES.md §A): replay the
glue/job.py transform semantics on NDJSON fixtures and assert exact output —
blank-line skip, ragged-key pass-through, processed=True, uppercase_name
defaulting to "" (never NULL), transformed/<key> output prefix, FAILFAST on
malformed lines."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.errors.exceptions.captured import SparkUpgradeException  # noqa: F401

from etl_pipeline_aws_spark.pipeline import enrich, run_pipeline
from etl_pipeline_aws_spark.sources.ndjson import read_ndjson

FIXTURE = """\
{"name":"Alice"}
{"id":7}
{"name":"Bob","age":30,"tags":["x"]}


{"name":"Eve","addr":{"city":"SP"}}
"""


@pytest.fixture()
def ndjson_path(tmp_path):
    p = tmp_path / "landing" / "batch-1.json"
    p.parent.mkdir()
    p.write_text(FIXTURE)
    return str(p)


def _read_output(out_path: str) -> list[dict]:
    rows = []
    for fn in os.listdir(out_path):
        if fn.startswith("part-"):
            with open(os.path.join(out_path, fn)) as f:
                rows.extend(json.loads(line) for line in f if line.strip())
    return rows


def test_run_pipeline_reference_semantics(spark, tmp_path, ndjson_path):
    out_dir = str(tmp_path / "out")
    out_path = run_pipeline(spark, ndjson_path, out_dir, key="batch-1.json")

    # R7: output key prefixed transformed/ (glue/job.py:19)
    assert out_path == os.path.join(out_dir, "transformed", "batch-1.json")

    rows = _read_output(out_path)
    # blank/whitespace lines skipped (glue/job.py:25) -> 4 records
    assert len(rows) == 4
    by_marker = {json.dumps(r, sort_keys=True): r for r in rows}

    for r in rows:
        # R3: processed always True (glue/job.py:30)
        assert r["processed"] is True

    named = {r.get("name"): r for r in rows}
    # R4: uppercase_name = upper(name)
    assert named["Alice"]["uppercase_name"] == "ALICE"
    assert named["Bob"]["uppercase_name"] == "BOB"
    # R5: missing name -> "" not NULL (glue/job.py:31)
    missing = [r for r in rows if "name" not in r or r.get("name") is None]
    assert len(missing) == 1
    assert missing[0]["uppercase_name"] == ""
    assert missing[0]["id"] == 7
    # ragged keys pass through (glue/job.py:28)
    assert named["Bob"]["age"] == 30
    assert named["Bob"]["tags"] == ["x"]
    # nested values survive the round-trip
    assert named["Eve"]["addr"] == {"city": "SP"}
    assert by_marker  # sanity


def test_enrich_without_name_column(spark):
    df = spark.createDataFrame([(1,), (2,)], ["id"])
    out = enrich(df).collect()
    assert all(r.processed is True for r in out)
    assert all(r.uppercase_name == "" for r in out)


def test_failfast_on_malformed_line(spark, tmp_path):
    p = tmp_path / "bad.json"
    p.write_text('{"name":"ok"}\n{"name":\n')
    with pytest.raises(Exception):
        # schema inference runs eagerly, so the abort can surface at read time
        read_ndjson(spark, str(p), mode="FAILFAST").collect()


def test_permissive_quarantines(spark, tmp_path):
    """The documented 100 TB-mode divergence: PERMISSIVE keeps good rows."""
    p = tmp_path / "bad.json"
    p.write_text('{"name":"ok"}\n{"name":\n')
    df = read_ndjson(spark, str(p), mode="PERMISSIVE")
    rows = df.collect()
    assert len(rows) == 2  # one good, one corrupt-quarantined
