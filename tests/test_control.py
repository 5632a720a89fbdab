"""Control-plane parity tests (SURVEY.md §3): bucket resolution, ingest with
metadata routing hint, landed-object processing, async job runs."""

from __future__ import annotations

import glob
import json

import pytest

from etl_pipeline_aws_spark import control


def test_resolve_bucket_coalesce_chain():
    # R11 (lambda/ingest-handler.ts:31-34): explicit wins, default falls back,
    # whitespace-only is an error.
    assert control.resolve_bucket("explicit", "default") == "explicit"
    assert control.resolve_bucket(None, "default") == "default"
    assert control.resolve_bucket("  padded  ", None) == "padded"
    with pytest.raises(ValueError):
        control.resolve_bucket(None, None)
    with pytest.raises(ValueError):
        control.resolve_bucket("   ", "")


def test_ingest_writes_payload_and_metadata_sidecar(tmp_path):
    landing = str(tmp_path / "landing")
    dst = control.ingest(
        '{"name":"Alice"}\n{"name":"Bob"}',
        "batch1.ndjson",
        landing_dir=None,
        default_landing_dir=landing,
        metadata={"owner": "alice"},
        output_dir="/out/override",
    )
    assert open(dst).read().startswith('{"name":"Alice"}')
    meta = json.load(open(dst + control._META_SUFFIX))
    # R10: user metadata merged with the routing hint key.
    assert meta == {"owner": "alice", control.ROUTING_KEY: "/out/override"}


def test_process_landed_routes_via_metadata_hint(spark, tmp_path):
    landing = str(tmp_path / "landing")
    routed = str(tmp_path / "routed")
    default_out = str(tmp_path / "default_out")
    dst = control.ingest(
        '{"name":"alice","x":1}\n\n{"x":2}',
        "k.ndjson",
        landing_dir=landing,
        output_dir=routed,
    )
    out_path = control.process_landed(spark, dst, default_out)
    # R13: metadata hint wins over the default output dir.
    assert out_path.startswith(routed)
    parts = sorted(glob.glob(out_path + "/part-*"))
    assert len(parts) == 1  # single_file fidelity mode: one output object (R7)
    lines = [json.loads(l) for l in open(parts[0]) if l.strip()]
    assert len(lines) == 2  # blank line dropped (glue/job.py:25)
    by_x = {r["x"]: r for r in lines}
    assert by_x[1]["uppercase_name"] == "ALICE" and by_x[1]["processed"] is True
    assert by_x[2]["uppercase_name"] == ""  # absent name -> "", not NULL


def test_process_landed_falls_back_to_default(spark, tmp_path):
    landing = str(tmp_path / "landing")
    default_out = str(tmp_path / "default_out")
    dst = control.ingest('{"name":"bob"}', "k2.ndjson", landing_dir=landing)
    out_path = control.process_landed(spark, dst, default_out)
    assert out_path.startswith(default_out)


def test_process_landed_url_decodes_key(spark, tmp_path):
    """R14 (lambda/handler.ts:37 decodeURIComponent): the event-analog path
    arrives percent-encoded; processing must decode it before reading."""
    landing = str(tmp_path / "landing")
    default_out = str(tmp_path / "default_out")
    dst = control.ingest('{"name":"eve"}', "dir with space/k 3.ndjson", landing_dir=landing)
    encoded = dst.replace("dir with space/k 3", "dir%20with%20space%2Fk%203")
    out_path = control.process_landed(spark, encoded, default_out)
    assert out_path.startswith(default_out)
    parts = sorted(glob.glob(out_path + "/part-*"))
    assert json.loads(open(parts[0]).readline())["uppercase_name"] == "EVE"


def test_ingest_rejects_key_escaping_landing_zone(tmp_path):
    landing = str(tmp_path / "landing")
    with pytest.raises(ValueError, match="escapes"):
        control.ingest("x", "../outside.ndjson", landing_dir=landing)
    with pytest.raises(ValueError, match="escapes"):
        control.ingest("x", "a/../../outside.ndjson", landing_dir=landing)


def test_ingest_writes_sidecar_before_payload(tmp_path, monkeypatch):
    """A concurrent processor that can see the payload must already see the
    routing hint (sidecar-first write order)."""
    import builtins

    order: list[str] = []
    real_open = builtins.open

    def spy(path, *a, **k):
        order.append(str(path))
        return real_open(path, *a, **k)

    monkeypatch.setattr(builtins, "open", spy)
    landing = str(tmp_path / "landing")
    control.ingest("x", "k.ndjson", landing_dir=landing, output_dir="/out")
    sidecar_idx = order.index(next(p for p in order if p.endswith(control._META_SUFFIX)))
    payload_idx = order.index(next(p for p in order if p.endswith("k.ndjson")))
    assert sidecar_idx < payload_idx


def test_job_run_lifecycle_success_and_failure():
    run = control.start_job_run(lambda: 42)
    assert control.get_job_run(run.run_id) is run
    run.wait(30)
    assert run.state == "SUCCEEDED" and run.result == 42 and run.error is None

    def boom():
        raise RuntimeError("nope")

    bad = control.start_job_run(boom)
    bad.wait(30)
    # R16: the poller, not the launcher, observes the failure.
    assert bad.state == "FAILED" and "RuntimeError: nope" in bad.error

    with pytest.raises(KeyError):
        control.get_job_run("missing")
