"""Control plane: the reference's orchestration surface re-expressed
in-process (SURVEY.md §3 — the four process boundaries collapse into one
Spark application; only driver→executors remains).

Reference parity map (file:line cites are into /root/reference):

- ``resolve_bucket``  — R11 coalesce-chain bucket resolution with
  trim + error-on-empty (lambda/ingest-handler.ts:31-34,
  src/etl/etl.service.ts:25).
- ``ingest``          — R9/R10 ingest write: payload → landing zone, user
  metadata merged with the ``pipeline-output-bucket`` routing hint
  (lambda/ingest-handler.ts:22,36-56).  Metadata rides as a JSON sidecar —
  the local analog of S3 object metadata (a string→string map,
  src/etl/dto/upload-request.dto.ts:19-21).
- ``process_landed``  — R13/R14 processor: reads the landed object's
  metadata, resolves the output location from the routing hint with env
  default fallback (lambda/handler.ts:39-48), runs the transform.
- ``start_job_run`` / ``get_job_run`` — R15/R17 async job launch +
  R16 status poll (lambda/handler.ts:56-65, src/aws/glue.service.ts:29-62).
  States mirror the Glue JobRun lifecycle the reference's GET endpoint
  exposes (STARTING → RUNNING → SUCCEEDED/FAILED).

The reference ships these as five AWS services; here they are ~100 lines
because the engine is one process — the *semantics* (late-bound output
location, fire-and-forget launch, pollable state) are preserved, which is
what a reference user switching to this repo needs.
"""

from __future__ import annotations

import json
import os
import threading
import uuid
from urllib.parse import unquote
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from etl_pipeline_aws_spark.pipeline import run_pipeline

ROUTING_KEY = "pipeline-output-bucket"  # lambda/ingest-handler.ts:22
_META_SUFFIX = ".metadata.json"


def resolve_bucket(explicit: str | None, default: str | None) -> str:
    """R11: ``(explicit ?? default).trim()``, error if empty
    (lambda/ingest-handler.ts:31-34)."""
    bucket = (explicit if explicit is not None else default or "").strip()
    if not bucket:
        raise ValueError("no bucket provided and no default configured")
    return bucket


def ingest(
    content: str,
    key: str,
    landing_dir: str | None = None,
    *,
    default_landing_dir: str | None = None,
    metadata: dict[str, str] | None = None,
    output_dir: str | None = None,
) -> str:
    """R9/R10: write the NDJSON payload into the landing zone and attach
    the merged metadata (user metadata + routing hint) as a sidecar.

    Two local-filesystem hardenings over the S3 original: a key whose
    normalized path escapes the landing dir is rejected (an S3 key cannot
    escape its bucket, so the analog must not either), and the sidecar is
    written BEFORE the payload so a concurrent process_landed that sees
    the object always sees its routing hint (S3 object metadata is
    atomic with the object; two files are not)."""
    landing = resolve_bucket(landing_dir, default_landing_dir)
    os.makedirs(landing, exist_ok=True)  # R18 ensureBucket analog
    dst = os.path.normpath(os.path.join(landing, key))
    landing_abs = os.path.abspath(landing)
    if not os.path.abspath(dst).startswith(landing_abs + os.sep):
        raise ValueError(f"key {key!r} escapes the landing zone")
    os.makedirs(os.path.dirname(dst) or landing, exist_ok=True)
    merged = dict(metadata or {})
    if output_dir:
        merged[ROUTING_KEY] = output_dir
    with open(dst + _META_SUFFIX, "w", encoding="utf-8") as f:
        json.dump(merged, f)
    with open(dst, "w", encoding="utf-8") as f:
        f.write(content)
    return dst


def process_landed(
    spark: SparkSession,
    landed_path: str,
    default_output_dir: str,
    **pipeline_kwargs,
) -> str:
    """R13/R14: URL-decode the landed key (S3 event records carry
    percent-encoded keys; ``decodeURIComponent`` parity with
    lambda/handler.ts:37), resolve the output location from the landed
    object's metadata routing hint (fallback: configured default), then
    run the reference transform on it."""
    landed_path = unquote(landed_path)
    meta: dict[str, str] = {}
    try:
        with open(landed_path + _META_SUFFIX, encoding="utf-8") as f:
            meta = json.load(f)
    except FileNotFoundError:
        pass
    out_dir = resolve_bucket(meta.get(ROUTING_KEY), default_output_dir)
    return run_pipeline(spark, landed_path, out_dir, **pipeline_kwargs)


# --- R15/R16: async job runs with pollable state ---------------------------

_STARTING, _RUNNING, _SUCCEEDED, _FAILED = (
    "STARTING",
    "RUNNING",
    "SUCCEEDED",
    "FAILED",
)


@dataclass
class JobRun:
    """Local analog of the Glue JobRun struct the reference polls
    (src/aws/glue.service.ts:53-62)."""

    run_id: str
    state: str = _STARTING
    result: object = None
    error: str | None = None
    _done: threading.Event = field(default_factory=threading.Event, repr=False)

    def wait(self, timeout: float | None = None) -> "JobRun":
        self._done.wait(timeout)
        return self


_RUNS: dict[str, JobRun] = {}
_RUNS_LOCK = threading.Lock()


def start_job_run(fn: Callable[[], object]) -> JobRun:
    """R15/R17: fire-and-forget launch (InvocationType 'Event' /
    StartJobRun) — returns immediately with a pollable run id."""
    run = JobRun(run_id=uuid.uuid4().hex)
    with _RUNS_LOCK:
        _RUNS[run.run_id] = run

    def _work() -> None:
        run.state = _RUNNING
        try:
            run.result = fn()
            run.state = _SUCCEEDED
        except Exception as ex:  # the poller, not the launcher, sees failures
            run.error = f"{type(ex).__name__}: {ex}"
            run.state = _FAILED
        finally:
            run._done.set()

    threading.Thread(target=_work, daemon=True).start()
    return run


def get_job_run(run_id: str) -> JobRun:
    """R16: status poll by run id (GET /etl/jobs/:jobRunId)."""
    with _RUNS_LOCK:
        if run_id not in _RUNS:
            raise KeyError(f"unknown job run {run_id!r}")
        return _RUNS[run_id]
