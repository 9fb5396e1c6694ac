"""Build-worker dispatch (reference: /root/reference/celery_worker.py).

The reference runs graph builds on a worker fleet through a Celery task
queue: a broker delivers {"graph_id", "graph_spec_filename"} tasks, the
worker resolves the spec from a shared data directory and shells out to
orion-build, and the result backend records success/failure
(celery_worker.py:25-39).

Same dispatch semantics here with a BROKER-LESS file-spool queue — no
Redis/Celery dependency, nothing to operate beyond a shared filesystem
(which the reference already requires via SHARED_SOURCE_DATA_PATH):

- producers `submit_task` a JSON file into <spool>/pending/;
- workers `claim_next` via os.rename into <spool>/running/<worker>/ —
  rename is atomic on POSIX, so two workers can never claim the same
  task (the broker's at-most-once delivery);
- the claimed task runs plans.pipeline.build_graph IN-PROCESS on the
  worker's SparkSession (the reference forks a subprocess per build;
  here the build is already a Spark job, so the session is the
  executor fleet) and the outcome lands in <spool>/done/ or
  <spool>/failed/ with the error text — Celery's result backend +
  task_track_started, as files;
- a live worker HEARTBEATS its claim (touches the claimed file's mtime
  every HEARTBEAT_SECONDS from a daemon thread) and `reclaim_stale`
  sweeps running/*/ for claims whose heartbeat is older than a TTL,
  renaming them back into pending/ — the file-spool equivalent of
  Celery's visibility-timeout redelivery, so a worker that dies
  mid-build strands its task for at most one TTL instead of forever.
  Rename is atomic, so a sweep racing a just-finishing worker loses
  cleanly (the worker's _finish already removed the claim).

Scale posture: this queue sequences whole-graph BUILDS, a low-rate
control plane (tens of tasks, not data rows) — the data plane inside
each task is the distributed Spark build. A shared POSIX/NFS dir is the
right broker at that rate; swapping in a real queue changes only
submit/claim.
"""

from __future__ import annotations

import json
import os
import threading
import time
import traceback

from pyspark.sql import SparkSession

PENDING, RUNNING, DONE, FAILED = "pending", "running", "done", "failed"

# A claim whose file mtime is older than this is considered abandoned by
# reclaim_stale. Heartbeats run 60x faster than the default TTL, so a
# healthy worker can miss many beats before a sweep could steal its task.
DEFAULT_CLAIM_TTL_SECONDS = 1800.0
HEARTBEAT_SECONDS = 30.0


def _ensure_spool(spool: str) -> None:
    for sub in (PENDING, RUNNING, DONE, FAILED):
        os.makedirs(os.path.join(spool, sub), exist_ok=True)


def submit_task(
    spool: str, graph_id: str, graph_spec_filename: str, task_id: str | None = None
) -> str:
    """Producer side of celery_app.send_task('orion.data_ingestion'):
    drop one task file into pending/. The write is staged + renamed so a
    claiming worker never sees a half-written JSON."""
    _ensure_spool(spool)
    task_id = task_id or f"{graph_id}-{os.getpid()}-{time.monotonic_ns()}"
    final = os.path.join(spool, PENDING, f"{task_id}.json")
    tmp = final + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(
            {
                "task_id": task_id,
                "graph_id": graph_id,
                "graph_spec_filename": graph_spec_filename,
            },
            fh,
        )
    os.rename(tmp, final)
    return task_id


def claim_next(spool: str, worker_id: str) -> tuple[str, dict] | None:
    """Atomically claim the oldest pending task (rename into
    running/<worker_id>/). Returns (claimed_path, task_data) or None when
    the queue is empty. A rename lost to another worker just moves on to
    the next file."""
    _ensure_spool(spool)
    run_dir = os.path.join(spool, RUNNING, worker_id)
    os.makedirs(run_dir, exist_ok=True)
    pending_dir = os.path.join(spool, PENDING)
    for name in sorted(os.listdir(pending_dir)):
        if not name.endswith(".json"):
            continue
        src = os.path.join(pending_dir, name)
        dst = os.path.join(run_dir, name)
        try:
            os.rename(src, dst)
        except OSError:
            continue  # another worker won this one
        with open(dst) as fh:
            return dst, json.load(fh)
    return None


class _Heartbeat:
    """Touch the claimed file's mtime every *interval* seconds from a
    daemon thread while the build runs. The mtime IS the lease: a claim
    that stops beating becomes eligible for reclaim_stale after the TTL."""

    def __init__(self, claimed_path: str, interval: float = HEARTBEAT_SECONDS):
        self._path = claimed_path
        self._interval = interval
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._beat, daemon=True)

    def _beat(self) -> None:
        while not self._stop.wait(self._interval):
            try:
                os.utime(self._path, None)
            except OSError:
                return  # claim finished or was reclaimed — stop beating

    def __enter__(self) -> "_Heartbeat":
        try:
            os.utime(self._path, None)  # a fresh lease the instant we claim
        except OSError:
            pass
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        self._thread.join(timeout=5.0)


def reclaim_stale(
    spool: str,
    ttl_seconds: float = DEFAULT_CLAIM_TTL_SECONDS,
    worker_id: str | None = None,
) -> list[str]:
    """Requeue abandoned claims: every task file under running/*/ whose
    heartbeat (mtime) is older than *ttl_seconds* — or, with *worker_id*,
    every claim of that known-dead worker regardless of age — is renamed
    back into pending/. Returns the requeued task file names.

    Safe to run concurrently with live workers: a worker that finishes
    between our scan and our rename has already removed the claim, so
    the rename fails with OSError and is skipped; a worker heartbeating
    normally keeps its mtime fresh and is never touched. Mirrors the
    broker redelivery Celery provides via visibility timeouts."""
    _ensure_spool(spool)
    running_root = os.path.join(spool, RUNNING)
    now = time.time()
    requeued = []
    for wid in sorted(os.listdir(running_root)):
        if worker_id is not None and wid != worker_id:
            continue
        wdir = os.path.join(running_root, wid)
        if not os.path.isdir(wdir):
            continue
        for name in sorted(os.listdir(wdir)):
            if not name.endswith(".json"):
                continue
            src = os.path.join(wdir, name)
            try:
                age = now - os.path.getmtime(src)
            except OSError:
                continue  # finished while we scanned
            if worker_id is None and age < ttl_seconds:
                continue
            try:
                os.rename(src, os.path.join(spool, PENDING, name))
            except OSError:
                continue  # the worker beat us to _finish
            requeued.append(name)
    return requeued


def _finish(spool: str, claimed_path: str, result: dict) -> None:
    outcome = DONE if result.get("status") == "success" else FAILED
    out = os.path.join(
        spool, outcome, os.path.basename(claimed_path)
    )
    tmp = out + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(result, fh, indent=2)
    os.rename(tmp, out)
    try:
        os.remove(claimed_path)
    except OSError:
        # A reclaim sweep requeued this claim while we were finishing
        # (worker paused past the TTL). The queue is at-least-once in
        # that corner — same contract as Celery redelivery — and the
        # result recorded above stands.
        pass


def run_claimed_task(
    spark: SparkSession,
    task: dict,
    shared_data_dir: str,
    storage_dir: str,
    source_bundles: dict[str, str],
) -> dict:
    """Execute one claimed task: resolve the spec file from the shared
    directory (celery_worker.py:29-32 — missing shared dir is a hard
    error, not a silent skip), build the named graph, return the result
    record."""
    from orion_spark.plans.pipeline import build_graph, parse_graph_spec

    if not shared_data_dir:
        raise RuntimeError(
            "shared data dir is not set; cannot locate the graph spec"
        )
    spec_path = os.path.join(shared_data_dir, task["graph_spec_filename"])
    with open(spec_path) as fh:
        specs = parse_graph_spec(fh.read())
    wanted = [s for s in specs if s.graph_id == task["graph_id"]]
    if not wanted:
        raise ValueError(
            f"graph {task['graph_id']!r} not in {task['graph_spec_filename']}"
        )
    out = build_graph(spark, wanted[0], source_bundles, storage_dir)
    return {
        "task_id": task["task_id"],
        "status": "success",
        "output": f"graph {task['graph_id']} is created successfully",
        "path": out,
    }


def run_worker(
    spark: SparkSession,
    spool: str,
    shared_data_dir: str,
    storage_dir: str,
    source_bundles: dict[str, str],
    worker_id: str | None = None,
    max_tasks: int | None = None,
) -> list[dict]:
    """Drain the queue: claim-run-record until empty (or max_tasks).
    A task failure is recorded to failed/ and the worker keeps going —
    the reference lets the exception propagate to Celery's handler, which
    records it the same way."""
    worker_id = worker_id or f"worker-{os.getpid()}"
    results = []
    while max_tasks is None or len(results) < max_tasks:
        claim = claim_next(spool, worker_id)
        if claim is None:
            break
        claimed_path, task = claim
        with _Heartbeat(claimed_path):
            try:
                result = run_claimed_task(
                    spark, task, shared_data_dir, storage_dir, source_bundles
                )
            except Exception as exc:  # recorded, not fatal to the worker
                result = {
                    "task_id": task.get("task_id"),
                    "status": "failure",
                    "error": f"{type(exc).__name__}: {exc}",
                    "traceback": traceback.format_exc(),
                }
        _finish(spool, claimed_path, result)
        results.append(result)
    return results
