"""Observability: span tracing + per-query metrics table.

The analog of the reference's OpenTelemetry wrapper
(`/root/reference/app/utils/tracing.py:43-151` — ``trace_span`` context
manager recording CPU time and exceptions, nestable child spans,
``traced`` decorator), re-expressed for a Spark batch engine with no
collector dependency:

  * spans nest via a stack and record wall time, process CPU time,
    user attributes, and any raised exception (recorded, then re-raised
    — same contract as trace_span);
  * a span that wraps Spark actions tags them with a Spark job group and
    harvests job/stage/task counts from the ``statusTracker`` when it
    closes — the cluster-side half of the trace;
  * ``metrics_df``/``write_metrics`` land the spans as an ordinary
    DataFrame/parquet table, queryable next to the lineage table (the
    engine's other metrics surface, checkpoint.metrics_summary).
"""

from __future__ import annotations

import time
import traceback
import uuid
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

METRICS_SCHEMA = (
    "span_id string, parent_id string, name string, status string, "
    "error string, started_at_unix double, wall_sec double, cpu_sec double, "
    "n_jobs long, n_stages long, n_tasks long, attributes string"
)


@dataclass
class Span:
    span_id: str
    parent_id: str | None
    name: str
    attributes: dict = field(default_factory=dict)
    status: str = "ok"
    error: str | None = None
    started_at_unix: float = 0.0
    wall_sec: float = 0.0
    cpu_sec: float = 0.0
    n_jobs: int = 0
    n_stages: int = 0
    n_tasks: int = 0

    def set_attribute(self, key: str, value) -> None:
        self.attributes[key] = value


class Tracer:
    """Collects spans; optionally harvests Spark job stats per span."""

    def __init__(self, spark: SparkSession | None = None):
        self._spark = spark
        self._stack: list[Span] = []
        self.spans: list[Span] = []

    @contextmanager
    def span(self, name: str, **attributes):
        """Nestable span context manager. Mirrors trace_span's contract:
        attributes up front, CPU time recorded, exceptions recorded on
        the span and re-raised."""
        s = Span(
            span_id=uuid.uuid4().hex[:16],
            parent_id=self._stack[-1].span_id if self._stack else None,
            name=name,
            attributes=dict(attributes),
            started_at_unix=time.time(),
        )
        self._stack.append(s)
        group = f"trace-{s.span_id}"
        if self._spark is not None:
            self._spark.sparkContext.setJobGroup(group, name)
        t0, c0 = time.perf_counter(), time.process_time()
        try:
            yield s
        except Exception as e:
            s.status = "error"
            s.error = "".join(
                traceback.format_exception_only(type(e), e)).strip()
            raise
        finally:
            s.wall_sec = round(time.perf_counter() - t0, 6)
            s.cpu_sec = round(time.process_time() - c0, 6)
            self._stack.pop()
            if self._spark is not None:
                self._harvest(s, group)
                # restore the ENCLOSING span's job group (not ""), so a
                # parent span keeps harvesting jobs it runs after a child
                # closes
                if self._stack:
                    parent = self._stack[-1]
                    self._spark.sparkContext.setJobGroup(
                        f"trace-{parent.span_id}", parent.name)
                else:
                    self._spark.sparkContext.setJobGroup("", "")
            self.spans.append(s)

    def _harvest(self, s: Span, group: str) -> None:
        """Job/stage/task counts for everything this span ran."""
        try:
            tracker = self._spark.sparkContext.statusTracker()
            job_ids = tracker.getJobIdsForGroup(group)
            s.n_jobs = len(job_ids)
            for jid in job_ids:
                info = tracker.getJobInfo(jid)
                if info is None:
                    continue
                s.n_stages += len(info.stageIds)
                for sid in info.stageIds:
                    st = tracker.getStageInfo(sid)
                    if st is not None:
                        s.n_tasks += st.numTasks
        except Exception:
            pass  # metrics are best-effort; never fail the traced work

    def traced(self, name: str | None = None):
        """Decorator form (tracing.py:140-151 analog)."""
        import functools

        def deco(fn):
            @functools.wraps(fn)
            def wrapper(*args, **kwargs):
                with self.span(name or fn.__qualname__):
                    return fn(*args, **kwargs)
            return wrapper
        return deco

    # ---- metrics table ----------------------------------------------------

    def metrics_df(self, spark: SparkSession | None = None) -> DataFrame:
        import json

        spark = spark or self._spark
        if spark is None:
            raise ValueError(
                "no SparkSession available: construct Tracer(spark) or pass "
                "one to metrics_df/write_metrics")
        rows = [
            (s.span_id, s.parent_id, s.name, s.status, s.error,
             s.started_at_unix, s.wall_sec, s.cpu_sec,
             s.n_jobs, s.n_stages, s.n_tasks,
             json.dumps(s.attributes, sort_keys=True, default=str))
            for s in self.spans
        ]
        return spark.createDataFrame(rows, METRICS_SCHEMA)

    def write_metrics(self, path: str,
                      spark: SparkSession | None = None) -> None:
        self.metrics_df(spark).write.mode("append").parquet(path)
