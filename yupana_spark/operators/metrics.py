"""Query metrics registry: SHOW QUERIES / KILL QUERY / DELETE QUERIES.

Reference: yupana-core/.../utils/metric/*.scala + model/TsdbQueryMetrics.scala
(persisted per-stage metrics), QueryEngineRouter.scala:64-118 (dispatch).
Spark: an in-memory registry + ``cancelJobGroup`` for KILL.
"""

from __future__ import annotations

import threading
import time
import uuid
from dataclasses import dataclass, field
from typing import Dict, Optional


@dataclass
class QueryMetric:
    query_id: str
    query: str
    start_ts: float
    state: str = "RUNNING"  # RUNNING | FINISHED | FAILED | CANCELLED
    duration: float = 0.0
    # per-stage seconds (≙ TsdbQueryMetrics.scala:1-95 persisted stage
    # timings: create_queries/filter/reduce...; our engine's stages are
    # parse -> analyze -> compile, with Spark execution happening lazily at
    # the caller's action)
    stages: Dict[str, float] = field(default_factory=dict)


class MetricsRegistry:
    def __init__(self):
        self._lock = threading.Lock()
        self._queries: Dict[str, QueryMetric] = {}

    def start(self, query_text: str) -> str:
        qid = uuid.uuid4().hex[:16]
        with self._lock:
            self._queries[qid] = QueryMetric(qid, query_text, time.time())
        return qid

    def stage(self, qid: str, name: str, seconds: float) -> None:
        """Record one pipeline stage's wall time for SHOW QUERIES."""
        with self._lock:
            m = self._queries.get(qid)
            if m is not None:
                m.stages[name] = m.stages.get(name, 0.0) + seconds

    def finish(self, qid: str, state: str = "FINISHED") -> None:
        with self._lock:
            m = self._queries.get(qid)
            if m is not None:
                m.state = state
                m.duration = time.time() - m.start_ts

    def kill(self, spark, qid: str) -> bool:
        """KILL QUERY WHERE query_id = ... -> cancelJobGroup."""
        spark.sparkContext.cancelJobGroup(f"yupana-{qid}")
        with self._lock:
            m = self._queries.get(qid)
            if m is None:
                return False
            m.state = "CANCELLED"
        return True

    def delete(self, query_id: Optional[str] = None,
               state: Optional[str] = None) -> int:
        with self._lock:
            victims = [
                q for q in self._queries.values()
                if (query_id is None or q.query_id == query_id)
                and (state is None or q.state == state)
                and q.state != "RUNNING"
            ]
            for v in victims:
                del self._queries[v.query_id]
        return len(victims)

    def snapshot(self):
        with self._lock:
            return list(self._queries.values())


REGISTRY = MetricsRegistry()
