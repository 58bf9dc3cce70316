"""Streaming URL/domain curation — the RefinedWeb §3.1 front for an
always-on ingest (batch twins: ``datapipe/curation.py``).

* **Blocklist flags are stateless**: the registered domain is row-local
  string algebra and membership is a stream-static broadcast join (the
  frozen-artifact posture every streaming filter here uses), so the
  BATCH operator works verbatim on a streaming frame —
  ``streaming_url_blocklist`` pins that contract (and threads the PSL
  frame through, which is also a static broadcast side).
* **Per-domain caps need bounded keyed state**: "has this domain
  already contributed ``per_domain`` docs" is a count per registered
  domain, kept with ``applyInPandasWithState`` (the same keyed layout
  as the dup filter).  Online, the only meaningful rank is ARRIVAL
  order — the batch twin's deterministic md5 rank needs the finished
  corpus — so the stream keeps the FIRST ``per_domain`` arrivals per
  domain, ties within a micro-batch ordered by id (the same
  streamed==batch tie rule as ``filters._make_dup_update``).  On an
  id-ordered replay the selection therefore EQUALS the batch
  first-N-by-id-per-domain frame, which is what the parity test pins.

Scale posture: state is ONE small integer per distinct registered
domain; ``idle_timeout_ms`` bounds it by the horizon's arrival volume
(re-arrival after eviction restarts the domain's budget — cap-per-
horizon, exactly the dup filter's eviction semantics), and
``event_time_col`` switches the horizon to event time under a
watermark.
"""

from __future__ import annotations

from typing import Any, Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState

from .horizon import arm_timeout, event_ms, timeout_mode

_CAP_STATE = T.StructType([
    T.StructField("n", T.IntegerType()),
])


def streaming_url_blocklist(stream: DataFrame, blocked: DataFrame,
                            url_col: str = "url",
                            psl: Optional[DataFrame] = None) -> DataFrame:
    """Streaming (input + domain + url_blocked): the batch
    ``url_blocklist_flags`` applied to a streaming frame — every piece
    (extraction, normalization, blocklist membership, optional PSL
    matching) is row-local or a stream-static broadcast join, both of
    which append mode supports, so the decisions are the batch
    operator's by construction (replay==batch pinned in tests)."""
    from ..datapipe.curation import url_blocklist_flags

    return url_blocklist_flags(stream, blocked, url_col, psl)


def _make_cap_update(per_domain: int, idle_timeout_ms: Optional[int],
                     event_time_col: Optional[str] = None):
    def _cap_update(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                    state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n = state.get[0] if state.exists else 0
        # concat ALL Arrow chunks before sorting: a group split across
        # chunks in one micro-batch must still admit by global id order
        # (min id first), or the streamed==batch equivalence breaks
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("id")
        room = max(per_domain - n, 0)
        kept = pdf.iloc[:room]
        state.update((min(per_domain, n + len(pdf)),))
        arm_timeout(state, idle_timeout_ms, event_time_col,
                    event_ms(pdf[event_time_col])
                    if event_time_col is not None else None)
        if len(kept):
            yield kept[["id", "domain"]]

    return _cap_update


def streaming_domain_cap(stream: DataFrame, per_domain: int,
                         url_col: str = "url", id_col: str = "doc_id",
                         psl: Optional[DataFrame] = None,
                         idle_timeout_ms: Optional[int] = None,
                         event_time_col: Optional[str] = None
                         ) -> DataFrame:
    """Streaming (id, domain) of the docs ADMITTED under the per-domain
    contribution cap: the first ``per_domain`` arrivals per registered
    domain survive (ties within a micro-batch by id), later arrivals are
    dropped — RefinedWeb's no-site-dominates rule as an online
    admission filter.  Deviation from the batch twin, documented: batch
    ``domain_capped_sample`` selects by the corpus-wide deterministic
    md5 rank, which a stream cannot know; arrival order is the online
    analogue, and an id-ordered replay makes the two coincide (the
    parity the test pins).  Output is the decision frame (id, domain) —
    join back to the payload stream on id if the rows are needed, the
    same contract as the dup filter's flag frame."""
    if per_domain <= 0:
        raise ValueError(f"per_domain must be positive, got {per_domain}")
    from ..datapipe.curation import with_registered_domain

    assigned = with_registered_domain(stream, url_col, psl, "domain")
    carry = ((F.col(event_time_col),) if event_time_col is not None
             else ())
    # the id passes through UNCAST — string/uuid ids are as valid online
    # as longs and a cast would silently null them (the bm25 r11 rule);
    # the output schema mirrors the input's id type, and in-batch ties
    # sort by the id's natural order (numeric or lexicographic)
    base = assigned.select(F.col(id_col).alias("id"),
                           *carry, F.col("domain"))
    out_schema = T.StructType([
        T.StructField("id", stream.schema[id_col].dataType),
        T.StructField("domain", T.StringType()),
    ])
    timeout = timeout_mode(idle_timeout_ms, event_time_col)
    return (base.groupBy("domain")
            .applyInPandasWithState(
                _make_cap_update(per_domain, idle_timeout_ms,
                                 event_time_col),
                out_schema, _CAP_STATE, "append", timeout))
