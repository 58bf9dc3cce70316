"""Streaming deterministic sampling — the batch samplers whose decision
is a pure function of the row admit arriving documents online with the
IDENTICAL selection (batch twins: ``datapipe/sample.py``).

* ``streaming_bernoulli_sample``: the md5-prefix membership predicate is
  row-local, so the batch ``deterministic_sample`` semantics apply to a
  stream verbatim (``sample.bernoulli_keep`` as a filter).
* ``streaming_temperature_mix``: temperature-weighted corpus mixing
  (T5/mT5) against a FROZEN rate table — the per-tag rates derive
  batch-side from ``mix_tag_counts`` + ``temperature_mix_rates`` (the
  train-once artifact posture: a stream has no corpus to count), join
  stream-static (broadcast, bounded by the tag vocabulary), and
  membership is the same md5 threshold as the batch sampler, so a
  replayed document's decision EQUALS the batch decision bit-for-bit.

Both are stateless and append-mode-safe; no watermark needed.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame, functions as F


def streaming_bernoulli_sample(stream: DataFrame, id_col: str,
                               rate: float,
                               stratum_col: Optional[str] = None,
                               stratum_rates: Optional[Dict[str, float]]
                               = None) -> DataFrame:
    """Keep streamed rows whose md5(id) prefix falls under the (per-
    stratum) rate threshold — ``deterministic_sample`` online.  Pure
    row-local predicate: the same subset is selected on any engine, any
    replay, batch or stream."""
    from ..datapipe.sample import bernoulli_keep

    return stream.filter(bernoulli_keep(
        F.col(id_col), rate,
        F.col(stratum_col) if stratum_col and stratum_rates else None,
        stratum_rates))


def streaming_temperature_mix(stream: DataFrame, rates: DataFrame,
                              tag_col: str = "lang",
                              id_col: str = "doc_id") -> DataFrame:
    """Admit each arriving document with its tag's frozen mix rate —
    ``temperature_mix_sample`` online.  ``rates`` is the bounded
    (tag, __n, __rate) frame from ``sample.temperature_mix_rates`` over
    batch-side counts (``mix_tag_counts`` persists them; refresh the
    artifact when the corpus mixture drifts).  The stream-static join
    broadcasts the rate table and the md5-threshold membership is the
    batch sampler's own expression, so replay == batch selection
    exactly; rows with a NULL/unknown tag belong to no corpus and drop,
    the batch contract."""
    if {"__n", "__rate"} & set(stream.columns):
        raise ValueError(
            "__n/__rate are reserved by streaming_temperature_mix")
    from ..datapipe.sample import _mix_membership

    return _mix_membership(stream, rates, tag_col, id_col)
