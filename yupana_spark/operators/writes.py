"""Write path: put / UPSERT / warehouse storage.

Reference: TsdbBase.scala:362-413 (``put(dataPoints)`` upserts cells keyed by
(time, dims)), SqlParser.scala:326-334 + SqlQueryProcessor.scala:86-117
(``UPSERT INTO t (cols) VALUES ...``), ChangelogDao (update-intervals
bookkeeping, TsdbBase.scala:415-423).

Spark design: a Warehouse directory holds one parquet dataset per table,
partitioned by a day-bucket column (``rowTimeSpan`` ≙ partition granularity:
partition pruning replaces the reference's baseTime range scans).  Upsert =
key-based merge (existing rows whose primary key collides with incoming rows
are replaced) implemented as ``left_anti`` + ``unionByName`` + atomic swap —
on a production lake this maps 1:1 onto Delta/Iceberg MERGE; plain parquet is
used here because the container ships without Delta.  At 100 TB the merge
only rewrites the partitions that contain incoming keys (partition values are
derived from incoming data and pushed as a filter on the existing side).
"""

from __future__ import annotations

import dataclasses as _dataclasses
import datetime as _dt
import os
import shutil
import tempfile
import uuid
from typing import Any, Dict, Iterable, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schema import Schema, Table

BUCKET_COL = "__month"
CHANGELOG = "_changelog"
# sidecar carrying a content-identical rewrite's pre-compact artifact
# token (compact() writes it; any content-changing write swaps it away)
TOKEN_PIN = "__token_pin"
# sidecar recording WHICH column the table's __month buckets derive from
# (written by every partitioned _write): compact() re-derives buckets
# from the recorded column only — without provenance it keeps the
# existing partition values verbatim, so an ad-hoc write_table(
# time_col='ts') table whose frame also contains the schema-declared
# time column can never get its buckets silently re-derived from the
# wrong column (advice r9)
BUCKET_PIN = "__bucket_pin"

_FIXER_UDFS: dict = {}


def _item_fixer_udf(fn):
    """Vectorized (Arrow) wrapper for the schema's item_fixer hook; memoized
    per hook so repeated upserts reuse one UDF registration."""
    from pyspark.sql import types as T

    key = id(fn)
    if key not in _FIXER_UDFS:
        @F.pandas_udf(T.StringType())
        def fixer(s: pd.Series) -> pd.Series:
            return s.map(lambda v: None if v is None else fn(v))

        _FIXER_UDFS[key] = fixer
    return _FIXER_UDFS[key]


@_dataclasses.dataclass
class UpdatesIntervalsFilter:
    """SHOW UPDATES_INTERVALS WHERE surface (UpdatesIntervalsProvider.scala
    :95-117 ``UpdatesIntervalsFilter``): the provider accepts exactly
    ``table = s``, ``updated_at BETWEEN a AND b``, ``recalculated_at
    BETWEEN a AND b``, ``recalculated_at >= a`` and ``updated_by = s``
    (AND-combined); anything else is an "Unsupported condition"."""

    table_name: Optional[str] = None
    updated_after: Optional[_dt.datetime] = None
    updated_before: Optional[_dt.datetime] = None
    recalculated_after: Optional[_dt.datetime] = None
    recalculated_before: Optional[_dt.datetime] = None
    updated_by: Optional[str] = None


class Warehouse:
    """Writable table store layered over the read-only sf_dir fixtures."""

    def __init__(self, spark: SparkSession, schema: Schema, sf_dir: str,
                 root: Optional[str] = None, user: str = "anonymous"):
        self.spark = spark
        self.schema = schema
        self.sf_dir = sf_dir
        self.root = root or tempfile.mkdtemp(prefix="yupana_wh_")
        # ≙ the authenticated principal the reference stamps on every
        # changelog row (UpdateInterval.updatedBy); auth itself is out of
        # scope, so the writer identity is a plain constructor knob
        self.user = user

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def artifact_store(self):
        """Fitted-artifact store under THIS warehouse root (≙ the
        reference materializing its inverted index next to the data,
        ItemsInvertedIndexImpl.scala): LM vocabularies, codebooks, merge
        tables and signature indexes fit once per corpus version and
        survive engine restarts over the same root."""
        from ..datapipe.artifacts import ArtifactStore

        return ArtifactStore(os.path.join(self.root, "_artifacts"))

    def table_token(self, table: str) -> str:
        """Corpus version fingerprint for ``table`` — the LIVE source: the
        warehouse copy when the table has been written, else the sf_dir
        fixture.  Any CONTENT-changing write through this warehouse
        changes it, which is the artifact invalidation contract; a
        ``compact()`` re-layout pins the pre-compact token in a sidecar
        (content identical ⇒ fitted artifacts stay valid) and the next
        real write swaps the sidecar away."""
        from ..datapipe.artifacts import corpus_token

        if self.exists(table):
            pin = os.path.join(self.path(table), TOKEN_PIN)
            if os.path.exists(pin):
                with open(pin) as f:
                    return f.read().strip()
            return corpus_token(self.path(table))
        return corpus_token(os.path.join(self.sf_dir, f"{table}.parquet"))

    def exists(self, table: str) -> bool:
        return os.path.exists(self.path(table))

    def read(self, table: str) -> DataFrame:
        """Warehouse copy if the table was written, else the sf_dir fixture."""
        if self.exists(table):
            df = self.spark.read.parquet(self.path(table))
            return df.drop(BUCKET_COL) if BUCKET_COL in df.columns else df
        return self.schema.load(self.spark, self.sf_dir, table)

    # -- core upsert -----------------------------------------------------------
    def upsert(self, table: str, incoming: DataFrame,
               keys: Optional[Sequence[str]] = None) -> int:
        """Merge ``incoming`` into ``table`` by primary key (time + dims)."""
        t = self.schema.table(table)
        if keys is None:
            keys = ["time"] + [d.name for d in t.dimensions]
        current = self.read(table)
        for c in current.columns:
            if c not in incoming.columns:
                incoming = incoming.withColumn(c, F.lit(None).cast(
                    current.schema[c].dataType))
        incoming = incoming.select(*current.columns)
        # ItemFixer: canonicalize item-like (hash) dimension values before
        # they become part of the row key (Schema.scala itemFixer).  Arrow-
        # batched pandas_udf: ingest is a hot path and a row-at-a-time
        # Python UDF would pickle per cell.
        if self.schema.item_fixer is not None:
            fixer = _item_fixer_udf(self.schema.item_fixer)
            for d in t.dimensions:
                if d.kind == "hash" and d.name in incoming.columns:
                    incoming = incoming.withColumn(d.name, fixer(F.col(d.name)))
        # last-write-wins inside the batch too (HBase put semantics: later
        # cells overwrite earlier ones at the same row key)
        from pyspark.sql import Window

        incoming = incoming.withColumn("__seq", F.monotonically_increasing_id())
        w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
            F.col("__seq").desc())
        incoming = (incoming.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1).drop("__rn", "__seq"))
        incoming = incoming.cache()
        n_in = incoming.count()
        # null-safe key equality: dims may be NULL and plain equality would
        # keep stale rows (SQL NULL != NULL); eqNullSafe matches HBase's
        # byte-identical row keys
        cur = current.alias("cur")
        inc = incoming.select(*keys).distinct().alias("inc")
        cond = None
        for k in keys:
            c = F.col(f"cur.{k}").eqNullSafe(F.col(f"inc.{k}"))
            cond = c if cond is None else (cond & c)
        kept = cur.join(inc, cond, "left_anti")
        merged = kept.unionByName(incoming)
        # ingest-time dictionary ids (Dictionary.scala insertion semantics)
        # must be assigned from the PRE-merge state so replays are no-ops
        self._update_dictionaries(t, current, incoming)
        self._write(table, merged, t)
        self._log_interval(table, incoming)
        incoming.unpersist()
        return n_in

    def put_rows(self, table: str, rows: Iterable[Dict[str, Any]]) -> int:
        """``put(dataPoints)`` — dict rows keyed by column name."""
        t = self.schema.table(table)
        current = self.read(table)
        df = self.spark.createDataFrame(list(rows), schema=current.schema)
        return self.upsert(table, df)

    def upsert_values(self, table: str, columns: Sequence[str],
                      rows: Sequence[Sequence[Any]]) -> int:
        """SQL ``UPSERT INTO t (cols) VALUES ...`` (SqlParser.scala:326-334)."""
        t = self.schema.table(table)
        current = self.read(table)
        cols = list(columns)
        from pyspark.sql import types as T

        fields = []
        for c in cols:
            src = "time" if c == "time" else c
            fields.append(current.schema[src] if src in current.columns
                          else T.StructField(c, T.StringType()))
        def coerce(v, dtype):
            """SQL literals arrive as Decimal/int; align to the column type
            (≙ implicit const coercion, DataTypeUtils.scala:40-123)."""
            if v is None:
                return None
            import decimal

            if isinstance(dtype, (T.DoubleType, T.FloatType)):
                return float(v)
            if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType,
                                  T.ByteType)):
                return int(v)
            if isinstance(dtype, T.DecimalType) and not isinstance(
                    v, decimal.Decimal):
                return decimal.Decimal(str(v))
            return v

        data = [tuple(coerce(v, f.dataType) for v, f in zip(r, fields))
                for r in rows]
        df = self.spark.createDataFrame(
            data, schema=T.StructType(
                [T.StructField(c, f.dataType) for c, f in zip(cols, fields)]))
        if t.time_column != "time" and "time" in df.columns:
            df = df.withColumnRenamed("time", t.time_column) \
                   .withColumn("time", F.col(t.time_column))
        return self.upsert(table, df)

    def write_table(self, table: str, df: DataFrame,
                    time_col: str = "time") -> None:
        """Full (re)write, partitioned by day bucket."""
        t = self.schema.tables.get(table)
        self._write(table, df, t, time_col=time_col)

    # -- persisted dictionaries (Dictionary.scala:24-105) --------------------
    DICT_CAP = 100_000  # beyond this a dim is not dictionary-shaped
    # stale .old/.compact siblings younger than this are presumed to be
    # another writer's in-flight work and left alone by the sweep
    SWEEP_AGE_S = 3600.0

    def dict_path(self, table: str, dim: str) -> str:
        return os.path.join(self.root, "__dictionary", table,
                            f"{dim}.parquet")

    def load_dictionary(self, table: str, dim: str):
        """{value: id} for a persisted ingest-time dictionary, or None
        (never ingested, or demoted after outgrowing DICT_CAP)."""
        import pyarrow.parquet as pq

        path = self.dict_path(table, dim)
        if os.path.exists(path + ".demoted") or not os.path.exists(path):
            return None
        d = pq.read_table(path).to_pydict()
        return dict(zip(d["value"], d["id"]))

    def _demote_dictionary(self, table: str, dim: str) -> None:
        """A dim that outgrew DICT_CAP is not dictionary-shaped: DELETE the
        persisted mapping (so every value falls back to one consistent id
        rule instead of a silent dense-ids-for-old / hash-ids-for-new mix —
        round-4 advice) and leave a marker so later batches never re-seed."""
        path = self.dict_path(table, dim)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path + ".demoted", "w") as fh:
            fh.write("dictionary demoted: exceeded DICT_CAP "
                     f"{self.DICT_CAP}\n")
        if os.path.exists(path):
            os.remove(path)

    def _update_dictionaries(self, t: Table, current: DataFrame,
                             incoming: DataFrame) -> None:
        """Maintain ingest-time dictionaries for dictionary-kind dims.

        ≙ Dictionary.scala:24-105: the reference numbers values by insertion
        order as rows arrive.  Distributed ingest has no row order inside a
        batch, so the deterministic analogue is: first batch seeds from the
        PRE-upsert table in sorted-value order (keeping the recomputed
        sorted-id semantics of id() for never-ingested fixtures), and each
        batch's genuinely-new values append after the existing maximum,
        sorted within the batch.  Ids are append-only: replaying a batch or
        re-ingesting known values never renumbers anything.  Driver-side
        pyarrow files — dictionaries are bounded (DICT_CAP) by definition.
        """
        import pyarrow as pa
        import pyarrow.parquet as pq

        for d in t.dimensions:
            if d.kind != "dictionary" or d.name not in incoming.columns:
                continue
            if os.path.exists(self.dict_path(t.name, d.name) + ".demoted"):
                continue  # permanently hash-surrogate; never re-seed
            mapping = self.load_dictionary(t.name, d.name)
            if mapping is None:
                seed = (current.select(d.name).distinct()
                        .limit(self.DICT_CAP + 1).collect())
                if len(seed) > self.DICT_CAP:
                    self._demote_dictionary(t.name, d.name)
                    continue
                ordered = sorted(r[0] for r in seed if r[0] is not None)
                mapping = {v: i + 1 for i, v in enumerate(ordered)}
            new = (incoming.select(d.name).distinct()
                   .limit(self.DICT_CAP + 1).collect())
            fresh = sorted(r[0] for r in new
                           if r[0] is not None and r[0] not in mapping)
            if len(mapping) + len(fresh) > self.DICT_CAP:
                self._demote_dictionary(t.name, d.name)
                continue
            next_id = max(mapping.values(), default=0) + 1
            for v in fresh:
                mapping[v] = next_id
                next_id += 1
            path = self.dict_path(t.name, d.name)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            pq.write_table(pa.table({
                "value": list(mapping.keys()),
                "id": list(mapping.values()),
            }), path)

    # -- internals ---------------------------------------------------------------
    def _write(self, table: str, df: DataFrame, t: Optional[Table],
               time_col: str = "time") -> None:
        tmp = self.path(table) + "." + uuid.uuid4().hex[:8]
        out = df
        partition_by = []
        if time_col in df.columns:
            # month buckets: coarse enough to avoid small-file explosion at
            # test scale, still prunable; production would derive this from
            # Table.row_time_span_days
            out = df.withColumn(BUCKET_COL,
                                F.date_trunc("month", F.col(time_col)))
            partition_by = [BUCKET_COL]
        writer = out.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
        if partition_by:
            with open(os.path.join(tmp, BUCKET_PIN), "w") as f:
                f.write(time_col)
        self._swap_and_invalidate(table, tmp)

    def _swap_and_invalidate(self, table: str, tmp: str) -> None:
        """Install ``tmp`` as the live table dir and purge volume caches.

        Two adjacent renames (old out, new in) instead of rmtree+rename:
        the not-exists window shrinks from an unbounded directory delete
        to microseconds, and a crash between the renames leaves the data
        recoverable in the ``.old`` dir instead of gone.  A concurrent
        reader in that window still falls back to the fixture — callers
        that need stronger isolation must serialize writes with reads
        (the reference's HBase gets this from region-server atomicity).
        """
        import glob as _glob
        import logging as _logging

        final = self.path(table)
        # opportunistic sweep: a failed delete below leaks the `.old` dir
        # (and a crashed compact leaks its `.compact` tmp) — without this
        # repeated compact/upsert cycles would accumulate full table
        # copies inside the warehouse forever (advice r9).
        # * `.old.*` dirs are ALWAYS safe to sweep: they are the target
        #   of a completed rename and nothing ever writes into one.
        # * `.compact.*` may be another writer's IN-FLIGHT job, and the
        #   top-level mtime freezes at job start (Spark tasks write under
        #   _temporary/) — so the age guard uses the NEWEST mtime in the
        #   tree (review r10: task/attempt churn keeps updating deep
        #   entries while the job lives; a crashed job's tree goes quiet
        #   and ages past the horizon).
        import time as _time

        horizon = _time.time() - self.SWEEP_AGE_S

        def _last_activity(path: str) -> float:
            newest = 0.0
            n = 0
            for root, dirs, files in os.walk(path):
                for name in [""] + dirs + files:
                    try:
                        newest = max(newest, os.path.getmtime(
                            os.path.join(root, name) if name else root))
                    except OSError:
                        pass
                    n += 1
                    if n > 10_000:          # bound the walk; err young
                        return _time.time()
            return newest

        for stale in _glob.glob(final + ".old.*"):
            if stale != tmp:
                shutil.rmtree(stale, ignore_errors=True)
        for stale in _glob.glob(final + ".compact.*"):
            if stale != tmp and _last_activity(stale) <= horizon:
                shutil.rmtree(stale, ignore_errors=True)
        old = None
        if os.path.exists(final):
            old = final + ".old." + uuid.uuid4().hex[:8]
            os.rename(final, old)
        os.rename(tmp, final)
        if old is not None:
            try:
                shutil.rmtree(old)
            except OSError as e:
                _logging.getLogger(__name__).warning(
                    "delete of %s failed (%s) — leaving it for the next "
                    "write of %r to sweep", old, e, table)
        # volume-gate cache entries for this table are now stale — the next
        # query must re-stat the warehouse copy, or tune_for_volume would
        # keep the pre-write posture for a much larger table
        from ..compiler import Tsdb
        with Tsdb._BYTES_CACHE_LOCK:
            for k in [k for k in Tsdb._BYTES_CACHE
                      if k[1] == self.root and k[2] == table]:
                del Tsdb._BYTES_CACHE[k]
            Tsdb._BYTES_EPOCH += 1   # invalidate in-flight reader stats

    def compact(self, table: str, max_records_per_file: int = 0) -> dict:
        """Rewrite ``table`` with one output file per time-bucket partition
        (optionally re-split by ``max_records_per_file``), atomically.

        Each upsert's shuffle writes one file per task per month bucket, so
        a frequently-merged table accumulates many small parquet files per
        partition — the scan then pays per-file open/footer costs and the
        driver pays per-file listing (the classic small-file problem; the
        reference's HBase storage compacts regions itself, a parquet
        warehouse must do it explicitly).  Content is bit-identical: this
        is a physical re-layout, not a merge.

        Content is identical, so the table's artifact token is PINNED
        across the rewrite (``table_token`` returns the pre-compact token
        from a sidecar): fitted artifacts (LM vocabularies, codebooks,
        signature indexes) stay valid — a content-changing write swaps the
        sidecar away and invalidates as before.

        Returns {"files_before": n, "files_after": m} for auditing."""
        if not self.exists(table):
            raise KeyError(f"no warehouse copy of {table} to compact")
        path = self.path(table)

        def _nfiles() -> int:
            return sum(1 for _, _, fs in os.walk(path)
                       for f in fs if f.endswith(".parquet"))

        before = _nfiles()
        pinned = self.table_token(table)   # content-identical: keep it
        df = self.spark.read.parquet(path)
        # the bucket column is whatever _write RECORDED at write time
        # (BUCKET_PIN sidecar) — never re-derived from the schema: a
        # table written ad-hoc via write_table(time_col='ts') whose frame
        # also contains the schema-declared time column must keep its ts
        # buckets (advice r9)
        tcol = None
        pin_path = os.path.join(path, BUCKET_PIN)
        if os.path.exists(pin_path):
            with open(pin_path) as f:
                tcol = f.read().strip()
        if BUCKET_COL in df.columns and tcol and tcol in df.columns:
            # one shuffle partition per bucket -> one file per partition
            # dir (AQE coalesces the empty ones); rows time-sorted inside
            # each file so parquet row-group min/max stats prune time
            # predicates tighter than the month bucket alone
            out = (df.repartition(F.col(BUCKET_COL))
                   .sortWithinPartitions(tcol).drop(BUCKET_COL))
            writer = (out.withColumn(BUCKET_COL,
                                     F.date_trunc("month", F.col(tcol)))
                      .write.mode("overwrite").partitionBy(BUCKET_COL))
        elif BUCKET_COL in df.columns:
            # bucketed but provenance unknown (no sidecar — a pre-existing
            # dir): keep the existing partition values VERBATIM instead of
            # guessing a derivation column — but still time-sort inside
            # each file when the schema declares a present time column
            # (sorting cannot change bucket values, only row-group min/max
            # pruning; review r10 — the pre-pin fallback used to re-derive
            # AND sort, re-deriving was the bug, sorting was not)
            t = self.schema.tables.get(table)
            sort_col = t.time_column if t is not None else "time"
            if sort_col not in df.columns and "time" in df.columns:
                sort_col = "time"
            out = df.repartition(F.col(BUCKET_COL))
            if sort_col in df.columns:
                out = out.sortWithinPartitions(sort_col)
            writer = out.write.mode("overwrite").partitionBy(BUCKET_COL)
        else:
            out = df.coalesce(1)
            writer = out.write.mode("overwrite")
        if max_records_per_file:
            writer = writer.option("maxRecordsPerFile",
                                   str(max_records_per_file))
        tmp = path + ".compact." + uuid.uuid4().hex[:8]
        writer.parquet(tmp)
        with open(os.path.join(tmp, TOKEN_PIN), "w") as f:
            f.write(pinned)
        if tcol and BUCKET_COL in df.columns:
            # provenance survives the re-layout for the NEXT compact
            with open(os.path.join(tmp, BUCKET_PIN), "w") as f:
                f.write(tcol)
        self._swap_and_invalidate(table, tmp)
        return {"files_before": before, "files_after": _nfiles()}

    def _log_interval(self, table: str, incoming: DataFrame) -> None:
        """Changelog: record which (table, day) windows were rewritten."""
        if "time" not in incoming.columns:
            return
        days = (incoming.select(F.date_trunc("day", F.col("time")).alias("day"))
                .distinct()
                .withColumn("table_name", F.lit(table))
                .withColumn("updated_at", F.current_timestamp())
                .withColumn("updated_by", F.lit(self.user)))
        path = os.path.join(self.root, CHANGELOG)
        days.write.mode("append").parquet(path)

    def updates_intervals(
            self, flt: Optional[UpdatesIntervalsFilter] = None) -> DataFrame:
        """The changelog, optionally filtered per the reference provider
        (UpdatesIntervalsProvider.scala:95-117 + ChangelogDaoHBase.scala
        :77-175 filter semantics).  Columns: (day, table_name, updated_at,
        updated_by, from_time, to_time) — the rewritten window is the day
        bucket, so from_time = day and to_time = day + 1 day (≙ the
        reference's ``time .. time + rowTimeSpan``).

        Filter mapping (mirroring the HBase DAO):
        * ``table_name`` — equality;
        * ``updated_after/before`` — ``updated_at`` BETWEEN when both
          bounds are set, ``>= after`` when only the lower is; a
          before-only bound applies NO filter (dateRangeFilter's
          ``case _ => None`` — mirrored exactly);
        * ``recalculated_after/before`` both set — the window filter:
          from_time BETWEEN a AND b, OR (from_time <= a AND to_time >= a);
          only ``recalculated_after`` — from_time >= a;
        * ``updated_by`` — equality (rows from pre-``user`` changelogs read
          back as 'anonymous' via the schema-merge coalesce).
        """
        path = os.path.join(self.root, CHANGELOG)
        if not os.path.exists(path):
            from pyspark.sql import types as T

            df = self.spark.createDataFrame([], T.StructType([
                T.StructField("day", T.TimestampType()),
                T.StructField("table_name", T.StringType()),
                T.StructField("updated_at", T.TimestampType()),
                T.StructField("updated_by", T.StringType()),
            ]))
        else:
            df = self.spark.read.option("mergeSchema", "true").parquet(path)
            if "updated_by" not in df.columns:
                df = df.withColumn("updated_by", F.lit(None).cast("string"))
        df = (df.withColumn("updated_by",
                            F.coalesce(F.col("updated_by"),
                                       F.lit("anonymous")))
              .withColumn("from_time", F.col("day"))
              .withColumn("to_time",
                          F.col("day") + F.expr("INTERVAL 1 DAY")))
        if flt is None:
            return df
        if flt.table_name is not None:
            df = df.filter(F.col("table_name") == F.lit(flt.table_name))
        if flt.updated_after is not None and flt.updated_before is not None:
            df = df.filter(F.col("updated_at").between(
                F.lit(flt.updated_after), F.lit(flt.updated_before)))
        elif flt.updated_after is not None:
            # reference ChangelogDaoHBase.dateRangeFilter:88-142 — only
            # (Some(from), _) applies a bound alone (updated_at >= from);
            # (None, Some(to)) falls to `case _ => None`, i.e. a
            # before-only bound applies NO filter.  Mirrored exactly: the
            # admin WHERE surface only produces BETWEEN anyway, so the
            # before-only shape is reachable solely from programmatic
            # filters, where reference parity wins.
            df = df.filter(F.col("updated_at") >= F.lit(flt.updated_after))
        if flt.recalculated_after is not None:
            a = F.lit(flt.recalculated_after)
            if flt.recalculated_before is not None:
                b = F.lit(flt.recalculated_before)
                df = df.filter(F.col("from_time").between(a, b)
                               | ((F.col("from_time") <= a)
                                  & (F.col("to_time") >= a)))
            else:
                df = df.filter(F.col("from_time") >= a)
        if flt.updated_by is not None:
            df = df.filter(F.col("updated_by") == F.lit(flt.updated_by))
        return df
