"""Sequence packing: group documents into fixed token-budget packs.

Beyond the reference's surface (BASELINE.json north star).  Pretraining
pipelines concatenate documents into fixed-length training sequences; the
packing step assigns each doc to a pack so that packs fill the token budget
with minimal waste.

Scale shape: optimal bin packing is NP-hard and inherently sequential, so
the distributed form shards docs by key hash into N independent buckets and
runs greedy first-fit-decreasing (FFD ≤ 11/9·OPT + 1) inside each bucket
with an Arrow-batched ``applyInPandas`` — no global sort, one shuffle on the
bucket key, per-bucket state bounded by the bucket's doc count.  Pack ids
are (bucket, local) pairs, so the assignment is deterministic for a given
key set regardless of cluster layout or input partitioning.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F, types as T


def pack_sequences(df: DataFrame, id_col: str = "doc_id",
                   tokens_col: str = "n_tokens", budget: int = 2048,
                   num_buckets: int = 256) -> DataFrame:
    """(id, n_tokens, pack_id): first-fit-decreasing packing per hash bucket.

    Docs longer than ``budget`` get a singleton pack (truncation/splitting
    is the tokenizer's concern, not the packer's).  ``pack_id`` is
    ``bucket * 2^32 + local_pack`` — stable across runs/partitionings
    because the bucket is a pure key hash and the in-bucket order is
    (tokens desc, id).
    """
    out_schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("pack_id", T.LongType()),
    ])

    def pack_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__t", "__i"],
                              ascending=[False, True]).reset_index(drop=True)
        bucket = int(pdf["__b"].iloc[0])
        # first-fit over open packs; packs stay few (budget/mean_len docs
        # each), linear scan is fine per bucket
        remaining: list = []   # remaining capacity per open pack
        assign = []
        for t in pdf["__t"]:
            t = int(t)
            placed = None
            if t <= budget:
                for j, cap in enumerate(remaining):
                    if t <= cap:
                        placed = j
                        remaining[j] = cap - t
                        break
            if placed is None:
                placed = len(remaining)
                remaining.append(max(budget - t, 0))
            assign.append(placed)
        base = bucket << 32
        return pd.DataFrame({
            "id": pdf["__i"],
            "n_tokens": pdf["__t"],
            "pack_id": [base + a for a in assign],
        })

    prepared = df.select(
        F.col(id_col).cast("long").alias("__i"),
        F.col(tokens_col).cast("long").alias("__t"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_buckets)).alias("__b"),
    )
    return prepared.groupBy("__b").applyInPandas(pack_bucket, out_schema)


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", window: int = 64,
                    stride: int = 48) -> DataFrame:
    """Overlapping word-window chunks for context-window training prep.

    (doc_id, chunk_no, start_word, n_words, chunk_text): chunk i covers
    words [i*stride, i*stride + window); a doc of n words yields
    ``1 if n <= window else ceil((n - window)/stride) + 1`` chunks, so every
    word is covered and consecutive chunks overlap by ``window - stride``
    words (the standard sliding-window split).  Pure JVM expressions — one
    scan, an explode, no shuffle; at corpus scale the explode factor is
    ~n_words/stride and rides the same partitioning as the scan.
    """
    from .text import words

    w = words(F.col(text_col))
    prepared = df.select(
        F.col(id_col),
        w.alias("__w"),
        F.size(w).alias("__n"),
    ).select(
        id_col, "__w", "__n",
        F.when(F.col("__n") <= window, F.lit(1))
        .otherwise(F.ceil((F.col("__n") - F.lit(window)) / F.lit(stride))
                   .cast("int") + 1).alias("__k"),
    )
    start = F.col("chunk_no") * stride
    return (prepared
            .select(id_col, "__w", "__n",
                    F.explode(F.sequence(F.lit(0), F.col("__k") - 1))
                    .alias("chunk_no"))
            .select(F.col(id_col), "chunk_no",
                    start.alias("start_word"),
                    (F.least(start + window, F.col("__n")) - start)
                    .alias("n_words"),
                    F.array_join(F.slice("__w", start + F.lit(1), window), " ")
                    .alias("chunk_text")))


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """One row: packs, docs, fill ratio (packed tokens / pack capacity) —
    the waste metric to tune ``budget``/``num_buckets`` against."""
    per_pack = (packed.groupBy("pack_id")
                .agg(F.sum("n_tokens").alias("tok"),
                     F.count("*").alias("docs")))
    return per_pack.agg(
        F.count("*").alias("packs"),
        F.sum("docs").alias("docs"),
        F.round(F.sum(F.least(F.col("tok"), F.lit(budget)))
                / (F.count("*") * budget), 4).alias("fill_ratio"))


def _shard_phase1(per_pack: DataFrame, size_col: str, order_col: str,
                  num_partitions: int) -> DataFrame:
    """Phase 1 of the two-phase shard cumsum: range partitions + a
    PARTITIONED window.  Exposed so tools/explain_audit.py can explain this
    exact plan (assign_shards checkpoints it eagerly, so the window never
    appears in the returned DataFrame's plan) and pin the no-unpartitioned-
    window invariant."""
    local_w = (Window.partitionBy("__pid").orderBy(order_col)
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (per_pack
            .repartitionByRange(num_partitions, F.col(order_col))
            .sortWithinPartitions(order_col)
            .withColumn("__pid", F.spark_partition_id())
            .withColumn("__cum",
                        F.sum(F.col(size_col).cast("long")).over(local_w)))


def assign_shards(per_pack: DataFrame, size_col: str = "n_tokens",
                  order_col: str = "pack_id",
                  shard_budget: int = 1 << 20,
                  num_partitions: int | None = None) -> DataFrame:
    """Deterministic shard assignment for packed sequences — the
    dataloader-facing output stage: contiguous packs (by ``order_col``) are
    grouped into shards of ~``shard_budget`` tokens by running prefix
    offset, so shard layout is a pure function of the pack list (re-running
    the writer never reshuffles shards).

    A pack straddling a budget boundary lands in the shard its START
    offset falls in, so every shard holds < budget + max_pack_size tokens
    and >= budget - max_pack_size (except the last) — the invariant the
    dp_pack_sequences verdict rows check.

    The prefix sum is a TWO-PHASE cumsum, never a global unpartitioned
    window (a 100 TB corpus at 2048-token packs is ~1e10 manifest rows —
    far too many for one partition): range-partition on ``order_col``,
    cumsum WITHIN each partition (a partitioned window), reduce the
    per-partition totals to the driver (bounded: one row per partition),
    turn them into cumulative start offsets, and broadcast-join the
    offsets back so the global prefix is ``partition_offset + local_cum``.
    The manifest is localCheckpointed before phase 2 so both the totals
    job and the final action observe the SAME physical partitioning
    (``spark_partition_id`` is only meaningful against one materialized
    layout).  Output is independent of ``num_partitions``: the prefix
    offsets depend only on the global ``order_col`` order.
    """
    spark = per_pack.sparkSession
    if num_partitions is None:
        try:
            num_partitions = int(
                spark.conf.get("spark.sql.shuffle.partitions", "32"))
        except ValueError:            # e.g. AQE 'auto' on managed runtimes
            num_partitions = 200
    local = _shard_phase1(per_pack, size_col, order_col,
                          num_partitions).localCheckpoint(eager=True)
    # phase 2: per-partition totals -> driver.  Bounded collect: exactly
    # one row per non-empty partition (== num_partitions, never data-sized).
    totals = (local.groupBy("__pid").agg(F.max("__cum").alias("__t"))
              .collect())
    acc = 0
    offsets = []
    for r in sorted(totals, key=lambda r: r["__pid"]):
        offsets.append((int(r["__pid"]), acc))
        acc += int(r["__t"])
    off_df = per_pack.sparkSession.createDataFrame(
        offsets or [(0, 0)],
        T.StructType([T.StructField("__pid", T.IntegerType()),
                      T.StructField("__off", T.LongType())]))
    start = F.col("__off") + F.col("__cum") - F.col(size_col).cast("long")
    return (local.join(F.broadcast(off_df), "__pid")
            .withColumn("shard_id",
                        F.floor(start / F.lit(shard_budget)).cast("long"))
            .drop("__pid", "__cum", "__off"))


def chunk_token_sequences(df: DataFrame, tokens_col: str = "tokens",
                          id_col: str = "doc_id", window: int = 2048,
                          stride: Optional[int] = None) -> DataFrame:
    """(doc_id, chunk_no, start_tok, n_tokens, chunk_tokens): sliding
    windows over a TOKEN array column — the token-level twin of
    ``chunk_documents`` (which windows words) for pipelines that already
    materialized real tokenizer output (``bpe.bpe_tokens``).

    Same coverage law: chunk i covers tokens [i*stride, i*stride+window);
    a doc of n tokens yields ``1 if n <= window else
    ceil((n - window)/stride) + 1`` chunks (an empty doc yields one empty
    chunk), so every token is covered and consecutive chunks overlap by
    ``window - stride``.  Pure JVM slice/explode — one scan, no shuffle.
    """
    stride = window if stride is None else stride
    # NULL token arrays (e.g. tokens left-joined onto docs) normalize to
    # empty: F.size(NULL) is -1, which would otherwise flow a negative
    # n_tokens into the packer and INCREASE pack capacity
    toks = F.coalesce(
        F.col(tokens_col),
        F.array().cast(df.schema[tokens_col].dataType))
    prepared = df.select(
        F.col(id_col),
        toks.alias("__t"),
        F.size(toks).alias("__n"),
    ).select(
        id_col, "__t", "__n",
        F.when(F.col("__n") <= window, F.lit(1))
        .otherwise(F.ceil((F.col("__n") - F.lit(window)) / F.lit(stride))
                   .cast("int") + 1).alias("__k"),
    )
    start = F.col("chunk_no") * stride
    return (prepared
            .select(id_col, "__t", "__n",
                    F.explode(F.sequence(F.lit(0), F.col("__k") - 1))
                    .alias("chunk_no"))
            .select(
                id_col, "chunk_no",
                start.alias("start_tok"),
                F.least(F.col("__n") - start, F.lit(window))
                .cast("int").alias("n_tokens"),
                F.slice(F.col("__t"), start + 1, window)
                .alias("chunk_tokens")))


def build_training_shards(df: DataFrame, merges, text_col: str = "text",
                          id_col: str = "doc_id", seq_len: int = 128,
                          stride: Optional[int] = None, budget: int = 512,
                          shard_budget: int = 1 << 14):
    """The composed LLM-data prep pipeline, REAL tokens end to end:
    normalize -> BPE-tokenize (trained ``merges``) -> sliding token
    windows (``chunk_token_sequences``) -> token-budget FFD packing
    (``pack_sequences``) -> deterministic shard manifest
    (``assign_shards``).  Returns (chunks, packed, manifest).

    Chunk identity: ``chunk_id = doc_id * 2^20 + chunk_no`` (documented
    cap: <= 2^20 chunks/doc — a million seq_len windows per document is
    beyond any real corpus row).  Conservation laws the test pins:
    * sum of chunk token counts == sum over docs of token counts
      (overlap-adjusted when stride < seq_len);
    * every chunk appears in exactly one pack, packs respect ``budget``
      except singleton overlength chunks (impossible when budget >=
      seq_len, the sane configuration);
    * shard totals conserve the packed totals.
    Every stage is the already-audited operator — this function only
    fixes the plumbing between them."""
    from .bpe import bpe_tokens
    from .text import normalize_text, words

    staged = df.withColumn("__w", words(normalize_text(F.col(text_col))))
    toked = staged.select(
        F.col(id_col),
        bpe_tokens(F.col("__w"), merges).alias("tokens"))
    chunks = (chunk_token_sequences(toked, "tokens", id_col,
                                    window=seq_len, stride=stride)
              .withColumn("chunk_id",
                          F.col(id_col).cast("long") * F.lit(1 << 20)
                          + F.col("chunk_no")))
    packed = pack_sequences(chunks, id_col="chunk_id",
                            tokens_col="n_tokens", budget=budget)
    per_pack = packed.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("n_tokens"),
        F.count("*").alias("n_chunks"))
    manifest = assign_shards(per_pack, shard_budget=shard_budget)
    return chunks, packed, manifest
