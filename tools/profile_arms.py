"""Arm-level profiler for the heavy bench entries (guide §1: measure first).

Times each sub-pipeline of dp_neardup_scale / dp_lang_id / dp_text_stats
with the same noop-write action bench.py uses, min over PASSES passes after
one warm-up, inside ONE warm session so fixed JVM costs cancel.

Usage: python tools/profile_arms.py [neardup|langid|textstats|headline] ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("PROFILE_PASSES", "3"))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(name, df_fn):
    _noop(df_fn())  # warm-up
    best = None
    for _ in range(PASSES):
        t0 = time.time()
        _noop(df_fn())
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"  {name:32s} {best:7.3f} s")
    return best


def profile_neardup(spark):
    import __spark_entry__ as ent
    from pyspark.sql import functions as F
    from yupana_spark.datapipe.dedup import (embedding_neardup_pairs_ivf,
                                             minhash_cross_pairs,
                                             minhash_dedup_pairs,
                                             simhash_near_pairs)

    print("== dp_neardup_scale arms ==")
    # populate the artifact memo exactly as the bench does
    _noop(ent.queries()["dp_neardup_scale"](spark, SF_DIR))
    akey = (spark.sparkContext.applicationId, SF_DIR)
    arts, sigs, cells, banded, ex_mh, ex_sh, ex_el = ent._NEARDUP_ARTS[akey]
    docs = ent._docs(spark, SF_DIR)
    emb = ent._emb(spark, SF_DIR)
    n_emb = ent._fixture_count(spark, SF_DIR, "embeddings", emb)

    mh = lambda: minhash_dedup_pairs(docs, threshold=0.5, artifacts=arts,
                                     banded=banded).select("id_a", "id_b")
    sh = lambda: simhash_near_pairs(docs, max_hamming=3,
                                    sigs=sigs).select("id_a", "id_b")
    el = lambda: embedding_neardup_pairs_ivf(
        emb, threshold=0.45, n=n_emb, cache_key=SF_DIR,
        dedupe=False, cells=cells).select("id_a", "id_b")
    idp = F.pmod(F.col("id"), 2)
    cr = lambda: minhash_cross_pairs(
        docs, docs, threshold=0.5,
        artifacts_a=arts.filter(idp == 0), artifacts_b=arts.filter(idp == 1),
        pair_gate=None,
        banded_a=banded.filter(idp == 0),
        banded_b=banded.filter(idp == 1)).select("id_a", "id_b")

    timeit("mh pipeline", mh)
    timeit("sh pipeline", sh)
    timeit("el pipeline", el)
    timeit("cr pipeline", cr)
    timeit("row(mh)", lambda: ent._completeness_row("m", ex_mh, mh()))
    timeit("row(sh)", lambda: ent._completeness_row("s", ex_sh, sh()))
    timeit("row(el)", lambda: ent._completeness_row("e", ex_el, el(),
                                                    tol_frac=0.1))
    pa, pb = F.col("id_a"), F.col("id_b")
    ex_cr = (ex_mh.filter(F.pmod(pa, 2) != F.pmod(pb, 2))
             .select(F.when(F.pmod(pa, 2) == 0, pa).otherwise(pb)
                     .alias("id_a"),
                     F.when(F.pmod(pa, 2) == 0, pb).otherwise(pa)
                     .alias("id_b")))
    timeit("row(cr)", lambda: ent._completeness_row("c", ex_cr, cr()))
    timeit("FULL bundle",
           lambda: ent.queries()["dp_neardup_scale"](spark, SF_DIR))


def profile_langid(spark):
    import __spark_entry__ as ent
    from pyspark.sql import functions as F
    from yupana_spark.datapipe.bpe import bpe_roundtrip_ok
    from yupana_spark.datapipe.ppx import (bigram_lm_fit, bigram_xent_scores,
                                           ppx_buckets)
    from yupana_spark.datapipe.text import lang_id, unigram_lm_scores

    print("== dp_lang_id arms ==")
    _noop(ent.queries()["dp_lang_id"](spark, SF_DIR))
    docs = ent._docs(spark, SF_DIR, fan_out=True)
    st, tok = ent._artifacts(), ent._fx_token(SF_DIR, "documents")
    lang = lambda: docs.select("doc_id",
                               lang_id(F.col("text")).alias("lang_pred"))
    xent = lambda: unigram_lm_scores(docs, vocab_cap=1 << 20,
                                     cache_key=SF_DIR, store=st,
                                     store_token=tok) \
        .withColumnRenamed("id", "doc_id")
    toked = ent._bpe_toked(spark, SF_DIR)
    bpe = lambda: toked.select(
        "doc_id",
        bpe_roundtrip_ok(F.col("__w"), F.col("__t")).alias("bpe_roundtrip"))
    ppx_art = bigram_lm_fit(docs.filter(F.col("source") == "src0"),
                            cache_key=f"{SF_DIR}:src0", store=st,
                            store_token=tok)
    bx = lambda: bigram_xent_scores(docs, ppx_art) \
        .withColumnRenamed("id", "doc_id")
    timeit("lang (row-local)", lang)
    timeit("xent (unigram LM)", xent)
    timeit("bpe roundtrip", bpe)
    timeit("bx (bigram LM)", bx)
    joined = lambda: (lang().join(xent(), "doc_id", "left")
                      .join(bpe(), "doc_id", "left")
                      .join(bx(), "doc_id", "left"))
    timeit("4-frame join", joined)
    ckey = (spark.sparkContext.applicationId, SF_DIR)
    cuts = ent._PPX_CUTS[ckey]
    timeit("FULL (join+buckets)",
           lambda: ppx_buckets(joined(), "big_xent", ("lang_pred",),
                               cuts=cuts).withColumnRenamed("bucket",
                                                            "ppx_bucket"))


def profile_headline(spark):
    import __spark_entry__ as ent

    print("== headline singles ==")
    qs = ent.queries()
    for n in ["q_day_rollup", "q_agg_stats", "q_tpch_q1", "q_lag_window",
              "q_link_two_hop", "dp_exact_dedup", "dp_ann_bruteforce"]:
        timeit(n, lambda n=n: qs[n](spark, SF_DIR))


def main():
    from yupana_spark.session import get_spark

    which = set(sys.argv[1:]) or {"neardup", "langid", "headline"}
    spark = get_spark("arm-profile")
    spark.sparkContext.setLogLevel("ERROR")
    if "neardup" in which:
        profile_neardup(spark)
    if "langid" in which:
        profile_langid(spark)
    if "headline" in which:
        profile_headline(spark)


if __name__ == "__main__":
    main()
