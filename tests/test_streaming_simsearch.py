"""Streaming ANN / SemDeDup probe twins (streaming/simsearch.py): replay
== batch parity against the frozen IVF/PQ artifacts, plus independent
falsifiers (probe-set recomputation, planted exact duplicate, numpy
best-cosine mirror)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"


def _replay(spark, tmp_path, df, name, chunks=3):
    """Chunked availableNow replay of a batch frame, ordered by vec_id."""
    src = tmp_path / f"{name}_src"
    src.mkdir()
    ids = sorted(r["vec_id"] for r in df.select("vec_id").collect())
    bounds = [ids[i * len(ids) // chunks] for i in range(1, chunks)]
    lo = None
    for i, hi in enumerate(bounds + [None]):
        part = df
        if lo is not None:
            part = part.filter(F.col("vec_id") >= lo)
        if hi is not None:
            part = part.filter(F.col("vec_id") < hi)
        part.coalesce(1).write.parquet(str(src / f"c{i}"))
        lo = hi
    return (spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1).parquet(str(src / "*")))


def _run(spark, tmp_path, out, name):
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / f"{name}_ck"))
         .trigger(availableNow=True).start())
    try:
        q.awaitTermination()
        return spark.table(name).collect()
    finally:
        q.stop()
        spark.catalog.dropTempView(name)


def test_streaming_ann_probe_matches_batch(spark, tmp_path):
    """Streamed (cell, probed, adc) of every replayed vector equals the
    batch evaluation of the same frozen artifacts; the probe set equals
    an independent numpy recomputation of ivf_topk's choice; and the
    query's own vector is probed with the top ADC score (its code is
    the one nearest the LUT by construction)."""
    from yupana_spark.datapipe.simsearch import kmeans_fit, pq_fit
    from yupana_spark.streaming.simsearch import (probe_cells,
                                                  streaming_ann_probe)

    emb = (spark.read.parquet(SF_SMALL + "/embeddings.parquet")
           .select("vec_id", "embedding"))
    centers = kmeans_fit(emb, 8, id_col="vec_id", n=500)
    books = pq_fit(emb, m=8, id_col="vec_id", n=500)
    qv = [float(x) for x in
          emb.filter("vec_id = 0").collect()[0]["embedding"]]
    # independent probe-set mirror (the ivf_topk selection, recomputed)
    d = ((np.asarray(centers) - np.asarray(qv)[None, :]) ** 2).sum(axis=1)
    want_probe = set(np.argsort(d)[:3].tolist())
    assert set(probe_cells(centers, qv, 3)) == want_probe

    batch = {r["id"]: (r["cell"], r["probed"], r["adc"])
             for r in streaming_ann_probe(
                 emb, centers, books, qv, nprobe=3).collect()}
    assert len(batch) == 500
    stream = _replay(spark, tmp_path, emb, "ann")
    streamed = {r["id"]: (r["cell"], r["probed"], r["adc"])
                for r in _run(spark, tmp_path,
                              streaming_ann_probe(stream, centers, books,
                                                  qv, nprobe=3), "sann")}
    assert streamed == batch
    # the query vector itself: probed (its cell is the nearest centroid)
    # and carries the maximum ADC score of the whole corpus
    assert batch[0][1] is True
    assert batch[0][0] in want_probe
    # ... and sits in the top ADC ranks (its code is the nearest-by-L2
    # centroid per subspace, which tracks but does not strictly maximize
    # the inner-product LUT — hence top-10, not exactly max)
    top10 = sorted((v[2] for v in batch.values()), reverse=True)[:10]
    assert batch[0][2] >= top10[-1]
    # probed == cell-membership of the frozen probe set, row for row
    for _id, (cell, probed, _adc) in batch.items():
        assert probed == (cell in want_probe)


def test_streaming_ivfadc_probe_matches_batch(spark, tmp_path):
    """The residual-coded probe: streamed == batch on a replay, the
    probe set equals the masked-inner-product mirror, and every (cell,
    adc) equals a full numpy recomputation of the IVFADC math (coarse
    assign -> residual -> per-subspace argmin codes -> <q,c> + LUT
    sum)."""
    from yupana_spark.datapipe.simsearch import (ivfadc_fit,
                                                 ivfadc_probe_cells)
    from yupana_spark.streaming.simsearch import streaming_ivfadc_probe

    emb = (spark.read.parquet(SF_SMALL + "/embeddings.parquet")
           .select("vec_id", "embedding"))
    centers, books = ivfadc_fit(emb, n_centroids=8, m=8, id_col="vec_id",
                                n=500)
    qv = [float(x) for x in
          emb.filter("vec_id = 3").collect()[0]["embedding"]]
    probe = ivfadc_probe_cells(centers, qv, 3)
    batch = {r["id"]: (r["cell"], r["probed"], r["adc"])
             for r in streaming_ivfadc_probe(
                 emb, centers, books, qv, nprobe=3).collect()}
    assert len(batch) == 500
    stream = _replay(spark, tmp_path, emb, "adc")
    streamed = {r["id"]: (r["cell"], r["probed"], r["adc"])
                for r in _run(spark, tmp_path,
                              streaming_ivfadc_probe(stream, centers,
                                                     books, qv, nprobe=3),
                              "sadc")}
    assert streamed == batch
    # numpy mirror of the full IVFADC math, every row
    C = np.asarray(centers, dtype=np.float64)
    B = np.asarray(books, dtype=np.float64)
    m, _ks, dsub = B.shape
    q = np.asarray(qv, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-300)
    lut = np.stack([B[j] @ q[j * dsub:(j + 1) * dsub] for j in range(m)])
    cell_ip = C @ q
    cell_ip = np.where(np.abs(C).max(axis=1) >= 1e6, -np.inf, cell_ip)
    assert set(probe) == set(np.argsort(-cell_ip)[:3].tolist())
    for r in emb.collect():
        v = np.asarray(r["embedding"], dtype=np.float64)
        v = v / max(np.linalg.norm(v), 1e-300)
        cell = int(((v[None, :] - C) ** 2).sum(axis=1).argmin())
        res = v - C[cell]
        adc = cell_ip[cell]
        for j in range(m):
            rj = res[j * dsub:(j + 1) * dsub]
            cj = int(((rj[None, :] - B[j]) ** 2).sum(axis=1).argmin())
            adc += lut[j][cj]
        got = batch[r["vec_id"]]
        assert got[0] == cell, r["vec_id"]
        assert got[1] == (cell in probe)
        assert got[2] == pytest.approx(round(float(adc), 6), abs=1e-6)
    # the query's own vector lands in a probed cell with a high score
    assert batch[3][1] is True


def test_streaming_semdedup_probe_matches_batch(spark, tmp_path):
    """Streamed SemDeDup verdicts equal the batch evaluation; a PLANTED
    exact duplicate of an existing corpus vector is flagged with
    best_cos ~= 1.0 and best_id = the original; self-matches are
    skipped on a corpus self-replay; and a numpy mirror reproduces
    best_cos for every arrival of one cell."""
    from yupana_spark.datapipe.dedup import ivf_assignment
    from yupana_spark.datapipe.simsearch import kmeans_fit
    from yupana_spark.streaming.simsearch import (prepare_cell_members,
                                                  streaming_semdedup_probe)

    emb = (spark.read.parquet(SF_SMALL + "/embeddings.parquet")
           .select("vec_id", "embedding"))
    centers = kmeans_fit(emb, 8, id_col="vec_id", seed=7, n=500)
    cells = ivf_assignment(emb, id_col="vec_id", n_centroids=8,
                           m_assign=1, n=500)
    members = prepare_cell_members(cells).localCheckpoint(eager=True)
    # arrivals = a slice of the corpus itself (self-skip must hold) plus
    # a planted exact duplicate of vec 7 under a fresh id
    dup = emb.filter("vec_id = 7").select(
        F.lit(100007).cast("long").alias("vec_id"), "embedding")
    arrivals = emb.filter("vec_id < 60").unionByName(dup)
    batch = {r["id"]: r for r in streaming_semdedup_probe(
        arrivals, members, centers, threshold=0.95).collect()}
    stream = _replay(spark, tmp_path, arrivals, "sem")
    streamed = {r["id"]: r for r in _run(
        spark, tmp_path,
        streaming_semdedup_probe(stream, members, centers,
                                 threshold=0.95), "ssem")}
    assert {k: tuple(v) for k, v in streamed.items()} \
        == {k: tuple(v) for k, v in batch.items()}
    # the planted duplicate: flagged, matched to the original
    assert batch[100007]["is_dup"] is True
    assert batch[100007]["best_id"] == 7
    assert batch[100007]["best_cos"] == pytest.approx(1.0, abs=1e-6)
    # self-skip: no corpus row matched itself
    assert all(r["best_id"] != i for i, r in batch.items() if i < 60)
    # numpy mirror of best_cos for every arrival assigned to cell 0
    asg = {r["id"]: r["cell"] for r in cells.collect()}
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    for i, r in batch.items():
        if i >= 60 or r["cell"] != 0:
            continue
        mine = vecs[i] / max(np.linalg.norm(vecs[i]), 1e-300)
        cand = [j for j, c in asg.items() if c == 0 and j != i]
        if not cand:
            assert r["best_cos"] == -1.0
            continue
        best = max(np.round(
            float(np.dot(mine, vecs[j] / max(np.linalg.norm(vecs[j]),
                                             1e-300))), 6) for j in cand)
        assert r["best_cos"] == pytest.approx(best, abs=1e-6), i
