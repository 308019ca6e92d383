"""Recall gates for the pyspark.ml LSH variants: no DuckDB oracle exists
(JVM hash families), so we pin them against the exact-pair operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkgraft.ext import dedup, ml_lsh, simsearch
from sparkgraft.io.readers import read_table


def test_ml_minhash_recall_vs_exact_jaccard(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    got = {
        (r.doc_a, r.doc_b)
        for r in ml_lsh.ml_minhash_pairs(docs, threshold=0.5).collect()
    }
    assert exact, "fixture must contain planted near-dups"
    recall = len(exact & got) / len(exact)
    assert recall >= 0.9, f"recall {recall}: missed {sorted(exact - got)[:5]}"
    # precision guard: hashed-shingle Jaccard can drift a little around the
    # threshold, but candidates must still be near-dups, not noise
    extra = got - exact
    assert len(extra) <= max(2, len(exact)), f"too many spurious pairs: {len(extra)}"


def test_ml_ann_topk_overlaps_brute_force(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    brute = (
        simsearch.brute_force_topk(emb, F.col("vec_id") == 0, k=10)
        .select("cid")
        .collect()
    )
    got = ml_lsh.ml_ann_neighbors(emb, query_vec_id=0, k=10).collect()
    assert len(got) == 10
    overlap = {r.vec_id for r in got} & {r.cid for r in brute}
    # embeddings are unit-norm: euclidean rank == cosine rank; LSH recall
    # at 4 tables should capture most of the true top-10
    assert len(overlap) >= 6, f"only {len(overlap)}/10 overlap with brute force"
