"""pyspark.ml-native LSH variants of the dedup / similarity operators.

The custom implementations (ext/dedup.py minhash, ext/simsearch.py LSH/IVF)
are engine-portable and oracle-checkable; these are the same operators
through Spark ML's built-in estimators (SURVEY §2.12's mapping: shingle →
HashingTF → MinHashLSH → approxSimilarityJoin; embeddings →
BucketedRandomProjectionLSH) — the path a Spark shop would reach for first.
Hash families are JVM-internal, so the raw pair/neighbor relations are
seed-deterministic but not SQL-expressible: the registry therefore exposes
them as RECALL-AUDIT relations (registry_corpus.py — exact side + tolerance
booleans the oracle asserts as constants), and tests/test_ml_lsh.py pins
recall against the exact-pair oracle queries.

Scale: approxSimilarityJoin explodes each row to its OR-bucket keys and
equi-joins on (band, bucket) — the same join-on-buckets shape as the custom
minhash_lsh_pairs, with |candidate pairs| ~ collisions, never N².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from sparkgraft.ext.dedup import doc_shingles


def _shingle_features(
    df: DataFrame,
    col: str,
    id_col: str,
    n: int,
    dim: int,
    shingles: DataFrame | None = None,
):
    """doc → sparse indicator vector of hashed shingles (HashingTF).

    ``shingles``: optional precomputed ``doc_shingles(df, col, id_col, n)``
    relation (callers sharing one tokenize pass with the exact-Jaccard
    side).  HashingTF with ``binary=True`` maps a shingle LIST to the same
    indicator vector as the distinct set, so the features are identical."""
    from pyspark.ml.feature import HashingTF

    sh = (
        (shingles if shingles is not None else doc_shingles(df, col, id_col, n))
        .groupBy("doc")
        .agg(F.collect_list("sh").alias("shingles"))
    )
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=dim, binary=True)
    return tf.transform(sh)


def ml_minhash_pairs(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    num_tables: int = 8,
    dim: int = 1 << 18,
    seed: int = 7,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Near-dup candidate pairs via MinHashLSH.approxSimilarityJoin.

    Output: (doc_a, doc_b, jaccard_dist) with doc_a < doc_b, Jaccard
    distance (1 - J over hashed-shingle SETS) <= 1 - threshold. Equals the
    exact n-gram Jaccard pairs up to (rare) HashingTF collisions and LSH
    recall < 1 — pinned by the recall test, not an oracle.

    ``shingles``: optional precomputed ``doc_shingles`` relation — see
    :func:`_shingle_features`.
    """
    from pyspark.ml.feature import MinHashLSH

    feats = _shingle_features(df, col, id_col, n, dim, shingles=shingles)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_tables, seed=seed)
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, 1.0 - threshold, distCol="jaccard_dist")
    return (
        joined.select(
            F.col("datasetA.doc").alias("doc_a"),
            F.col("datasetB.doc").alias("doc_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
        .where(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )


def ml_ann_neighbors(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    bucket_length: float = 2.0,
    num_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Top-k nearest neighbors (Euclidean) of one stored vector via
    BucketedRandomProjectionLSH.approxNearestNeighbors.

    On unit-norm embeddings, Euclidean order == cosine order
    (||a-b||² = 2 - 2cos), so this ranks like the cosine top-k operators.
    Output: (vec_id, dist_rank, eucl_dist).
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    feats = emb.select(
        F.col(id_col), array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_tables,
        seed=seed,
    )
    model = lsh.fit(feats)
    key = feats.where(F.col(id_col) == query_vec_id).head()
    if key is None:
        raise ValueError(f"no vector with {id_col}={query_vec_id}")
    out = model.approxNearestNeighbors(
        feats.where(F.col(id_col) != query_vec_id), key.features, k, distCol="eucl_dist"
    )
    # global window is fine here: the relation is exactly k rows
    w = F.row_number().over(Window.orderBy(F.col("eucl_dist"), F.col(id_col)))
    return out.select(id_col, F.round("eucl_dist", 8).alias("eucl_dist")).withColumn(
        "dist_rank", w
    )
