"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: broadcast the (small) query set against the
  corpus — one scan, partial top-k per partition via window row_number.
  Dot products run in JVM higher-order lambdas (zip_with + aggregate) in
  double precision; no Python in the loop.
- LSH-bucketed ANN: sign-random-projection buckets (hyperplanes derived
  deterministically from md5 so they're reproducible); candidate search
  only within the query's bucket. This is the 100-TB path: bucket key is
  the shuffle key, brute force only inside buckets. Recall vs brute force
  is asserted in tests (no SQL oracle — bucketing is not SQL-portable).
- embedding stats / normalization: per-label aggregates and vector
  arithmetic with zip_with/transform.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openlogreplicator_spark.sources.tables import load_table

_TOP_K = 5
_QUERY_MOD = 50  # vec_id % 50 == 0 → the query set


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    emb: DataFrame, queries: DataFrame, k: int = _TOP_K
) -> DataFrame:
    """Brute-force cosine top-k: queries broadcast, corpus scanned once.
    At 100 TB the corpus side stays partition-parallel; the per-query
    top-k is a window over (query, cos) after a partial sort."""
    # precompute norms once per side — the pair loop only does the dot
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        _norm(F.col("embedding")).alias("q_norm"),
    )
    corpus = emb.select("vec_id", "embedding", _norm(F.col("embedding")).alias("e_norm"))
    pairs = corpus.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            _dot(F.col("q_emb"), F.col("embedding"))
            / (F.col("q_norm") * F.col("e_norm"))
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos_r"))
    )


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % _QUERY_MOD == 0)
    return cosine_topk(emb, queries)


ANN_COSINE_SQL = f"""
WITH dots AS (
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           (SELECT SUM(CAST(q.embedding[g.i] AS DOUBLE)
                       * CAST(e.embedding[g.i] AS DOUBLE))
            FROM generate_series(1, 64) AS g(i)) AS dot,
           (SELECT SUM(CAST(q.embedding[g.i] AS DOUBLE)
                       * CAST(q.embedding[g.i] AS DOUBLE))
            FROM generate_series(1, 64) AS g(i)) AS qq,
           (SELECT SUM(CAST(e.embedding[g.i] AS DOUBLE)
                       * CAST(e.embedding[g.i] AS DOUBLE))
            FROM generate_series(1, 64) AS g(i)) AS ee
    FROM embeddings q
    JOIN embeddings e ON e.vec_id <> q.vec_id
    WHERE q.vec_id % {_QUERY_MOD} = 0
),
ranked AS (
    SELECT query_id, neighbor_id,
           dot / (SQRT(qq) * SQRT(ee)) AS cos,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY dot / (SQRT(qq) * SQRT(ee)) DESC,
                                       neighbor_id) AS rank
    FROM dots
)
SELECT query_id, neighbor_id, rank, ROUND(cos, 6) AS cos_r
FROM ranked WHERE rank <= {_TOP_K}
"""


_N_TABLES = 8   # independent LSH tables (recall ∝ 1-(1-p^planes)^tables)
_N_PLANES = 4   # sign bits per table
_DIM = 64


def _lsh_sign_matrix(n_tables: int = _N_TABLES, n_planes: int = _N_PLANES):
    """Deterministic ±1 hyperplane matrix (tables*planes × dim) seeded
    from md5 — reproducible without a stored model."""
    import hashlib

    import numpy as np

    rows = n_tables * n_planes
    m = np.empty((rows, _DIM), dtype=np.float64)
    for r in range(rows):
        h = hashlib.md5(f"olr-lsh:{r}".encode()).digest()
        rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
        m[r] = rng.choice([-1.0, 1.0], size=_DIM)
    return m


def lsh_bucket(
    emb: DataFrame, n_tables: int = _N_TABLES, n_planes: int = _N_PLANES
) -> DataFrame:
    """(…, table, bucket) — one row per LSH table. Buckets are computed in
    a vectorized pandas UDF: one Arrow batch → one (n×dim)·(dim×planes)
    matmul for the whole batch; signs pack into per-table bucket ints.
    At 100 TB this is a single map stage; the (table, bucket) pair then
    becomes the shuffle key for candidate generation. ``n_planes`` sets
    the bucket count (2^planes per table) and must grow with log(N) so
    bucket occupancy — and the per-bucket pair count — stays bounded."""
    from pyspark.sql.pandas.functions import pandas_udf

    # built ONCE on the driver and closure-captured: rebuilding the
    # md5-seeded matrix inside the UDF paid tables×planes digests + RNG
    # setup per Arrow batch on the single-map-pass hot path
    # (r12 review-pass-7)
    m = _lsh_sign_matrix(n_tables, n_planes)

    @pandas_udf("array<int>")
    def buckets(col: "pd.Series") -> "pd.Series":
        import numpy as np

        vecs = np.asarray([np.asarray(v, dtype=np.float64) for v in col])
        proj = vecs @ m.T > 0  # (n, tables*planes) sign bits
        out = []
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        for t in range(n_tables):
            bits = proj[:, t * n_planes:(t + 1) * n_planes]
            out.append(bits @ weights)
        packed = np.stack(out, axis=1)
        return pd.Series(list(packed.astype("int32")))

    return emb.withColumn("bkts", buckets("embedding")).select(
        "*", F.posexplode("bkts").alias("table", "bucket")
    ).drop("bkts")


def ann_lsh_topk(
    emb: DataFrame, queries: DataFrame, k: int = _TOP_K
) -> DataFrame:
    """ANN via multi-table LSH: exact search restricted to bucket-mates in
    any of the 8 tables. The (table, bucket) equi-join replaces the cross
    join — the scale path."""
    # norms computed ONCE per vector before bucketing — scoring each
    # candidate pair re-ran the 64-step norm aggregate twice per pair
    # (r12 review-pass-7; cosine_topk/ann_ivf_topk already project
    # norms pre-pairing)
    be = lsh_bucket(emb.withColumn("e_norm", _norm(F.col("embedding"))))
    bq = lsh_bucket(
        queries.withColumn("q_norm", _norm(F.col("embedding")))
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "q_norm",
        "table",
        "bucket",
    )
    pairs = (
        be.join(bq, ["table", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "q_emb", "q_norm", "vec_id", "embedding",
                "e_norm")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            _dot(F.col("q_emb"), F.col("embedding"))
            / (F.col("q_norm") * F.col("e_norm"))
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos_r"))
    )


def _recall_contract(
    spark: SparkSession, sf_dir: str, approx_fn, bound: float
) -> DataFrame:
    """Driver-checkable ACCURACY CONTRACT for an ANN variant (the
    agg_approx_distinct pattern): run the approximate top-k AND the
    exact brute-force top-k in one plan, compute mean recall across the
    query set, and emit (n_queries, recall_ok) where the oracle returns
    the exact query count and literal TRUE. Sketch/bucket contents
    differ across engines, so the recall bound — not the neighbor ids —
    is the portable surface; each bound sits at ~0.8× the measured
    sf0.01 mean (lsh .74 / ivf .58 / pq .80 → bounds .59/.46/.64,
    tightened r7 per the r6 verdict) — wide enough that float
    reorderings and per-round testdata regeneration can't flip the
    verdict, tight enough that a candidate generator losing even a
    quarter of its recall goes red (a broken one, recall → ~k/N,
    always does)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % _QUERY_MOD == 0)
    approx = approx_fn(emb, queries).select(
        "query_id", "neighbor_id"
    )
    exact = cosine_topk(emb, queries).select("query_id", "neighbor_id")
    per_q = (
        exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    # queries whose approx set missed everything still count (recall 0).
    # The spine is the QUERY SET itself, not exact.query_id.distinct():
    # every query emits exact rows whenever the corpus is non-trivial, so
    # the two spines are identical (it is literally the oracle's
    # n_queries definition) — but deriving it from `exact` re-executed
    # the whole brute-force crossJoin+top-k subtree a second time (Spark
    # shares no subtrees below a plan fork; a persist() of exact was
    # A/B-measured SLOWER at sf0.1 — cache-build barrier vs cheap
    # parallel recompute — so the fix is to not need the reuse at all).
    all_q = queries.select(F.col("vec_id").alias("query_id")).join(
        per_q, "query_id", "left"
    ).select(
        "query_id",
        (F.coalesce(F.col("hits"), F.lit(0)) / F.lit(_TOP_K)).alias("recall"),
    )
    return all_q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        (F.avg("recall") >= F.lit(bound)).alias("recall_ok"),
    )


_RECALL_CONTRACT_SQL = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, TRUE AS recall_ok
FROM embeddings WHERE vec_id % {_QUERY_MOD} = 0
"""


def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN under the recall contract: sign-LSH band buckets
    generate candidates (an equi-join, never all-pairs), exact cosine
    ranks them, and the emitted row asserts mean recall ≥ 0.59 vs the
    in-plan brute force (measured ~0.74 at sf0.01)."""
    return _recall_contract(spark, sf_dir, ann_lsh_topk, 0.59)


# IVF sizing: nlist ≈ sqrt(N) at scale (16 at test scale); nprobe trades
# recall for the fraction of inverted lists scanned (4/16 = 25% of the
# corpus touched per query instead of 100%).
_IVF_K = 16
_IVF_NPROBE = 4
_IVF_ITERS = 2


def _ivf_assign_udf(cent, nprobe: int = 1):
    """Vectorized centroid assignment: one (batch×dim)·(dim×k) matmul per
    Arrow batch. With nprobe>1 returns the nprobe nearest centroid ids
    (the query-side probe list)."""
    import numpy as np
    from pyspark.sql.pandas.functions import pandas_udf

    c = np.asarray(cent, dtype=np.float64)
    c_sq = (c ** 2).sum(axis=1)

    @pandas_udf("array<int>")
    def assign(col: "pd.Series") -> "pd.Series":
        vecs = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in col]
        )
        # argmin ||v-c||² = argmin (||c||² - 2 v·c); ||v||² is constant
        d = c_sq - 2.0 * (vecs @ c.T)
        idx = np.argsort(d, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(idx.astype("int32")))

    return assign


def ivf_fit(emb: DataFrame, k: int = _IVF_K, iters: int = _IVF_ITERS):
    """Fit IVF centroids with Lloyd iterations, Spark-distributed:
    assignment is a vectorized matmul map stage; the centroid update is a
    (cid, dim-position) groupBy average. Only MODEL state (k×dim floats —
    kilobytes) ever reaches the driver; corpus-scale frames never do.
    Seeding is deterministic (first k vec_ids) so the index is
    reproducible without a model store."""
    import numpy as np

    seed = emb.orderBy("vec_id").limit(k).collect()
    cent = np.asarray(
        [np.asarray(r.embedding, dtype=np.float64) for r in seed]
    )
    for _ in range(iters):
        assigned = emb.withColumn(
            "cid", F.element_at(_ivf_assign_udf(cent)("embedding"), 1)
        )
        sums = (
            assigned.select("cid", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(
                F.sum(F.col("v").cast("double")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()  # k×dim rows — model-scale, not data-scale
        )
        new = cent.copy()
        counts = np.zeros(k)
        for r in sums:
            new[r.cid, r.pos] = r.s / r.n
            counts[r.cid] = r.n
        # empty cells keep their previous centroid
        cent = np.where(counts[:, None] > 0, new, cent)
    return cent


def ann_ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = _TOP_K,
    nlist: int = _IVF_K,
    nprobe: int = _IVF_NPROBE,
) -> DataFrame:
    """IVF ANN: corpus vectors live in nlist inverted lists (their nearest
    centroid); a query probes its nprobe nearest lists and exact-ranks
    only those candidates. The cid equi-join replaces the cross join —
    per-query work drops to nprobe/nlist of the corpus. At 100 TB: the
    inverted lists are the shuffle key (co-partitionable, skew bounded by
    balanced centroids), assignment is one map stage, and the centroid
    model is broadcast-by-closure (kilobytes)."""
    cent = ivf_fit(emb, nlist)
    corpus = emb.withColumn(
        "cid", F.element_at(_ivf_assign_udf(cent)("embedding"), 1)
    ).select("cid", "vec_id", "embedding", _norm("embedding").alias("e_norm"))
    probes = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        _norm("embedding").alias("q_norm"),
        F.explode(_ivf_assign_udf(cent, nprobe)("embedding")).alias("cid"),
    )
    pairs = corpus.join(probes, "cid").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            _dot(F.col("q_emb"), F.col("embedding"))
            / (F.col("q_norm") * F.col("e_norm"))
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos_r")
        )
    )


def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN under the recall contract: distributed-Lloyd inverted
    lists, nprobe/nlist of the corpus touched per query, mean recall
    asserted ≥ 0.46 vs the in-plan brute force (measured ~0.58 at
    sf0.01)."""
    return _recall_contract(spark, sf_dir, ann_ivf_topk, 0.46)


def embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label aggregates over the vector column — norm statistics."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", _norm(F.col("embedding")).alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("nrm"), 6).alias("avg_norm"),
            F.round(F.min("nrm"), 6).alias("min_norm"),
            F.round(F.max("nrm"), 6).alias("max_norm"),
        )
    )


EMBEDDING_STATS_SQL = """
WITH norms AS (
    SELECT label,
           SQRT((SELECT SUM(CAST(embedding[g.i] AS DOUBLE)
                            * CAST(embedding[g.i] AS DOUBLE))
                 FROM generate_series(1, 64) AS g(i))) AS nrm
    FROM embeddings
)
SELECT label, COUNT(*) AS n_vecs,
       ROUND(AVG(nrm), 6) AS avg_norm,
       ROUND(MIN(nrm), 6) AS min_norm,
       ROUND(MAX(nrm), 6) AS max_norm
FROM norms GROUP BY label
"""


def embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector arithmetic via transform/zip_with: L2-normalize, emit the
    first three components (flat columns keep the oracle portable)."""
    emb = load_table(spark, sf_dir, "embeddings")
    nrm = _norm(F.col("embedding"))
    unit = F.transform(F.col("embedding"), lambda x: x.cast("double") / nrm)
    return emb.select(
        "vec_id",
        F.round(F.element_at(unit, 1), 6).alias("u1"),
        F.round(F.element_at(unit, 2), 6).alias("u2"),
        F.round(F.element_at(unit, 3), 6).alias("u3"),
    )


EMBEDDING_NORMALIZE_SQL = """
WITH norms AS (
    SELECT vec_id, embedding,
           SQRT((SELECT SUM(CAST(embedding[g.i] AS DOUBLE)
                            * CAST(embedding[g.i] AS DOUBLE))
                 FROM generate_series(1, 64) AS g(i))) AS nrm
    FROM embeddings
)
SELECT vec_id,
       ROUND(CAST(embedding[1] AS DOUBLE) / nrm, 6) AS u1,
       ROUND(CAST(embedding[2] AS DOUBLE) / nrm, 6) AS u2,
       ROUND(CAST(embedding[3] AS DOUBLE) / nrm, 6) AS u3
FROM norms
"""


# Dedup LSH sizing: 2^16 buckets per table keeps expected bucket
# occupancy (and thus per-bucket pair counts) tiny even at 100-TB vector
# counts; 8 independent tables give ~99.5% recall at cos 0.99 and 100%
# recall on exact/scaled duplicates (sign projections are scale-
# invariant, so v and 2v always share every bucket).
_DEDUP_TABLES = 8
_DEDUP_PLANES = 16


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection: the corpus is doubled with
    scaled copies (cos(v, 2v) = 1), then pairs with cosine ≥ 0.99 are
    flagged.

    Candidate generation is the LSH bucket join — NO driver-side collect
    and NO all-pairs cross join anywhere (the round-1 version collected
    the corpus with toPandas and broadcast a full matrix; fine at test
    scale, dead at 100 TB). Shape: one map stage to bucket, one shuffle
    on (table, bucket) for the self-join, exact JVM-side cosine only on
    bucket-mates, dedup across tables. Every stage is partition-parallel
    and bounded by bucket occupancy, which _DEDUP_PLANES keeps O(1)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copies = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"),
    )
    corpus = emb.unionByName(copies)

    # norm projected ONCE per corpus row before bucketing (see
    # ann_lsh_topk — r12 review-pass-7): the per-pair 64-step norm
    # aggregate otherwise ran twice for every bucket-mate candidate
    bucketed = lsh_bucket(
        corpus.withColumn("nrm", _norm(F.col("embedding"))),
        _DEDUP_TABLES, _DEDUP_PLANES,
    # persisted: BOTH self-join sides consume this frame, and without the
    # cache the whole scan + norm + bucket-UDF matmul map pass runs twice
    # (interleaved A/B at sf0.1: 1.83 -> 1.60 s median). MEMORY_AND_DISK
    # default keeps a hot-corpus spill safe at scale. Lifetime contract
    # (r12 ADVICE): the frame outlives this builder, so long-lived
    # sessions running many queries must clearCache() between them —
    # bench.py does (bench.py:257), as does the oracle sweep.
    ).persist()
    a = bucketed.select(
        "table", "bucket",
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = bucketed.select(
        "table", "bucket",
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    candidates = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = (
        _dot(F.col("emb_a"), F.col("emb_b"))
        / (F.col("nrm_a") * F.col("nrm_b"))
    )
    return (
        candidates.withColumn("cos", cos)
        .filter(F.col("cos") >= 0.99)
        .select("id_a", "id_b", F.round("cos", 4).alias("cos_r"))
    )


DEDUP_EMBEDDING_SQL = """
WITH corpus AS (
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT vec_id + 1000000,
           list_transform(embedding, x -> x * CAST(2.0 AS FLOAT))
    FROM embeddings
),
norms AS (
    SELECT vec_id, embedding,
           SQRT((SELECT SUM(CAST(embedding[g.i] AS DOUBLE)
                            * CAST(embedding[g.i] AS DOUBLE))
                 FROM generate_series(1, 64) AS g(i))) AS nrm
    FROM corpus
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND((SELECT SUM(CAST(a.embedding[g.i] AS DOUBLE)
                          * CAST(b.embedding[g.i] AS DOUBLE))
              FROM generate_series(1, 64) AS g(i)) / (a.nrm * b.nrm), 4)
           AS cos_r
FROM norms a JOIN norms b ON a.vec_id < b.vec_id
WHERE (SELECT SUM(CAST(a.embedding[g.i] AS DOUBLE)
                   * CAST(b.embedding[g.i] AS DOUBLE))
       FROM generate_series(1, 64) AS g(i)) / (a.nrm * b.nrm) >= 0.99
"""


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization (the storage/serving compression step of
    an embedding pipeline): per-vector absmax scale, symmetric round to
    [-127, 127]. Map-only JVM lambdas — no shuffle, no Python. Emits the
    scale, the first three quantized components, and the whole-vector
    quantized sum so the oracle checks every component without array
    compares."""
    emb = load_table(spark, sf_dir, "embeddings")
    absmax = F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    )
    q = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 127.0 / absmax).cast("int"),
    )
    return emb.select(
        "vec_id",
        F.round(absmax / 127.0, 6).alias("scale"),
        F.element_at(q, 1).alias("q1"),
        F.element_at(q, 2).alias("q2"),
        F.element_at(q, 3).alias("q3"),
        F.aggregate(
            q, F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("q_sum"),
    )


EMBEDDING_QUANTIZE_SQL = """
WITH m AS (
    SELECT vec_id, embedding,
           (SELECT MAX(ABS(CAST(embedding[g.i] AS DOUBLE)))
            FROM generate_series(1, 64) AS g(i)) AS absmax
    FROM embeddings
)
SELECT vec_id,
       ROUND(absmax / 127.0, 6) AS scale,
       CAST(ROUND(CAST(embedding[1] AS DOUBLE) * 127.0 / absmax) AS INT) AS q1,
       CAST(ROUND(CAST(embedding[2] AS DOUBLE) * 127.0 / absmax) AS INT) AS q2,
       CAST(ROUND(CAST(embedding[3] AS DOUBLE) * 127.0 / absmax) AS INT) AS q3,
       CAST((SELECT SUM(ROUND(CAST(embedding[g.i] AS DOUBLE) * 127.0 / absmax))
             FROM generate_series(1, 64) AS g(i)) AS BIGINT) AS q_sum
FROM m
"""


# product quantization (Jégou et al., "Product Quantization for Nearest
# Neighbor Search", TPAMI 2011): m subspaces × ksub codewords; a vector
# compresses to m small codes (here 8 bytes vs 64 floats — 32× smaller),
# and query-to-corpus distances evaluate by table lookup in the
# compressed domain (ADC). This is the memory-bounded ANN path: at
# 100 TB the corpus lives as codes, the codebook is kilobytes.
_PQ_M = 8
_PQ_KSUB = 32
_PQ_TRAIN = 512
_PQ_ITERS = 8
_PQ_REFINE = 8  # ADC shortlist size = k * refine, re-ranked exactly


def pq_fit(emb: DataFrame, m: int = _PQ_M, ksub: int = _PQ_KSUB):
    """Codebooks from a deterministic bounded sample (first _PQ_TRAIN
    vec_ids) — the standard PQ practice: training is sample-based and
    model-scale; only the full-corpus ENCODE is distributed. Vectors are
    L2-normalized first so squared-L2 ranking matches cosine ranking."""
    import numpy as np

    sample = emb.orderBy("vec_id").limit(_PQ_TRAIN).collect()
    X = np.asarray([np.asarray(r.embedding, dtype=np.float64) for r in sample])
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    d = X.shape[1] // m
    books = []
    for sub_i in range(m):
        sub = X[:, sub_i * d:(sub_i + 1) * d]
        cent = sub[:ksub].copy()
        for _ in range(_PQ_ITERS):
            dist = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            a = dist.argmin(1)
            for c in range(ksub):
                pts = sub[a == c]
                if len(pts):
                    cent[c] = pts.mean(0)
        books.append(cent)
    return np.asarray(books)  # m × ksub × d


def _pq_encode_udf(books):
    """Distributed encode: per Arrow batch, one argmin per subspace —
    the full corpus never reaches the driver."""
    import numpy as np
    from pyspark.sql.pandas.functions import pandas_udf

    m, ksub, d = books.shape

    @pandas_udf("array<int>")
    def enc(col: "pd.Series") -> "pd.Series":
        V = np.asarray([np.asarray(v, dtype=np.float64) for v in col])
        V = V / np.linalg.norm(V, axis=1, keepdims=True)
        codes = np.empty((len(V), m), dtype="int32")
        for s in range(m):
            sub = V[:, s * d:(s + 1) * d]
            dist = (books[s] ** 2).sum(1) - 2.0 * (sub @ books[s].T)
            codes[:, s] = dist.argmin(1)
        return pd.Series(list(codes))

    return enc


def _pq_adc_scored(
    emb: DataFrame, queries: DataFrame, books, k: int
) -> DataFrame:
    """MAP-SIDE ADC scan → per-PARTITION shortlists of k×_PQ_REFINE
    candidates per query (pre-global-top-k; :func:`_pq_adc_shortlist`
    adds the window).

    The scale-critical shape (the r6 plan shuffled |corpus|×|queries|
    pairs into one partition per query_id — a guaranteed hot-partition
    OOM at 100×): the per-query m×ksub distance tables (kilobytes each)
    are built once from the query vectors and BROADCAST; a single
    ``mapInArrow`` pass over the encoded-corpus partitions scores every
    (row, query) pair by table lookup and keeps a per-partition
    top-(k·refine) heap per query; only those per-partition shortlists
    (≤ cores × |Q| × k·refine rows after the coalesce below —
    shortlist-scale, never corpus-scale) are shuffled for the global
    top-k. Same partial-TopK discipline as :func:`cosine_topk`. The
    query-set collect is the same model-scale materialization the old
    plan's ``broadcast(queries)`` implied."""
    import numpy as np

    m, ksub, d = books.shape
    keep = k * _PQ_REFINE
    qrows = queries.select("vec_id", "embedding").collect()
    qids = np.asarray([r.vec_id for r in qrows], dtype=np.int64)
    tabs = np.empty((len(qrows), m, ksub), dtype=np.float64)
    for i, r in enumerate(qrows):
        qv = np.asarray(r.embedding, dtype=np.float64)
        qv = qv / np.linalg.norm(qv)
        for s in range(m):
            diff = books[s] - qv[s * d:(s + 1) * d]
            tabs[i, s] = (diff ** 2).sum(1)
    bc = emb.sparkSession.sparkContext.broadcast((qids, tabs))
    corpus = emb.select(
        "vec_id", _pq_encode_udf(books)("embedding").alias("codes")
    )
    # the shortlist shuffle is partitions × |Q| × k·refine rows — the
    # r10 sf1.0 probe measured it growing MULTIPLICATIVELY with input
    # splits (86× bytes at 10× data as splits grew with copies).
    # Bounding the scan to O(cores) partitions caps the term at
    # cores × |Q| × k·refine regardless of how many thousands of files
    # the corpus arrives in; coalesce merges upstream splits without a
    # shuffle and never reduces below the available parallelism
    corpus = corpus.coalesce(
        max(1, emb.sparkSession.sparkContext.defaultParallelism)
    )

    def adc_scan(batches):
        import numpy as np
        import pyarrow as pa

        q_ids, q_tabs = bc.value
        n_q = len(q_ids)
        sub_ix = np.arange(m)
        # running per-query shortlist across this partition's batches
        run_ids = [np.empty(0, dtype=np.int64) for _ in range(n_q)]
        run_d = [np.empty(0, dtype=np.float64) for _ in range(n_q)]
        for batch in batches:
            vid = np.asarray(batch.column("vec_id"), dtype=np.int64)
            if not len(vid):
                continue
            codes = np.asarray(
                batch.column("codes").flatten(), dtype=np.int64
            ).reshape(len(vid), m)
            # (n_q, n): ADC lookup-sum for every (query, row) pair
            adist = q_tabs[:, sub_ix[None, :], codes].sum(axis=2)
            adist[q_ids[:, None] == vid[None, :]] = np.inf  # self
            for qi in range(n_q):
                ids = np.concatenate([run_ids[qi], vid])
                ds = np.concatenate([run_d[qi], adist[qi]])
                if len(ids) > keep:
                    # deterministic boundary: (adist, neighbor_id) order
                    order = np.lexsort((ids, ds))[:keep]
                    ids, ds = ids[order], ds[order]
                run_ids[qi], run_d[qi] = ids, ds
        out_q, out_n, out_d = [], [], []
        for qi in range(n_q):
            fin = np.isfinite(run_d[qi])
            out_q.append(np.full(int(fin.sum()), q_ids[qi], dtype=np.int64))
            out_n.append(run_ids[qi][fin])
            out_d.append(run_d[qi][fin])
        if out_q:
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(out_q), type=pa.int64()),
                    pa.array(np.concatenate(out_n), type=pa.int64()),
                    pa.array(np.concatenate(out_d), type=pa.float64()),
                ],
                names=["query_id", "neighbor_id", "adist"],
            )

    return corpus.mapInArrow(
        adc_scan, "query_id bigint, neighbor_id bigint, adist double"
    )


def _pq_adc_shortlist(
    emb: DataFrame, queries: DataFrame, books, k: int
) -> DataFrame:
    """Global top-(k·refine) over the per-partition ADC shortlists —
    the only shuffle of the scan, bounded at cores × |Q| × k·refine
    input rows by :func:`_pq_adc_scored`'s coalesce."""
    keep = k * _PQ_REFINE
    scored = _pq_adc_scored(emb, queries, books, k)
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("arank", F.row_number().over(w_adc))
        .filter(F.col("arank") <= keep)
        .drop("arank")
    )


def ann_pq_topk(
    emb: DataFrame, queries: DataFrame, k: int = _TOP_K
) -> DataFrame:
    """PQ/ADC top-k with exact re-rank: corpus encoded to m codes; per
    query, an m×ksub distance table is built once and every corpus
    distance is a lookup sum over codes (the compressed-domain scan that
    makes PQ the memory-bounded path at 100 TB). The ADC scan keeps only
    a k×_PQ_REFINE shortlist per query, which is then re-ranked by exact
    cosine against the raw vectors — the standard IVFADC+R refinement
    (Jégou et al. §V): quantization distortion decides *candidates*, not
    final ranks, so recall recovers while the exact math touches only
    O(queries × k × refine) rows instead of the corpus. The ADC scan is
    map-side (:func:`_pq_adc_shortlist`): broadcast distance tables,
    per-partition partial top-k, shortlist-scale shuffle only."""
    books = pq_fit(emb)
    shortlist = _pq_adc_shortlist(emb, queries, books, k)
    # exact re-rank: the shortlist is tiny (queries × k × refine), so it
    # broadcasts against the raw-vector table — no corpus-sized shuffle
    nb = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("n_emb"),
        _norm(F.col("embedding")).alias("n_norm"),
    )
    qn = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        _norm(F.col("embedding")).alias("q_norm"),
    )
    exact = (
        nb.join(F.broadcast(shortlist), "neighbor_id")
        .join(F.broadcast(qn), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "adist",
            (
                _dot(F.col("q_vec"), F.col("n_emb"))
                / (F.col("q_norm") * F.col("n_norm"))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("adist", 6).alias("adist_r"),
        )
    )


def ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC ANN under the recall contract: compressed-domain lookup
    scan (map-side, broadcast distance tables) + exact re-rank of the
    k×refine shortlist, mean recall asserted ≥ 0.64 vs the in-plan
    brute force (measured ~0.80 at sf0.01)."""
    return _recall_contract(spark, sf_dir, ann_pq_topk, 0.64)


_SEM_K = 8      # anchor count; grow ~N/target_cluster_size at scale
_SEM_CAP = 256  # per-cluster comparison-side cap (hot-cluster guard);
                # exact while occupancy ≤ cap — true at every tested SF
_SEM_TAU = 0.35  # intra-cluster duplicate threshold — the synthetic
                 # embeddings are near-orthogonal (max pairwise cos
                 # ~0.51, p99.9 ~0.38), so a production-style 0.9+
                 # threshold would never fire; 0.35 exercises the
                 # duplicate path on this corpus


def semantic_dedup(
    emb: DataFrame,
    k: int = _SEM_K,
    tau: float = _SEM_TAU,
    cap: int | None = None,
) -> DataFrame:
    """SemDeDup core (Abbas et al., 2023) over a (vec_id, embedding)
    frame — see :func:`dedup_semantic` for the algorithm. ``cap``
    bounds the HOT-CLUSTER pair blow-up: the comparison side of the
    pair scan keeps only each cluster's ``cap`` lowest-id members, so
    a cluster of occupancy m generates at most m·cap candidate pairs
    instead of m²/2 (the DF-cap discipline of dedup_ngram_jaccard).
    Duplicates are then 'close to one of the cluster's first ``cap``
    members' — exact whenever occupancy ≤ cap, a documented
    head-anchored approximation beyond it."""
    anchors = (
        emb.orderBy("vec_id")
        .limit(k)
        .select(
            F.col("vec_id").alias("anchor_id"),
            F.col("embedding").alias("a_emb"),
            _norm(F.col("embedding")).alias("a_norm"),
        )
    )
    e = emb.select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("e_norm")
    )
    sims = e.crossJoin(F.broadcast(anchors)).select(
        "vec_id",
        "anchor_id",
        (
            _dot(F.col("embedding"), F.col("a_emb"))
            / (F.col("e_norm") * F.col("a_norm"))
        ).alias("cos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), "anchor_id")
    assigned = (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("anchor_id").alias("cluster"))
    )
    # the persist moved from `assigned` to `sided` (r12): all three
    # consumers (both pair-scan sides + the output projection) need the
    # JOINED frame, so caching only the assignment still re-ran the
    # assignment⋈embedding join (an SMJ) once per side. One cached
    # corpus-scale frame, three cache readers, zero repeated joins.
    # Lifetime contract (r12 ADVICE): callers running many queries on
    # one session must clearCache() between them (bench.py:257 does).
    sided = assigned.join(e, "vec_id").persist()
    a = sided.select(
        F.col("vec_id").alias("a_id"),
        "cluster",
        F.col("embedding").alias("a_e"),
        F.col("e_norm").alias("a_n"),
    )
    b_src = sided
    if cap is not None:
        wc = Window.partitionBy("cluster").orderBy("vec_id")
        b_src = (
            sided.withColumn("_rk", F.row_number().over(wc))
            .filter(F.col("_rk") <= cap)
            .drop("_rk")
        )
    b = b_src.select(
        F.col("vec_id").alias("b_id"),
        "cluster",
        F.col("embedding").alias("b_e"),
        F.col("e_norm").alias("b_n"),
    )
    dups = (
        a.join(b, "cluster")
        .filter(F.col("b_id") < F.col("a_id"))
        .filter(
            _dot(F.col("a_e"), F.col("b_e")) / (F.col("a_n") * F.col("b_n"))
            > tau
        )
        .select(F.col("a_id").alias("vec_id"))
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    return sided.select("vec_id", "cluster").join(
        dups, "vec_id", "left"
    ).select(
        "vec_id",
        F.col("cluster").cast("bigint").alias("cluster"),
        F.coalesce(~F.col("is_dup"), F.lit(True)).alias("keep"),
    )


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al., 2023): cluster-scoped semantic dedup —
    assign every embedding to its nearest anchor, then inside each
    cluster mark any vector whose cosine to a LOWER-id cluster-mate
    exceeds tau as a duplicate (one survivor per semantic group).

    Anchors here are the K lowest vec_ids (deterministic, so the oracle
    can reproduce them); production SemDeDup uses k-means centroids,
    which only changes how the anchor frame is built. 100-TB shape: the
    anchor table is K×dim (broadcast), assignment is map-only, and the
    pair scan is an equi-join on cluster id with the comparison side
    capped at _SEM_CAP members per cluster — worst-case pairs are
    occupancy·cap, never occupancy². The SQL oracle applies the
    identical cap, so the check stays exact at any skew; K must grow
    with N to keep cluster occupancy under the cap, the same K-vs-N
    discipline as lsh_bucket's plane count."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return semantic_dedup(emb, _SEM_K, _SEM_TAU, _SEM_CAP)


DEDUP_SEMANTIC_SQL = f"""
WITH anchors AS (
    SELECT vec_id AS anchor_id, embedding AS a_emb
    FROM embeddings ORDER BY vec_id LIMIT {_SEM_K}
), sims AS (
    SELECT e.vec_id, a.anchor_id,
           (SELECT SUM(CAST(e.embedding[g.i] AS DOUBLE)
                       * CAST(a.a_emb[g.i] AS DOUBLE))
            FROM generate_series(1, 64) AS g(i))
           / (SQRT((SELECT SUM(CAST(e.embedding[g.i] AS DOUBLE)
                               * CAST(e.embedding[g.i] AS DOUBLE))
                    FROM generate_series(1, 64) AS g(i)))
              * SQRT((SELECT SUM(CAST(a.a_emb[g.i] AS DOUBLE)
                                 * CAST(a.a_emb[g.i] AS DOUBLE))
                      FROM generate_series(1, 64) AS g(i)))) AS cos
    FROM embeddings e CROSS JOIN anchors a
), assigned AS (
    SELECT vec_id, anchor_id AS cluster FROM (
        SELECT vec_id, anchor_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, anchor_id) AS rn
        FROM sims
    ) WHERE rn = 1
), ranked AS (
    SELECT vec_id, cluster,
           ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY vec_id) AS rk
    FROM assigned
), dups AS (
    SELECT DISTINCT x.vec_id AS vec_id
    FROM assigned x
    JOIN ranked y ON x.cluster = y.cluster AND y.vec_id < x.vec_id
                 AND y.rk <= {_SEM_CAP}
    JOIN embeddings ea ON ea.vec_id = x.vec_id
    JOIN embeddings eb ON eb.vec_id = y.vec_id
    WHERE (SELECT SUM(CAST(ea.embedding[g.i] AS DOUBLE)
                      * CAST(eb.embedding[g.i] AS DOUBLE))
           FROM generate_series(1, 64) AS g(i))
          / (SQRT((SELECT SUM(CAST(ea.embedding[g.i] AS DOUBLE)
                              * CAST(ea.embedding[g.i] AS DOUBLE))
                   FROM generate_series(1, 64) AS g(i)))
             * SQRT((SELECT SUM(CAST(eb.embedding[g.i] AS DOUBLE)
                                * CAST(eb.embedding[g.i] AS DOUBLE))
                     FROM generate_series(1, 64) AS g(i))))
          > {_SEM_TAU}
)
SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster,
       d.vec_id IS NULL AS keep
FROM assigned a LEFT JOIN dups d ON a.vec_id = d.vec_id
"""


QUERIES = {
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "dedup_semantic": dedup_semantic,
    "embedding_quantize": embedding_quantize,
    "ann_cosine_topk": ann_cosine_topk,
    "ann_lsh_bucketed": ann_lsh_bucketed,
    "ann_ivf": ann_ivf,
    "ann_pq": ann_pq,
    "embedding_stats": embedding_stats,
    "embedding_normalize": embedding_normalize,
}

ORACLE = {
    "dedup_embedding_cosine": DEDUP_EMBEDDING_SQL,
    "dedup_semantic": DEDUP_SEMANTIC_SQL,
    "ann_cosine_topk": ANN_COSINE_SQL,
    # the ANN variants emit the recall CONTRACT (n_queries, recall_ok);
    # the oracle supplies the exact query count + literal TRUE
    "ann_lsh_bucketed": _RECALL_CONTRACT_SQL,
    "ann_ivf": _RECALL_CONTRACT_SQL,
    "ann_pq": _RECALL_CONTRACT_SQL,
    "embedding_stats": EMBEDDING_STATS_SQL,
    "embedding_normalize": EMBEDDING_NORMALIZE_SQL,
    "embedding_quantize": EMBEDDING_QUANTIZE_SQL,
}
