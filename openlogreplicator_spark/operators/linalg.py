"""Distributed linear algebra over embedding columns: PCA / whitening.

Training-data pipelines whiten or PCA-reduce embeddings before
similarity search and semantic dedup (SemDeDup projects to the top
components; IVF/PQ recall improves on decorrelated vectors). The
distributed shape is the classic two-phase PCA:

1. one `mapInPandas` pass computes per-partition moment partials
   (count, sum vector, Gram matrix) — dim² floats per PARTITION, not
   per row, so the driver reduce is model-scale (64×64 here; even
   4096-dim is 128 MB total across 1000 partitions);
2. the covariance eigendecomposition runs on the driver (dim×dim,
   numpy — O(dim³), data-size-independent);
3. the projection matrix closure-broadcasts into a map-only transform.

No data-scale collect, no shuffle at all: phase 1 is a tree-reduce of
partials, phase 3 is embarrassingly parallel. Rows-only query (DuckDB
has no eigensolver); correctness is unit-tested against numpy's full
PCA on the collected sf0.001 corpus plus invariants (orthonormal
components, descending explained variance, reconstruction error).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openlogreplicator_spark.sources.tables import load_table


def _moment_partials(vec_df: DataFrame, dim: int):
    """Phase 1: (count, sum, gram) partials per partition, reduced on
    the driver. Input column: `embedding` array<float>."""
    import pandas as pd

    def part(batches):
        n = 0
        s = np.zeros(dim)
        g = np.zeros((dim, dim))
        for pdf in batches:
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            n += m.shape[0]
            s += m.sum(axis=0)
            g += m.T @ m
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "g": [g.reshape(-1).tolist()]}
        )

    parts = vec_df.select("embedding").mapInPandas(
        part, schema="n long, s array<double>, g array<double>"
    ).collect()  # model-scale: one row per partition
    n = sum(r.n for r in parts)
    s = np.sum([np.array(r.s) for r in parts], axis=0)
    g = np.sum([np.array(r.g).reshape(dim, dim) for r in parts], axis=0)
    return n, s, g


def fit_pca(vec_df: DataFrame, dim: int, k: int):
    """Covariance eigendecomposition from streamed moments:
    cov = g/n − mean·meanᵀ. Returns (mean, components[k,dim],
    explained_variance[k]) with components in descending-variance
    order, deterministic sign (largest-|loading| coordinate positive)."""
    n, s, g = _moment_partials(vec_df, dim)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)          # ascending
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T               # (k, dim)
    for i in range(comps.shape[0]):     # deterministic sign convention
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, w[order]


def project_pca(
    vec_df: DataFrame,
    mean: np.ndarray,
    comps: np.ndarray,
    whiten_var: np.ndarray | None = None,
) -> DataFrame:
    """Phase 3: map-only projection (x−mean)·compsᵀ, optionally scaled
    by 1/√variance (whitening). Closure-broadcast model; Arrow batches."""
    import pandas as pd

    mean_l = mean.tolist()
    comps_l = comps.tolist()
    scale_l = (
        (1.0 / np.sqrt(np.maximum(whiten_var, 1e-12))).tolist()
        if whiten_var is not None
        else None
    )
    out_schema = "vec_id long, proj array<double>"

    def proj(batches):
        m0 = np.array(mean_l)
        c = np.array(comps_l)
        sc = np.array(scale_l) if scale_l is not None else None
        for pdf in batches:
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            p = (m - m0) @ c.T
            if sc is not None:
                p = p * sc
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "proj": list(p)}
            )

    return vec_df.select("vec_id", "embedding").mapInPandas(
        proj, schema=out_schema
    )


_PCA_K = 8


def embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-8 PCA of the embeddings table under a driver-checkable
    INVARIANT CONTRACT (no SQL eigensolver exists, so the portable
    surface is what a correct PCA must satisfy, not the eigenvectors):
    the fitted basis is orthonormal (driver-side numpy check on the
    k×dim model), the whitened projections are centered (|mean pc| on
    the leading components ~1e-12 vs a 1e-6 gate) and unit-variance
    (mean squared projection norm ≈ k within 5%). The oracle returns
    the exact vector count and literal TRUE for each invariant — a
    wrong eigensolve, a broken centering pass, or a mis-scaled whitener
    each flips a boolean. Full numpy parity stays unit-tested
    (tests/test_linalg.py)."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    mean, comps, var = fit_pca(emb, dim, _PCA_K)
    gram = comps @ comps.T
    orthonormal_ok = bool(
        np.abs(gram - np.eye(_PCA_K)).max() < 1e-8
    )
    out = project_pca(emb, mean, comps, whiten_var=var)
    stats = out.select(
        F.element_at("proj", 1).alias("pc1"),
        F.element_at("proj", 2).alias("pc2"),
        F.aggregate(
            F.transform("proj", lambda x: x * x),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("norm2"),
    )
    return stats.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.lit(orthonormal_ok).alias("orthonormal_ok"),
        (
            (F.abs(F.avg("pc1")) < F.lit(1e-6))
            & (F.abs(F.avg("pc2")) < F.lit(1e-6))
        ).alias("centered_ok"),
        (
            F.abs(F.avg("norm2") - F.lit(float(_PCA_K))) / F.lit(float(_PCA_K))
            < F.lit(0.05)
        ).alias("whitened_ok"),
    )


EMBEDDING_PCA_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
       TRUE AS orthonormal_ok,
       TRUE AS centered_ok,
       TRUE AS whitened_ok
FROM embeddings
"""




_MOM_D = 8  # leading dims emitted by the oracled moment query


def embedding_moments(spark, sf_dir: str):
    """Driver-checkable slice of the PCA input plane: exact integer
    moment sums over the leading ``_MOM_D`` embedding dimensions —
    per-dim sums and the upper-triangular second-moment matrix, with
    every element quantized to FLOOR(x*1000) so cross-engine float
    summation order can never move the hash. ONE scan, ONE map-side-
    combined global aggregate, zero shuffles of data rows — the same
    partial-moment shape `fit_pca` uses (mapInPandas partials there,
    JVM partial aggregation here), so a green driver verdict pins the
    distributed-moment arithmetic the PCA rides on."""
    from pyspark.sql import functions as F

    from openlogreplicator_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = [
        F.floor(F.element_at("embedding", i + 1).cast("double") * 1000)
        .cast("bigint")
        .alias(f"e{i}")
        for i in range(_MOM_D)
    ]
    base = emb.select(*q)
    aggs = [F.count(F.lit(1)).alias("n")]
    aggs += [F.sum(f"e{i}").alias(f"s_{i}") for i in range(_MOM_D)]
    aggs += [
        F.sum(F.col(f"e{i}") * F.col(f"e{j}")).alias(f"p_{i}_{j}")
        for i in range(_MOM_D)
        for j in range(i, _MOM_D)
    ]
    wide = base.agg(*aggs)
    n_pairs = _MOM_D * (_MOM_D + 1) // 2
    # stack the wide aggregate into (kind, key, value) rows
    return wide.selectExpr(
        f"stack({_MOM_D + n_pairs + 1}, 'n', '-', n, "
        + ", ".join(f"'sum', '{i}', s_{i}" for i in range(_MOM_D))
        + ", "
        + ", ".join(
            f"'prod', '{i},{j}', p_{i}_{j}"
            for i in range(_MOM_D)
            for j in range(i, _MOM_D)
        )
        + ") as (kind, dims, value)"
    )


def _moments_sql() -> str:
    qe = lambda i: (
        f"CAST(FLOOR(CAST(embedding[{i + 1}] AS DOUBLE) * 1000) AS BIGINT)"
    )
    rows = ["SELECT 'n' AS kind, '-' AS dims, COUNT(*) AS value FROM embeddings"]
    for i in range(_MOM_D):
        rows.append(
            f"SELECT 'sum', '{i}', SUM({qe(i)}) FROM embeddings"
        )
    for i in range(_MOM_D):
        for j in range(i, _MOM_D):
            rows.append(
                f"SELECT 'prod', '{i},{j}', SUM({qe(i)} * {qe(j)}) "
                "FROM embeddings"
            )
    return "\nUNION ALL\n".join(rows)


EMBEDDING_MOMENTS_SQL = (
    "SELECT kind, dims, CAST(value AS BIGINT) AS value FROM ("
    + _moments_sql()
    + ") t(kind, dims, value)"
)


QUERIES = {
    "embedding_pca": embedding_pca,
    "embedding_moments": embedding_moments,
}

ORACLE: dict[str, str] = {
    "embedding_moments": EMBEDDING_MOMENTS_SQL,
    "embedding_pca": EMBEDDING_PCA_SQL,
}
