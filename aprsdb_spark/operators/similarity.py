"""Similarity search over embedding columns (array<float>).

- dot_expr:    pure-SQL dot product (zip_with + aggregate) — the data is
               L2-normalized, so dot == cosine (FIXTURES.md).
- brute top-k: score all, TakeOrderedAndProject — exact baseline.
- IVF:         coarse quantizer (K centroids, deterministic seed rows),
               assign once, probe nprobe clusters at query time. The
               100 TB path: the index pass is one broadcast-join +
               window over the corpus; a query then scans ~nprobe/K of
               the data. Centroid collect() is index *metadata* (K·dim
               floats), not a data collect.
- LSH (random hyperplane): sign-bit sketch for cosine — bucket join for
  all-pairs; hyperplanes derive from xxhash64, seed-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(vec: str | Column) -> Column:
    c = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(c, lambda x: x.cast("double"))


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential-order dot product — bit-identical on any engine that
    folds left (DuckDB list_dot_product, NumPy pairwise differs — oracle
    uses list_dot_product on DOUBLE[] which matches)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def brute_topk(emb: DataFrame, query_vec: Column, k: int = 10) -> DataFrame:
    """Exact top-k by dot score; deterministic tie-break on vec_id."""
    from ..functions import rnd

    scored = emb.select(
        "vec_id", "label", rnd(dot_expr(as_double("embedding"), query_vec), 6).alias("score")
    )
    return scored.orderBy(F.col("score").desc(), F.col("vec_id").asc()).limit(k)


def ivf_assign(emb: DataFrame, k_clusters: int = 16) -> tuple[DataFrame, list]:
    """One-pass IVF index: centroids = the first k vectors by vec_id
    (deterministic seeding, matching a k-means|| init's first round);
    every vector is assigned to its max-dot centroid.

    Returns (assignments df, centroid python list for query planning).
    """
    cents = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.orderBy("vec_id").limit(k_clusters).collect()
    ]
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(cid).alias("cluster_id"),
                F.array(*[F.lit(x) for x in vec]).alias("cvec"),
            )
            for cid, vec in cents
        ]
    )
    scored = emb.select(
        "vec_id",
        "label",
        "embedding",
        F.explode(cent_arr).alias("c"),
    ).select(
        "vec_id",
        "label",
        "embedding",
        F.col("c.cluster_id").alias("cluster_id"),
        dot_expr(as_double("embedding"), F.col("c.cvec")).alias("cscore"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cscore").desc(), F.col("cluster_id"))
    assigned = scored.withColumn("rn", F.row_number().over(w)).where("rn = 1").drop("rn")
    return assigned, cents


def ivf_search(
    assigned: DataFrame, cents: list, query_vec: list[float], k: int = 10, nprobe: int = 4
) -> DataFrame:
    """Probe the nprobe closest clusters, brute-force within them."""
    import numpy as np

    from ..functions import rnd

    q = np.array(query_vec)
    order = sorted(
        ((float(np.dot(q, np.array(v))), cid) for cid, v in cents), reverse=True
    )
    probe = [cid for _, cid in order[:nprobe]]
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assigned.where(F.col("cluster_id").isin(probe))
        .select(
            "vec_id",
            "label",
            "cluster_id",
            rnd(dot_expr(as_double("embedding"), qcol), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def hyperplane_sketch(vec: str | Column, n_planes: int = 16, dim: int = 64) -> Column:
    """Random-hyperplane (sign) sketch for cosine LSH, as an INT bucket.

    Plane p's component j is a deterministic pseudo-random ±1 derived
    from xxhash64(p, j) — seed-stable across runs and engines that share
    xxhash64; used for bucketing only, so portability doesn't matter.
    """
    v = as_double(vec)
    bits = []
    for p in range(n_planes):
        # ±1 pattern: parity of xxhash64 of (p, j)
        proj = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, j: x
                * F.when(F.xxhash64(F.lit(p), j).bitwiseAND(F.lit(1).cast("long")) == 0, 1.0).otherwise(-1.0),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out
