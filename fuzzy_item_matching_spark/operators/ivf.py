"""IVF (inverted-file) approximate nearest neighbors — the
centroid-partitioned alternative to sign-LSH bucketing
(`operators/lsh.py`), behind the same candidate-equi-join shape.

Cells are defined by unit centroids sampled deterministically from the
data (lowest ids — seedless and stable; a k-means refinement would
drop in without changing the join shape). Each vector is assigned to
its nearest cell; queries probe their ``n_probe`` nearest cells.
Candidates = (query, neighbor) pairs sharing a probed cell — work
scales with cell occupancy, never n². At 1000×, n_centroids grows
~√n to keep cells balanced, and the centroid table stays a driver-side
literal (KBs).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fuzzy_item_matching_spark.functions.vector import dot, l2_norm


def _unit(vec: list[float]) -> list[float]:
    n = math.sqrt(sum(x * x for x in vec)) or 1.0
    return [x / n for x in vec]


def sample_centroids(
    df: DataFrame, id_col: str, vec_col: str, n_centroids: int
) -> list[list[float]]:
    """Deterministic centroid sample: the ``n_centroids`` rows with the
    smallest ids, L2-normalized driver-side (tiny collect — KBs)."""
    rows = (
        df.select(id_col, vec_col).orderBy(id_col).limit(n_centroids).collect()
    )
    return [_unit([float(x) for x in r[1]]) for r in rows]


def _cell_scores(vec: Column, centroids: list[list[float]]) -> Column:
    """array<struct<score,cell>> — dot with each unit centroid (vector
    norm is constant across cells, so dot order == cosine order)."""
    return F.array(
        *[
            F.struct(
                dot(vec, F.array(*[F.lit(x) for x in c])).alias("score"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(centroids)
        ]
    )


def refine_centroids(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    iterations: int = 2,
) -> list[list[float]]:
    """Lloyd iterations for IVF cells: assign each vector to its
    nearest centroid, recompute per-cell means (posexplode + hash agg —
    one distributed pass per iteration), renormalize driver-side.
    Only the n_centroids×dim mean table is ever collected (KBs)."""
    for _ in range(iterations):
        # Two selects: a generator (posexplode) in the same projection
        # as the struct getField loses struct field names (resolves to
        # col1/col2) — assign the cell first, then explode.
        cells = df.select(
            F.element_at(
                F.reverse(F.array_sort(_cell_scores(F.col(vec_col), centroids))), 1
            )
            .getField("cell")
            .alias("__cell"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
        assigned = cells.select(
            "__cell", F.posexplode("__v").alias("__pos", "__x")
        )
        means = (
            assigned.groupBy("__cell", "__pos")
            .agg(F.avg("__x").alias("__m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:  # index access: Row attrs reject dunder names
            by_cell.setdefault(r["__cell"], {})[r["__pos"]] = r["__m"]
        dim = len(centroids[0])
        centroids = [
            _unit([by_cell[c].get(p, 0.0) for p in range(dim)])
            if c in by_cell
            else centroids[c]  # empty cell keeps its old centroid
            for c in range(len(centroids))
        ]
    return centroids


def ivf_cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 3,
    centroids: list[list[float]] | None = None,
    refine_iters: int = 2,
) -> DataFrame:
    """Approximate cosine top-k per vector via IVF cells.

    Index side: each vector lands in its single nearest cell. Query
    side: each vector probes its ``n_probe`` nearest cells. The
    candidate join key is the cell id; exact cosine ranks candidates.
    Recall misses only neighbors whose cell the query didn't probe —
    graded vs brute force in tests.
    """
    if centroids is None:
        centroids = sample_centroids(df, id_col, vec_col, n_centroids)
        if refine_iters:
            centroids = refine_centroids(df, vec_col, centroids, refine_iters)

    scored = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        l2_norm(vec_col).alias("__n"),
        F.reverse(F.array_sort(_cell_scores(F.col(vec_col), centroids))).alias(
            "__cells"
        ),
    ).persist()  # cell scoring = n_centroids dots per row; feeds both sides

    index = scored.select(
        F.col("__id").alias("nid"),
        F.col("__v").alias("__vn"),
        F.col("__n").alias("__nn"),
        F.element_at("__cells", 1).getField("cell").alias("__cell"),
    )
    probes = scored.select(
        F.col("__id").alias("qid"),
        F.col("__v").alias("__vq"),
        F.col("__n").alias("__nq"),
        F.explode(
            F.transform(
                F.slice("__cells", 1, n_probe), lambda s: s.getField("cell")
            )
        ).alias("__cell"),
    )
    denom = F.col("__nq") * F.col("__nn")
    cand = (
        probes.join(index, "__cell")
        .filter(F.col("qid") != F.col("nid"))
        .withColumn(
            "cosine",
            F.when(denom == 0.0, F.lit(0.0)).otherwise(dot("__vq", "__vn") / denom),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "nid", "cosine", "rnk")
    )
