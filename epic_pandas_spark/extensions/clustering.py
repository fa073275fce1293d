"""Distributed k-means (Lloyd's) over embedding columns — centroid
training for IVF codebooks and corpus clustering.

Scale shape per iteration: centroids (k×dim doubles) broadcast to
executors; assignment is a per-row argmin over the broadcast codebook
(pure expressions); the centroid update is ONE hash-aggregate of per-
dimension sums via posexplode — shuffle payload k×dim partials per task,
independent of corpus size. Centroids sync through the driver (k×dim
values), exactly like MLlib's implementation."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def _sq_dist_expr(vec, centroid: list[float]):
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_clusters(df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding") -> DataFrame:
    """Append (cluster, sq_dist) = nearest centroid by squared euclidean.
    Expression-only argmin over the broadcast codebook."""
    vec = F.col(vec_col).cast("array<double>")
    dists = [_sq_dist_expr(vec, c) for c in centroids]
    best_d = F.least(*dists) if len(dists) > 1 else dists[0]
    cluster = F.lit(0)
    for i in range(len(dists) - 1, -1, -1):
        cluster = F.when(dists[i] == best_d, F.lit(i)).otherwise(cluster)
    return df.withColumn("cluster", cluster).withColumn("sq_dist", best_d)


def kmeans_fit(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_iterations: int = 10,
    tol: float | None = 1e-6,
    initial_centroids: list[list[float]] | None = None,
) -> tuple[list[list[float]], float]:
    """Lloyd's algorithm; returns (centroids, inertia).

    Init: the k corpus vectors with smallest xxhash64(id) — deterministic,
    seedless — or the caller's ``initial_centroids`` (warm starts,
    k-means++ seeds picked elsewhere, or a replayable init for the
    cross-engine oracle). Each iteration = one assignment pass + one
    posexplode aggregate (which carries BOTH the new per-dimension means
    and the per-cluster inertia — one driver action per round, not two).

    ``tol=None`` runs exactly ``max_iterations`` rounds with NO inertia
    bookkeeping and returns inertia as NaN — the codebook-training mode
    (e.g. IVF) where the caller discards inertia and every extra driver
    action is a wasted job launch."""
    if initial_centroids is not None:
        if len(initial_centroids) != k:
            raise ValueError(
                f"initial_centroids has {len(initial_centroids)} rows, expected k={k}"
            )
        centroids = [[float(x) for x in c] for c in initial_centroids]
    else:
        init_rows = (
            df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
            .orderBy(F.xxhash64(F.col(id_col)).asc())
            .limit(k)
            .collect()
        )
        centroids = [list(r["v"]) for r in init_rows]
    prev_inertia = math.inf
    inertia = math.nan
    for _ in range(max_iterations):
        assigned = assign_clusters(df, centroids, vec_col)
        sums = (
            assigned.select(
                "cluster",
                "sq_dist",
                F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "val"),
            )
            .groupBy("cluster", "pos")
            .agg(
                F.sum("val").alias("s"),
                F.count(F.lit(1)).alias("n"),
                # each source row contributes its sq_dist once per dim;
                # summing only the pos==0 copies recovers the true
                # per-cluster inertia inside the SAME aggregate
                F.sum(F.when(F.col("pos") == 0, F.col("sq_dist"))).alias("sq0"),
            )
        )
        stats = (
            sums.groupBy("cluster")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), (F.col("s") / F.col("n")).alias("m")))
                ).alias("dims"),
                F.sum("sq0").alias("cluster_inertia"),
            )
            .collect()
        )
        new_centroids = list(centroids)
        for r in stats:
            new_centroids[r["cluster"]] = [d["m"] for d in r["dims"]]
        centroids = new_centroids
        if tol is not None:
            inertia = float(sum(r["cluster_inertia"] for r in stats))
            if prev_inertia - inertia < tol * max(abs(prev_inertia), 1.0):
                break
            prev_inertia = inertia
    if tol is None:
        return centroids, math.nan
    # report inertia of the FINAL centroids (the loop's measurement is one
    # Lloyd step stale relative to the last update)
    final_inertia = assign_clusters(df, centroids, vec_col).agg(F.sum("sq_dist")).first()[0]
    return centroids, float(final_inertia)
