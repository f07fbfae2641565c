"""Embedding-space clustering for corpus curation: fixed-iteration Lloyd
k-means, SemDeDup-style semantic dedup (Abbas et al. 2023 — drop
near-duplicates WITHIN a cluster so the pair blowup is cluster-bounded,
never corpus-wide), and cluster-balanced diversity sampling.

Determinism contract (what makes these oracle-checkable, unlike library
k-means): seeding is the k lowest ids' vectors, the assignment argmin
tie-breaks on the lowest centroid index, centroid updates divide exact
DECIMAL sums (partitioning-independent, so float(sum)/n is ONE double op
on identical inputs in any engine — no rounding needed or wanted), and
every distance is an ordered left fold over the dimensions — so a SQL
engine replays assignments bit-for-bit.

Scale shape: each Lloyd round is ONE map-side assignment pass (centroids
ride in the plan as k×dim literals — driver-bounded state, the classic
broadcast-kmeans layout) plus ONE (cluster, dim)-keyed aggregation whose
output is k×dim rows (a bounded driver collect, like
``embedding.standardize_embeddings``). Nothing per-row ever lands on the
driver. At 100 TB: k scales as corpus/target_cluster_size, the
assignment stays embarrassingly parallel, and the update shuffle carries
k×dim×partitions partial sums only.

Reference: no twin in /root/reference (a query engine, not a training-
data pipeline); part of the north-star LLM-pipeline surface alongside
pipelines.similarity / pipelines.embedding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_DEC = "decimal(38,12)"


def _dist2(v, cent: list[float]):
    """Squared L2 distance as an ordered left fold (matches a SQL
    list_reduce over the same zip — FP-identical across engines)."""
    arr = F.array(*[F.lit(float(x)) for x in cent])
    return F.aggregate(F.zip_with(v, arr, lambda a, b: (a - b) * (a - b)),
                       F.lit(0.0), lambda a, x: a + x)


def _assign_expr(v, cents: list[list[float]]):
    """(cluster, dist2) of the nearest centroid; ties take the lowest
    centroid index (struct array_min compares dist first, then index)."""
    best = F.array_min(F.array(*[
        F.struct(_dist2(v, c).alias("d"), F.lit(j).alias("j"))
        for j, c in enumerate(cents)]))
    return best["j"], best["d"]


def kmeans_fit(df: DataFrame, k: int = 8, iters: int = 2,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> list[list[float]]:
    """Run ``iters`` Lloyd rounds and return the centroid list (k×dim —
    driver-bounded model state). Seed: the vectors of the ``k`` lowest
    ids among DISTINCT vectors (each distinct vector represented by its
    minimum id) — duplicate vectors at the head of the id space (common
    after upstream dedup orderings or boilerplate embeddings) would
    otherwise seed identical centroids whose clusters starve immediately
    and never move, degenerating to fewer effective clusters. Update:
    per-(cluster, dim) exact-DECIMAL-sum mean (unrounded — see the module
    determinism contract); a cluster that loses all members keeps its
    previous centroid."""
    base = df.select(F.col(id_col).alias("id"),
                     F.col(vec_col).cast("array<double>").alias("v"))
    seed = (base.groupBy("v").agg(F.min("id").alias("id"))
            .orderBy("id").limit(k).collect())
    cents = [list(r["v"]) for r in seed]
    if len(cents) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(cents)}")
    for _ in range(iters):
        cl, _d = _assign_expr(F.col("v"), cents)
        # two-step select: a generator (posexplode) next to the struct
        # field access in ONE projection trips Spark 4's re-resolution
        # (field names degrade to col1/col2)
        stats = (base.select(cl.alias("c"), "v")
                 .select("c", F.posexplode("v").alias("pos", "x"))
                 .groupBy("c", "pos")
                 .agg(F.sum(F.col("x").cast(_DEC)).alias("s"),
                      F.count(F.lit(1)).alias("n"))
                 .collect())
        by_cluster: dict[int, dict[int, float]] = {}
        for r in stats:
            by_cluster.setdefault(r["c"], {})[r["pos"]] = \
                float(r["s"]) / r["n"]
        cents = [
            [m[p] for p in range(len(cents[j]))]
            if (m := by_cluster.get(j)) else cents[j]      # empty: keep old
            for j in range(k)
        ]
    return cents


def kmeans_assign(df: DataFrame, k: int = 8, iters: int = 2,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Fit + final assignment pass: ``(id_col, cluster, dist2)`` with
    dist2 rounded to 6 dp. One extra map-side pass over the corpus after
    :func:`kmeans_fit`."""
    cents = kmeans_fit(df, k, iters, id_col, vec_col)
    v = F.col(vec_col).cast("array<double>")
    cl, d = _assign_expr(v, cents)
    return df.select(F.col(id_col), cl.alias("cluster"),
                     F.round(d, 6).alias("dist2"))


def semantic_dedup(df: DataFrame, k: int = 8, iters: int = 2,
                   min_cosine: float = 0.95, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   max_cell_size: int = 2048) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means the embeddings, compare pairs
    ONLY within a cluster, and flag a document as a semantic duplicate
    when some LOWER-id cluster-mate has cosine >= ``min_cosine`` (the
    lowest such id is reported as the kept representative). Returns one
    row per vector: ``(id_col, cluster, is_dup, dup_of)`` with dup_of
    NULL for kept rows.

    Scale: the self-join is cluster-bounded — the whole point of
    clustering first; size ``k`` ~ corpus/target_cluster_size so cluster
    populations stay bounded as the corpus grows (the assignment pass is
    map-side, so large k costs plan literals, not shuffles). Degenerate
    corpora break that assumption (90% of vectors in one cluster stays
    one cluster no matter what k is), so clusters larger than
    ``max_cell_size`` are salted into ``ceil(n/max_cell_size)``
    deterministic md5 sub-cells and all-pairs comparison runs within a
    CELL; id-successor chain pairs across the whole cluster keep runs of
    identical/near-identical vectors detected regardless of cell
    boundaries. Recall caveat in the capped regime: a near-dup pair split
    across cells with no id-adjacent bridge can go unflagged, and dup_of
    reports the lowest id among DETECTED mates (which may exceed the true
    cluster-wide minimum); pair volume is bounded at ~n*max_cell_size/2
    per cluster — linear in n for fixed cell size."""
    from otit_swt_spark.pipelines.similarity import dot, norm
    from pyspark.sql import Window as W

    assigned = kmeans_assign(df, k, iters, id_col, vec_col) \
        .select(F.col(id_col).alias("id"), "cluster")
    n_cells = F.ceil(F.count(F.lit(1)).over(W.partitionBy("cluster"))
                     / F.lit(float(max_cell_size))).cast("bigint")
    cell = (F.conv(F.substring(
        F.md5(F.concat(F.lit("sdcell:"), F.col("id").cast("string"))), 1, 8),
        16, 10).cast("long") % n_cells)
    celled = assigned.select("id", "cluster", n_cells.alias("__nc"),
                             cell.alias("__cell"))
    l = celled.select(F.col("id").alias("id_a"), "cluster", "__cell")
    r = celled.select(F.col("id").alias("id_b"), "cluster", "__cell")
    cand = (l.join(r, ["cluster", "__cell"])
            .filter(F.col("id_b") < F.col("id_a"))
            .select("cluster", "id_a", "id_b"))
    chain = (celled
             .withColumn("__prev", F.lag("id").over(
                 W.partitionBy("cluster").orderBy("id")))
             .filter((F.col("__nc") > 1) & F.col("__prev").isNotNull())
             .select("cluster", F.col("id").alias("id_a"),
                     F.col("__prev").alias("id_b")))
    cand = cand.unionByName(chain).dropDuplicates(["id_a", "id_b"])
    # per-vector norm staged once: cosine() would re-run the interpreted
    # norm fold per candidate PAIR; dot/(na*nb) uses the identical
    # doubles, so the rounded cos_sim is bit-unchanged (guide §4.2)
    vecs = (df.select(F.col(id_col).alias("id"),
                      F.col(vec_col).cast("array<double>").alias("v"))
            .withColumn("nv", norm(F.col("v"))))
    dup_pairs = (cand
                 .join(vecs.select(F.col("id").alias("id_a"),
                                   F.col("v").alias("va"),
                                   F.col("nv").alias("na")), "id_a")
                 .join(vecs.select(F.col("id").alias("id_b"),
                                   F.col("v").alias("vb"),
                                   F.col("nv").alias("nb")), "id_b")
                 .filter(F.round(F.try_divide(dot(F.col("va"), F.col("vb")),
                                              F.col("na") * F.col("nb")), 6)
                         >= min_cosine)
                 .groupBy("id_a")
                 .agg(F.min("id_b").alias("dup_of")))
    return (assigned
            .join(dup_pairs.withColumnRenamed("id_a", "id"), "id", "left")
            .select(F.col("id").alias(id_col), "cluster",
                    F.col("dup_of").isNotNull().alias("is_dup"), "dup_of"))


def diversity_sample(df: DataFrame, per_cluster: int, k: int = 8,
                     iters: int = 2, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     salt: str = "div") -> DataFrame:
    """Cluster-balanced selection: keep at most ``per_cluster`` vectors
    per k-means cluster, chosen by md5 rank (deterministic, unbiased
    within the cluster) — the diversity-preserving downsample that keeps
    small embedding modes alive where a global hash sample would wash
    them out. Returns ``(id_col, cluster, pick_rank)`` for kept rows.

    One window per cluster key after the map-side assignment; no global
    sort."""
    from pyspark.sql import Window as W

    assigned = kmeans_assign(df, k, iters, id_col, vec_col)
    okey = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    w = W.partitionBy("cluster").orderBy(okey.asc(), F.col(id_col).asc())
    return (assigned
            .withColumn("pick_rank", F.row_number().over(w))
            .filter(F.col("pick_rank") <= per_cluster)
            .select(id_col, "cluster", "pick_rank"))


def kmeans_silhouette(df: DataFrame, k: int = 8, iters: int = 2,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Simplified (centroid-based) silhouette per cluster — the
    clustering-quality gate: for each vector, ``a`` = distance to its
    own centroid, ``b`` = distance to the nearest OTHER centroid,
    ``s = (b − a) / max(a, b)`` (0 for a vector sitting exactly on two
    centroids); report per-cluster size and mean silhouette. This is
    the O(n·k) medoid-free variant (exact silhouette is O(n²) pairwise
    — never at 100 TB); scores near 0 flag clusters that overlap their
    neighbor, negative means mis-assignment pressure.

    Map-side after the fit: distances against broadcast-literal
    centroids, per-cluster means as DECIMAL-exact sums — the same
    replay contract as kmeans_fit, so the oracle extends the unrolled
    Lloyd chain."""
    cents = kmeans_fit(df, k, iters, id_col, vec_col)
    v = F.col(vec_col).cast("array<double>")
    cl, d_own = _assign_expr(v, cents)
    d_other = F.array_min(F.array(*[
        F.when(F.lit(j) == cl, F.lit(float("inf")))
        .otherwise(_dist2(v, c))
        for j, c in enumerate(cents)]))
    a = F.sqrt(d_own)
    b = F.sqrt(d_other)
    s = F.when(F.greatest(a, b) > 0.0,
               (b - a) / F.greatest(a, b)).otherwise(F.lit(0.0))
    staged = df.select(cl.alias("cluster"), s.alias("__s"))
    return (staged.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n_vectors"),
                 (F.round(F.sum(F.col("__s").cast("decimal(38,12)"))
                          .cast("double")
                          / F.count(F.lit(1)).cast("double"), 6)
                  + F.lit(0.0)).alias("mean_silhouette")))
