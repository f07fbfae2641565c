"""Spatial joins on planar coordinates: the grid-bucketed radius join —
the distributed strategy for "find all pairs within distance r" that a
naive cross join cannot survive at scale.

Scale shape: each point maps to a square grid cell of side ``radius``;
a left point can only match right points in its own or the 8 adjacent
cells, so the left side explodes ×9 onto neighbor cells, the join is a
plain hash equi-join on the cell key, and the exact distance check runs
only on co-celled candidates. Pair work is proportional to local point
density × |points| instead of |left|×|right|; a dense hot cell is the
skew case — cap it upstream (filter or sample dense cells) or salt the
cell key with pipelines.skew.

Pure arithmetic (multiply/compare, no trig), so results are bit-identical
across engines: for geographic coordinates project to a planar CRS (or
accept the small-window equirectangular approximation) before calling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def with_grid_cell(df: DataFrame, x: str, y: str, cell: float,
                   out: str = "cell") -> DataFrame:
    """Tag each point with its ``(floor(x/cell), floor(y/cell))`` grid
    cell as a struct column — the partitioning key for spatial ops."""
    return df.withColumn(out, F.struct(
        F.floor(F.col(x) / cell).alias("cx"),
        F.floor(F.col(y) / cell).alias("cy")))


def radius_join(left: DataFrame, right: DataFrame, radius: float,
                x: str = "x", y: str = "y",
                suffixes: tuple[str, str] = ("_l", "_r")) -> DataFrame:
    """All (left, right) pairs within planar distance ``radius``
    (inclusive). Left explodes onto its 3×3 neighbor cells; one hash
    equi-join on the cell; exact ``dx²+dy² <= r²`` refinement. Output:
    left columns suffixed + right columns suffixed + ``dist``
    (rounded to 6 dp)."""
    if radius <= 0:
        raise ValueError("radius must be positive")
    sl, sr = suffixes
    lcols = [F.col(c).alias(c + sl) for c in left.columns]
    rcols = [F.col(c).alias(c + sr) for c in right.columns]
    l = left.select(*lcols)
    r = right.select(*rcols)

    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    l = (with_grid_cell(l, x + sl, y + sl, radius, out="__cell")
         .withColumn("__o", F.explode(offsets))
         .withColumn("__cx", F.col("__cell.cx") + F.col("__o.dx"))
         .withColumn("__cy", F.col("__cell.cy") + F.col("__o.dy"))
         .drop("__o", "__cell"))
    r = (with_grid_cell(r, x + sr, y + sr, radius, out="__cell")
         .withColumn("__cx", F.col("__cell.cx"))
         .withColumn("__cy", F.col("__cell.cy"))
         .drop("__cell"))
    dx = F.col(x + sl) - F.col(x + sr)
    dy = F.col(y + sl) - F.col(y + sr)
    d2 = dx * dx + dy * dy
    return (l.join(r, ["__cx", "__cy"])
            .filter(d2 <= F.lit(float(radius) * float(radius)))
            .drop("__cx", "__cy")
            .withColumn("dist", F.round(F.sqrt(d2), 6)))


def knn_join(left: DataFrame, right: DataFrame, k: int, max_radius: float,
             x: str = "x", y: str = "y",
             suffixes: tuple[str, str] = ("_l", "_r")) -> DataFrame:
    """Bounded k-nearest-neighbors: for each left point, the ``k``
    closest right points within ``max_radius`` (points with fewer than k
    in-range neighbors return what exists). Reuses the grid radius join
    for candidates, then one window top-k per left point — the bounded
    form is what scales: unbounded kNN degenerates to all-pairs when a
    point sits in an empty region, while the radius bound keeps candidate
    count proportional to local density. Ties on distance break by the
    right row's coordinates (deterministic)."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    sl, sr = suffixes
    cand = radius_join(left, right, max_radius, x=x, y=y, suffixes=suffixes)
    w = (Window.partitionBy(*[F.col(c + sl) for c in left.columns])
         .orderBy(F.col("dist").asc(),
                  F.col(x + sr).asc(), F.col(y + sr).asc()))
    return (cand.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k)
            .withColumnRenamed("__rk", "nn_rank"))


def hash_coords(df: DataFrame, key_col: str, scale: float = 1000.0,
                salt: str = "geo", x: str = "x", y: str = "y") -> DataFrame:
    """Deterministic synthetic planar coordinates in [0, scale) derived
    from a key's md5 — test/benchmark scaffolding that any SQL engine
    reproduces exactly (the spatial operators themselves are
    coordinate-source-agnostic)."""
    def coord(salt_part: str):
        h = F.substring(
            F.md5(F.concat(F.lit(salt + salt_part),
                           F.col(key_col).cast("string"))), 1, 8)
        return (F.conv(h, 16, 10).cast("double")
                / F.lit(4294967296.0) * F.lit(scale))

    return df.withColumn(x, coord(":x")).withColumn(y, coord(":y"))


def dbscan_clusters(df: DataFrame, id_col: str, x: str = "x",
                    y: str = "y", eps: float = 20.0,
                    min_pts: int = 4) -> DataFrame:
    """DBSCAN density clustering (Ester et al. 1996), distributed:

    1. eps-neighbor pairs via the grid-bucketed radius SELF-join (3x3
       neighbor cells — work bounded by local density: a cell holds
       ~density*eps² points, so uniform data costs linear; a degenerate
       everything-in-one-spot input degrades to its quadratic semantic
       answer, same contract as :func:`radius_join`),
    2. CORE points: |N_eps(p)| >= min_pts, the point itself included,
    3. clusters = connected components of the core-core eps graph
       (``dedup.dedup_clusters`` pointer jumping, min-id labels,
       O(log diameter) rounds),
    4. BORDER points: non-core with >= 1 core eps-neighbor, labeled
       with the MINIMUM cluster among their core neighbors (the
       deterministic tie-break plain DBSCAN leaves visit-order
       dependent), 5. everything else NOISE.

    Output: ``(id_col, role, cluster)`` with cluster NULL for noise.
    Every stage is a grouped aggregate or key equi-join; the oracle
    replays the grid join brute-force and the components with a
    recursive CTE."""
    from otit_swt_spark.pipelines.dedup import dedup_clusters

    pts = df.select(F.col(id_col).alias("id"), F.col(x).alias("x"),
                    F.col(y).alias("y"))
    # the eps-neighbor pair set feeds THREE consumers (degree count, the
    # core-core edge filter, and the border join) — materialize the grid
    # join once instead of re-running it per branch (lazy localCheckpoint,
    # the same lineage-control idiom as triangle_count/pagerank)
    pairs = (radius_join(pts, pts, eps)
             .where(F.col("id_l") != F.col("id_r"))
             .select(F.col("id_l").alias("a"), F.col("id_r").alias("b"))
             .localCheckpoint(eager=False))
    deg = pairs.groupBy("a").agg((F.count(F.lit(1)) + 1).alias("__n"))
    core = deg.where(F.col("__n") >= min_pts).select(F.col("a").alias("id"))
    cedges = (pairs
              .join(core.select(F.col("id").alias("a")), "a", "left_semi")
              .join(core.select(F.col("id").alias("b")), "b", "left_semi"))
    comps = dedup_clusters(cedges.select(F.col("a").alias("id_a"),
                                         F.col("b").alias("id_b")))
    core_lab = (core.join(comps, "id", "left")
                .select("id", F.coalesce("cluster", F.col("id"))
                        .alias("__cc")))
    border = (pairs.join(core, F.col("a") == core["id"], "left_anti")
              .join(core_lab.select(F.col("id").alias("b"),
                                    F.col("__cc").alias("cluster")), "b")
              .groupBy("a").agg(F.min("cluster").alias("__bc")))
    return (pts.select("id")
            .join(core_lab, "id", "left")
            .join(border.select(F.col("a").alias("id"), "__bc"),
                  "id", "left")
            .select(F.col("id").alias(id_col),
                    F.when(F.col("__cc").isNotNull(), F.lit("core"))
                    .when(F.col("__bc").isNotNull(), F.lit("border"))
                    .otherwise(F.lit("noise")).alias("role"),
                    F.coalesce("__cc", "__bc").alias("cluster")))
