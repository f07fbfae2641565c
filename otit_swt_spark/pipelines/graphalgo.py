"""Graph analytics over relational co-occurrence graphs: edge derivation,
degree statistics, triangle counting, PageRank — the graph-mining
companions to the SPARQL engine (which answers *pattern* queries over the
same data; these answer *structure* queries).

Scale shape:
- edge derivation is one self-join per group key with an optional
  ``max_group_size`` clip — the classic guard against hub groups whose
  pair count is quadratic in group size;
- triangle counting uses canonical (a < b) edges, so each triangle is
  counted exactly once and the three-way join never revisits a
  permutation — the standard node-ordering optimization;
- PageRank is the log-round iterative shape this repo already uses for
  Kleene closures and dedup clustering: per-iteration localCheckpoint
  keeps lineage flat; contributions shuffle on the node key only.

Reference: no twin in /root/reference (query engine, not graph mining);
additive like pipelines/analytics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cooccurrence_edges(df: DataFrame, group_col: str, item_col: str,
                       max_group_size: int | None = None) -> DataFrame:
    """Distinct canonical item pairs ``(a < b)`` co-occurring in a group
    (parts on one order, tokens in one doc, …). ``max_group_size`` drops
    groups larger than the clip BEFORE pairing — at corpus scale one hub
    group (the mega-order, the bot session) otherwise emits |group|²/2
    pairs and dominates the stage."""
    items = df.select(F.col(group_col).alias("g"),
                      F.col(item_col).alias("i")).distinct()
    if max_group_size is not None:
        sizes = (items.groupBy("g")
                 .agg(F.count(F.lit(1)).alias("__n"))
                 .filter(F.col("__n") <= max_group_size)
                 .select("g"))
        items = items.join(sizes, "g")
    a = items.select("g", F.col("i").alias("a"))
    b = items.select("g", F.col("i").alias("b"))
    return (a.join(b, (a.g == b.g) & (F.col("a") < F.col("b")))
            .select("a", "b").distinct())


def degree_stats(edges: DataFrame) -> DataFrame:
    """Per-node degree of an undirected canonical edge set: ``(node,
    degree)``. One generate + one grouped count: the edge set is read
    ONCE (explode of [a, b]) where the earlier union form read it twice
    — half the input passes at scale, and inside iterative callers
    (kcore's peel loop) half the copies of the live-edge subtree pasted
    into each round's plan, whose planning/stage-dedup overhead
    dominated kcore's wall (r14: kcore noop median 8.7 -> 7.0 s from
    this change alone; result multiset identical)."""
    und = edges.select(F.explode(F.array("a", "b")).alias("node"))
    return und.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))


def triangle_count(edges: DataFrame) -> DataFrame:
    """Total triangle count of a canonical (a < b) edge set — one row
    ``(n_triangles)``. The wedge join (e1.b = e2.a) only extends paths
    upward in node order, so each triangle (x < y < z) is produced by
    exactly one wedge and closed by exactly one edge probe."""
    # the edge set is probed three times (both wedge legs + the closing
    # probe); materialize it once instead of re-deriving the upstream
    # pair-generation join per leg (same lineage-control idiom as pagerank).
    # eager=False keeps the builder lazy — no Spark job fires unless the
    # result is actually consumed
    edges = edges.localCheckpoint(eager=False)
    e1 = edges.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = edges.select(F.col("a").alias("y2"), F.col("b").alias("z"))
    e3 = edges.select(F.col("a").alias("x3"), F.col("b").alias("z3"))
    wedges = e1.join(e2, F.col("y") == F.col("y2"))
    closed = wedges.join(
        e3, (F.col("x") == F.col("x3")) & (F.col("z") == F.col("z3")))
    return closed.agg(F.count(F.lit(1)).alias("n_triangles"))


def neighborhood_jaccard(edges: DataFrame, min_common: int = 1) -> DataFrame:
    """Link-prediction scores: for every node pair with at least
    ``min_common`` common neighbors, the Jaccard similarity of their
    neighborhoods ``|N(a)∩N(b)| / |N(a)∪N(b)|`` — the classic
    common-neighbors predictor.

    Plan: wedges (two undirected hops through a shared neighbor) grouped
    on the canonical pair count the intersection in ONE shuffle; degrees
    broadcast-join in for the union via inclusion-exclusion — no
    neighbor-set arrays are ever materialized. Pair count is bounded by
    wedge count (Σ deg(v)²); clip hub nodes upstream when that explodes.
    Output: ``(a, b, common, jaccard)`` rounded to 6 dp."""
    # the undirected edge list feeds THREE consumers (degrees + both wedge
    # legs); materialize it once instead of re-deriving the upstream edge
    # generation (often itself a join, e.g. cooccurrence_edges) per
    # consumer — same lazy lineage-control idiom as triangle_count/pagerank
    und = (edges.select(F.col("a").alias("u"), F.col("b").alias("v"))
           .unionAll(edges.select(F.col("b").alias("u"),
                                  F.col("a").alias("v")))
           .localCheckpoint(eager=False))
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # wedge u1 - w - u2 with u1 < u2: one row per (pair, shared neighbor)
    e1 = und.select(F.col("v").alias("w"), F.col("u").alias("p"))
    e2 = und.select(F.col("v").alias("w2"), F.col("u").alias("q"))
    wedges = (e1.join(e2, (F.col("w") == F.col("w2"))
                      & (F.col("p") < F.col("q")))
              .select("p", "q"))
    common = (wedges.groupBy("p", "q")
              .agg(F.count(F.lit(1)).alias("common"))
              .filter(F.col("common") >= min_common))
    da = deg.select(F.col("u").alias("p"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("u").alias("q"), F.col("deg").alias("deg_b"))
    return (common.join(da, "p").join(db, "q")
            .select(F.col("p").alias("a"), F.col("q").alias("b"), "common",
                    F.round(F.col("common") / (F.col("deg_a") + F.col("deg_b")
                                               - F.col("common")), 6)
                    .alias("jaccard")))


def undirect(edges: DataFrame) -> DataFrame:
    """Both directions of a canonical (a, b) edge list as (src, dst),
    lazily checkpointed once — the edge frame every iterative algorithm
    re-probes each round (re-deriving an upstream pair-generation join
    per round would multiply its cost by the iteration count)."""
    return (edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .unionAll(edges.select(F.col("b").alias("src"),
                                   F.col("a").alias("dst")))
            .localCheckpoint(eager=False))


def aggregate_messages(edges: DataFrame, vertices: DataFrame,
                       send, merge, iters: int,
                       checkpoint_every: int = 1) -> DataFrame:
    """GraphFrames/Pregel-style fixed-iteration message loop — the shared
    harness behind :func:`pagerank` and :func:`label_propagation` (and
    any future vertex-centric algorithm):

    - ``edges``: (src, dst [, edge attrs]) — pre-undirected (see
      :func:`undirect`) and already lineage-controlled;
    - ``vertices``: (id, <state cols>) initial state;
    - ``send(edges, vertices) -> DataFrame``: one row per message,
      addressed by an ``id`` column (typically: join state onto src,
      re-key to dst);
    - ``merge(messages) -> DataFrame``: aggregate per id and produce the
      NEXT (id, <state cols>) frame — owning both the combine and the
      vertex update keeps multi-stage merges (count → argmax, as in LPA)
      expressible, which a single agg-expression API cannot do;
    - lineage control: a lazy ``localCheckpoint`` every
      ``checkpoint_every`` rounds, exactly the cadence the hand-rolled
      loops used — no action fires inside the loop, so the whole
      ``iters``-round computation remains ONE job when consumed.

    Fixed iteration count by contract (not run-to-convergence), so SQL
    oracles can replay the rounds verbatim — the repo-wide lesson from
    the dedup/LPA oracles. Convergence-style loops (Kleene closure,
    cluster pointer-jumping) need a per-round materializing action to
    read their delta and deliberately stay hand-rolled."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    for it in range(iters):
        vertices = merge(send(edges, vertices))
        if (it + 1) % checkpoint_every == 0 and it + 1 < iters:
            vertices = vertices.localCheckpoint(eager=False)
    return vertices


def pagerank(edges: DataFrame, iters: int = 8, damping: float = 0.85,
             checkpoint_every: int = 3) -> DataFrame:
    """Undirected PageRank, fixed iteration count: ``(node, pr)`` with
    pr rounded to 6 dp and summing to ~1. The iterative driver loop runs
    ``iters`` rounds of one shuffle each (contributions grouped on the
    destination node); ``localCheckpoint`` every few rounds keeps the
    plan from growing linearly with iterations — same discipline as the
    Kleene fixpoint in the SPARQL compiler. Values are deterministic up
    to FP summation order (rankings are stable); exact cross-engine
    replay is not a goal for an iterative approximation."""
    und = undirect(edges)
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    und = und.join(deg, "src").localCheckpoint(eager=False)
    nodes = deg.select(F.col("src").alias("node"), "deg")
    n_nodes = nodes.count()
    base = (1.0 - damping) / n_nodes

    def send(ed, pr):
        return (ed.join(pr, ed.src == pr.node)
                .select(F.col("dst").alias("id"),
                        (F.col("pr") / F.col("deg")).alias("c")))

    # every node is an edge endpoint (degree >= 1) and all ranks stay
    # positive, so each node receives a contribution every round — no
    # isolated-node re-attach join is needed
    def merge(msgs):
        return (msgs.groupBy(F.col("id").alias("node"))
                .agg((F.lit(base) + F.lit(damping) * F.sum("c")).alias("pr")))

    pr = aggregate_messages(
        und, nodes.select("node", F.lit(1.0 / n_nodes).alias("pr")),
        send, merge, iters, checkpoint_every)
    return pr.select("node", F.round("pr", 6).alias("pr"))


def label_propagation(edges: DataFrame, iters: int = 3) -> DataFrame:
    """Synchronous label propagation (community detection): every node
    starts in its own community; each round, every node SIMULTANEOUSLY
    adopts the most frequent label among its neighbors (ties -> smallest
    label). Returns (id, community) after exactly ``iters`` rounds.

    The iteration count is FIXED by contract — not run to convergence —
    precisely so a SQL oracle can replay the rounds verbatim (the lesson
    from the near-dedup oracles: converged-vs-unrolled diverges on deep
    graphs). Per round: one shuffle to count (node, neighbor-label)
    pairs and one deterministic argmax window per node. LPA is the
    standard large-graph community baseline (GraphFrames ships the same
    fixed-iteration form)."""
    from pyspark.sql import Window as W

    # materialize the undirected edge list once: each round's send()
    # references it, so an un-checkpointed edge frame re-derives the
    # upstream edge generation (often a co-occurrence self-join) once
    # PER ROUND — same lineage-control idiom as pagerank above
    und = undirect(edges).localCheckpoint(eager=False)

    def send(ed, labels):
        # each neighbor's current community, re-keyed to the receiving node
        return (ed.join(labels.withColumnRenamed("id", "dst"), "dst")
                .select(F.col("src").alias("id"), "community"))

    # two-stage merge (count per label -> deterministic argmax) — the
    # shape a single-agg-expression Pregel API can't express and the
    # reason aggregate_messages hands merge() the raw message frame.
    # Every node in `und` has >= 1 neighbor, so the pick covers all ids.
    # The argmax is a struct-min AGGREGATION, not a row_number window:
    # min over (-count, community) is exactly "count desc, community asc"
    # but partial-aggregates map-side and stays splittable on hub nodes
    # (a window cannot partial-aggregate — the same skew hazard that
    # ruled out window-based degrees in kcore), and it drops the
    # window's per-round sort.
    def merge(msgs):
        nbr = (msgs.groupBy("id", "community")
               .agg(F.count(F.lit(1)).alias("__n")))
        pick = F.min(F.struct((-F.col("__n")).alias("__negn"),
                              F.col("community").alias("community")))
        return (nbr.groupBy("id").agg(pick.alias("__p"))
                .select("id", F.col("__p.community").alias("community")))

    init = (und.select(F.col("src").alias("id")).distinct()
            .withColumn("community", F.col("id")))
    return aggregate_messages(und, init, send, merge, iters,
                              checkpoint_every=1)


def kcore(edges: DataFrame, k: int = 3, rounds: int = 6,
          checkpoint_every: int = 2) -> DataFrame:
    """k-core decomposition by fixed-round peeling (Matula & Beck 1983):
    repeatedly delete nodes of degree < ``k`` (each deletion can push a
    neighbor under the threshold, cascading) until the surviving
    subgraph — the k-core — is stable. Returns ``(node, degree)`` over
    the edge set after ``rounds`` peels; with ``rounds`` at or above
    the cascade depth this IS the k-core (extra rounds are no-ops), and
    the SQL oracle replays the identical unrolled rounds either way.

    Scale shape: each round is one grouped degree count plus a
    semi-join of the (monotonically shrinking) edge list against the
    survivors — two linear shuffles, no pairwise blow-up anywhere.
    ``localCheckpoint`` every ``checkpoint_every`` rounds keeps the
    plan from growing with the iteration count, the same discipline as
    the Kleene fixpoint and PageRank loops. On a real cluster the loop
    maps 1:1 onto a Pregel/GraphFrames peel."""
    live = edges
    for i in range(rounds):
        deg = degree_stats(live)
        keep = deg.filter(F.col("degree") >= k).select("node")
        live = (live
                .join(keep.withColumnRenamed("node", "a"), "a")
                .join(keep.withColumnRenamed("node", "b"), "b")
                .select("a", "b"))
        if (i + 1) % checkpoint_every == 0 and i + 1 < rounds:
            live = live.localCheckpoint(eager=False)
    return degree_stats(live)
