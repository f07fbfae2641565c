"""Opt-in scale-stress smokes (set SPARK_GRAFT_SCALE_TESTS=1): the same
operators the oracle gate checks at sf0.1, run against synthetically
amplified inputs to catch quadratic blow-ups the small suites cannot —
duplicate-heavy LSH buckets, long per-key windows. Excluded from the
default run (minutes, not seconds)."""

import os

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SCALE_TESTS"),
    reason="scale smokes are opt-in (SPARK_GRAFT_SCALE_TESTS=1)")

SF_DIR = "/root/testdata/sf0.1"


def _amplify(df, times: int, id_col: str, id_shift: int):
    """Replicate a table `times`x with distinct ids — worst case for
    dedup (every row has `times` exact copies)."""
    out = df
    for i in range(1, times):
        out = out.unionByName(
            df.withColumn(id_col, F.col(id_col) + F.lit(i * id_shift)))
    return out


def test_minhash_dedup_survives_duplicate_heavy_corpus(spark):
    """100k docs, every one with 20 exact copies: the per-entry successor
    cap must keep pair counts linear (uncapped LSH would emit ~19M pairs
    from the duplicate buckets alone)."""
    from otit_swt_spark.pipelines.dedup import minhash_lsh_pairs

    docs = _amplify(spark.read.parquet(f"{SF_DIR}/documents.parquet")
                    .select("doc_id", "text"), 20, "doc_id", 1_000_000)
    n_docs = docs.count()
    assert n_docs == 100_000
    pairs = minhash_lsh_pairs(docs, k=64, bands=16, max_pairs_per_entry=8)
    n_pairs = pairs.count()
    # the cap bounds pairs at cap x bands per doc (128); observed ~14/doc.
    # Uncapped, the 20-copy buckets alone would emit ~19 pairs/doc from
    # exact duplicates plus quadratic near-dup bucket blow-ups.
    assert 0 < n_pairs <= n_docs * 8 * 16
    assert n_pairs < n_docs * 20  # linear with a small constant


def test_minhash_single_mega_bucket_linear(spark):
    """Worst case for LSH banding: ONE document duplicated 100k times, so
    every band has a single 100k-entry bucket. The lead()-window successor
    pairing must emit <= cap pairs per doc (never bucket², and never a
    100k-element array in one aggregation row)."""
    from otit_swt_spark.pipelines.dedup import minhash_lsh_pairs

    n = 100_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate page body repeated everywhere "
              "with enough words to shingle properly").alias("text"))
    pairs = minhash_lsh_pairs(docs, k=64, bands=16, max_pairs_per_entry=8)
    n_pairs = pairs.count()
    # identical docs -> identical band buckets -> the 16 bands produce the
    # SAME successor pairs; after dedup ~8 per doc, never quadratic
    assert 0 < n_pairs <= n * 8


def test_simhash_single_mega_bucket_linear(spark):
    """Worst case for SimHash chunk blocking: ONE document duplicated 50k
    times, so all four 16-bit chunk buckets hold the full corpus. The
    lead()-window successor pairing must emit <= cap pairs per doc per
    chunk (never bucket², and never a 50k-element collect_list array in a
    single aggregation row)."""
    from otit_swt_spark.pipelines.dedup import simhash_dedup_pairs

    n = 50_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate page body repeated everywhere "
              "with enough words to shingle properly").alias("text"))
    pairs = simhash_dedup_pairs(docs, max_pairs_per_entry=8)
    n_pairs = pairs.count()
    # identical docs -> identical simhash -> all 4 chunks produce the SAME
    # successor pairs; after dedup ~8 per doc, never quadratic
    assert 0 < n_pairs <= n * 8


def test_embedding_pair_generators_degenerate_single_bucket(spark):
    """All vectors point the same way -> every sign-sketch bit agrees ->
    one mega-bucket regardless of n_bits. The over-threshold salting must
    keep candidate pairs ~n*max_bucket (linear in the corpus), not n²."""
    from otit_swt_spark.pipelines.similarity import (
        all_pairs_topk_per_vector, embedding_neardup_pairs)

    n, dim = 20_000, 16
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.rand(seed=i) * 0.1 + 0.5).cast("float")
                  for i in range(dim)]).alias("embedding"))
    nd = embedding_neardup_pairs(emb, min_cosine=0.99, n_bits=6,
                                 max_bucket=100)
    pair_rows = nd.select("id_a", "id_b").collect()
    n_nd = len(pair_rows)
    assert 0 < n_nd <= n * 100  # bounded by n*max_bucket, not n²/2
    # the salted mega-bucket must still form ONE connected component
    # (cross-shard chain pairs): union-find over the emitted pairs
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pair_rows:
        parent[find(int(r["id_a"]))] = find(int(r["id_b"]))
    # one component PER SKETCH BUCKET (a couple of buckets exist under
    # the perturbation): without the cross-shard chain pairs this was
    # ~n/max_bucket components per bucket (one per salt shard)
    assert len({find(i) for i in range(n)}) <= 4
    g = all_pairs_topk_per_vector(emb, k=3, n_bits=6, max_bucket=100)
    counts = g.groupBy("src").count()
    assert counts.filter(F.col("count") > 3).count() == 0
    assert counts.count() > n * 0.9  # nearly every vector got neighbors


def test_sessionize_and_asof_on_amplified_events(spark):
    """1M events (10x sf0.1): the window-based operators stay one-shuffle
    and complete; session counts scale with the key space, not rows^2."""
    from otit_swt_spark.timeseries import asof_join, sessionize
    from otit_swt_spark.tpch_graph import load_events

    ev = _amplify(load_events(spark, SF_DIR)
                  .select("event_id", "user_id", "ts", "value", "event_type"),
                  10, "event_id", 10_000_000)
    assert ev.count() == 1_000_000
    sessions = (sessionize(ev, key="user_id", ts="ts", gap_seconds=600,
                           order_cols=["event_id"])
                .groupBy("user_id").agg(F.max("session_idx").alias("mx")))
    assert sessions.count() > 0
    right = ev.filter(F.col("event_type") == "purchase") \
        .groupBy("user_id", "ts").agg(F.max("value").alias("pv"))
    out = asof_join(ev.select("event_id", "user_id", "ts"), right,
                    on="user_id", left_ts="ts", right_ts="ts",
                    value_columns=["pv"])
    assert out.count() == 1_000_000  # left-join row preservation at scale


def test_sparql_engine_on_amplified_graph(spark):
    """~9M-triple KG (10x sf0.1): full BGP + filter + grouped aggregation
    through the engine completes with the same plan shape (pruned
    predicate scans, broadcast dims, one agg shuffle)."""
    from otit_swt_spark.engine import Engine
    from otit_swt_spark.graph import GraphStore
    from otit_swt_spark.tpch_graph import build_graph_df

    base = build_graph_df(spark, SF_DIR)
    amplified = base
    for i in range(1, 10):
        amplified = amplified.unionByName(
            base.withColumn("s", F.concat(F.lit(f"copy{i}:"), F.col("s"))))
    eng = Engine(spark, GraphStore(spark, amplified))
    df = eng.query("""
    SELECT ?priority (COUNT(?o) AS ?n) WHERE {
        ?o <urn:p:priority> ?priority .
        ?o <urn:p:totalprice> ?price .
        FILTER(?price > 100000.0)
    } GROUP BY ?priority""")
    rows = df.collect()
    assert len(rows) == 5  # five priorities
    assert all(r["n"] > 0 for r in rows)


def test_kleene_closure_on_long_chain(spark):
    """2000-hop chain: transitive closure has n(n+1)/2 ~ 2M pairs and must
    converge in ~log2(2000) = 11 doubling rounds, not 2000."""
    from otit_swt_spark.engine import Engine
    from otit_swt_spark.graph import GraphStore

    n = 2000
    edges = spark.range(n - 1).select(
        F.concat(F.lit("urn:n"), F.col("id")).alias("s"),
        F.lit("urn:p:next").alias("p"),
        F.concat(F.lit("urn:n"), F.col("id") + 1).alias("o_iri"),
        F.lit(None).cast("string").alias("o_lex"),
        F.lit(None).cast("string").alias("o_dt"),
        F.lit(None).cast("string").alias("o_lang"),
    )
    eng = Engine(spark, GraphStore(spark, edges))
    out = eng.query("SELECT ?x ?y WHERE { ?x <urn:p:next>+ ?y }")
    assert out.count() == n * (n - 1) // 2


def test_decontaminate_duplicate_heavy_corpus(spark):
    """100k-doc corpus vs 5k-doc benchmark: the benchmark gram set stays
    broadcast-size, the corpus side is map-side only, and the hit counting
    shuffles matching grams alone — must finish in seconds, not minutes."""
    from otit_swt_spark.pipelines.decontam import decontaminate

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    docs = _amplify(base, 20, "doc_id", 1_000_000)
    bench = base.limit(250)                 # every copy of these contaminates
    out = decontaminate(docs, bench, n=8)
    counts = dict(out.groupBy("contaminated").count().collect())
    assert counts.get(True, 0) >= 250 * 20  # all copies of bench docs flagged
    assert sum(counts.values()) == 100_000


def test_dedup_paragraphs_amplified(spark):
    """100k two-paragraph docs with 20x duplication: paragraph digests are
    duplicate-heavy (every paragraph has >= 20 copies) — the row_number
    window and the reassembly groupBy must both stay linear."""
    from otit_swt_spark.pipelines.dedup import dedup_paragraphs

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    docs = _amplify(base, 20, "doc_id", 1_000_000)
    two_para = docs.withColumn(
        "text", F.concat_ws("\n\n", "text", F.reverse("text")))
    out = dedup_paragraphs(two_para)
    assert out.count() == 100_000
    kept = out.agg(F.sum("n_kept")).collect()[0][0]
    total = out.agg(F.sum("n_paras")).collect()[0][0]
    assert kept < total / 10               # duplication actually collapsed


def test_resample_long_span_grid(spark):
    """1M-event resample: per-user grids spanning the full event range —
    the grid explode and the LOCF window stay linear per key."""
    from otit_swt_spark.tpch_graph import load_events
    from otit_swt_spark.timeseries import resample

    ev = load_events(spark, SF_DIR)
    out = resample(ev, key="user_id", ts="ts", value="value",
                   step_seconds=600.0, fill="locf")
    n = out.count()
    assert n > 0
    assert out.filter(F.col("value").isNull()).count() == 0


def test_lm_quality_amplified_corpus(spark):
    """100k-doc LM scoring: the model stays domain-bounded (<= 37^3) no
    matter the corpus size, and scoring is broadcast-join + one agg."""
    from otit_swt_spark.pipelines.lm_quality import score_docs, train_char_lm

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    docs = _amplify(base, 10, "doc_id", 1_000_000)
    model = train_char_lm(docs, n=3)
    assert model.count() <= 37 ** 3
    out = score_docs(docs, model, n=3)
    row = out.agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.col("lm_score").isNull().cast("int")).alias("nulls")
                  ).collect()[0]
    assert row["n"] == 50_000 and row["nulls"] == 0


def test_zorder_write_1m_events(spark, tmp_path):
    """1M-event z-ordered write: range shuffle + per-file sort only."""
    from otit_swt_spark.pipelines.layout import write_zordered
    from otit_swt_spark.tpch_graph import load_events

    ev = load_events(spark, SF_DIR).select("event_id", "user_id", "value")
    path = str(tmp_path / "zev")
    write_zordered(ev, path, ["user_id", "value"], n_files=32, bits=10)
    assert spark.read.parquet(path).count() == ev.count()


def test_funnel_and_retention_on_amplified_events(spark):
    """1.5M events (15× amplification): the funnel's chained per-user mins
    and the retention triangle must stay linear — no per-user arrays, no
    window over unbounded frames."""
    from otit_swt_spark.pipelines.analytics import funnel_steps, retention_cohorts

    ev = _amplify(spark.read.parquet(f"{SF_DIR}/events.parquet")
                  .select("user_id", "event_type", "ts"), 15,
                  "user_id", 1_000_000)
    assert ev.count() == 1_500_000
    fun = funnel_steps(ev, ["view", "click", "purchase"])
    n = fun.count()
    assert n > 0
    assert fun.filter(F.col("t3").isNotNull()
                      & ((F.col("t2") >= F.col("t3"))
                         | (F.col("t1") >= F.col("t2")))).count() == 0
    ret = retention_cohorts(ev)
    assert ret.filter(F.col("day_offset") < 0).count() == 0
    assert ret.count() > 0


def test_pack_sequences_many_shards_amplified(spark):
    """75k docs across 64 shards: per-shard cumsums parallelize; every
    shard's offsets must still be gapless."""
    from otit_swt_spark.pipelines.packing import pack_sequences

    docs = _amplify(spark.read.parquet(f"{SF_DIR}/documents.parquet")
                    .select("doc_id", "text"), 15, "doc_id", 1_000_000)
    out = pack_sequences(docs, budget=2048, n_shards=64)
    agg = (out.groupBy("shard")
           .agg(F.sum("n_tokens").alias("tok_sum"),
                F.max(F.col("token_offset") + F.col("n_tokens")).alias("end"))
           .filter(F.col("tok_sum") != F.col("end")))
    assert agg.count() == 0  # contiguous layout in every shard


def test_dup_ngram_spans_repetitive_corpus(spark):
    """Exact-substring span discovery against 50k docs where one 13-gram
    boilerplate footer appears in EVERY doc: the hot gram collapses in the
    map-side partial aggregate (one md5 key), so the skewed span must not
    blow up the shuffle. Also checks the hot span is actually found."""
    from otit_swt_spark.pipelines.dedup import duplicate_ngram_spans

    footer = " ".join(f"footer{i}" for i in range(13))
    docs = (_amplify(spark.read.parquet(f"{SF_DIR}/documents.parquet")
                     .select("doc_id", "text"), 10, "doc_id", 1_000_000)
            .withColumn("text", F.concat_ws(" ", F.col("text"),
                                            F.lit(footer))))
    n = docs.count()
    assert n == 50_000
    spans = duplicate_ngram_spans(docs, n=13, min_count=2)
    hot = spans.orderBy(F.desc("n_occurrences")).first()
    assert hot["n_docs"] == n  # the footer gram spans every doc


def test_cross_dedup_mega_bucket_linear(spark):
    """One reference doc duplicated 25k times against 25k identical train
    docs: every band bucket contains the full ref corpus. The per-bucket
    ref cap must keep the candidate join linear (uncapped it would emit
    25k x 25k pairs per band)."""
    from otit_swt_spark.pipelines.dedup import cross_corpus_neardup_flags

    base = spark.range(25_000)
    train = base.select((F.col("id") * 2).alias("doc_id"),
                        F.lit("the same boilerplate text repeated "
                              "across every single document").alias("text"))
    ref = base.select((F.col("id") * 2 + 1).alias("doc_id"),
                      F.lit("the same boilerplate text repeated "
                            "across every single document").alias("text"))
    out = cross_corpus_neardup_flags(train, ref, max_ref_per_bucket=4)
    rows = out.collect()
    # every train doc flagged, evidence list capped: <= 4 ref ids per
    # bucket x 16 bands candidates per doc
    assert len(rows) == 25_000
    assert all(r["max_agreement"] == 1.0 and r["n_candidates"] <= 64
               for r in rows)


def test_label_propagation_amplified_graph(spark):
    """LPA on the co-order graph of 6M lineitem rows (10x sf0.1): three
    synchronous rounds, each one count-shuffle + one per-node window —
    completes in bounded rounds regardless of graph size, labels cover
    every node."""
    from otit_swt_spark.pipelines.graphalgo import (cooccurrence_edges,
                                                    label_propagation)

    l = _amplify(spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
                 .select("l_orderkey", "l_partkey"), 10,
                 "l_orderkey", 100_000_000)
    edges = cooccurrence_edges(l, "l_orderkey", "l_partkey",
                               max_group_size=3)
    out = label_propagation(edges, iters=3)
    n_nodes = out.count()
    n_comms = out.select("community").distinct().count()
    assert n_nodes > 0 and 0 < n_comms <= n_nodes


def test_semantic_dedup_skewed_dominant_cluster(spark):
    """90% of 20k vectors land in ONE k-means cluster (a degenerate but
    realistic post-crawl embedding corpus): the sub-cell cap must keep the
    within-cluster pair join linear (~n*cell/2, not 0.9*n²/2 ≈ 160M
    pairs), while the id-successor chain still flags every identical
    vector after the cluster minimum."""
    from otit_swt_spark.pipelines.clustering import semantic_dedup

    n, n_dom = 20_000, 18_000
    dom = spark.range(n_dom).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(10.0), F.lit(0.0), F.lit(0.0)).alias("embedding"))
    rest = spark.range(n_dom, n).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(-10.0),
                (F.col("id") % 40).cast("double") / 2.0,
                -(F.col("id") % 7).cast("double")).alias("embedding"))
    out = semantic_dedup(dom.unionByName(rest), k=4, iters=1,
                         min_cosine=0.95, max_cell_size=512).cache()
    assert out.count() == n
    dom_rows = out.filter(F.col("vec_id") < n_dom)
    # identical dominant vectors: everyone except the cluster minimum is
    # a dup (chain pairs bridge the md5 cells)
    assert dom_rows.filter(F.col("is_dup")).count() == n_dom - 1
    assert dom_rows.filter(~F.col("is_dup")).select("vec_id").first()[0] == 0
    out.unpersist()


def test_cusum_single_mega_key(spark):
    """CUSUM on ONE key carrying 1M points: the running-minimum identity
    keeps it a pure two-window plan over a single partition — no
    applyInPandas state, no per-row Python — and the drift injected at
    the 80% mark alarms exactly there."""
    from otit_swt_spark.pipelines.analytics import cusum_changepoints

    n = 1_000_000
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.lit("megakey").alias("event_type"),
        F.col("id").cast("double").alias("ts"),
        (F.when(F.col("id") < 0.8 * n, (F.col("id") % 13).cast("double"))
         .otherwise(F.lit(200.0) + (F.col("id") % 13))).alias("value"))
    out = cusum_changepoints(ev, key="event_type", ts="ts", value="value",
                             slack=0.5, threshold=5.0).cache()
    assert out.count() == n
    first_alarm = out.filter(F.col("alarm")) \
        .agg(F.min("event_id")).first()[0]
    assert 0.8 * n <= first_alarm < 0.8 * n + 10
    out.unpersist()


def test_winnow_boilerplate_heavy_corpus(spark):
    """50k docs all carrying the same viral footer: every footer
    fingerprint is shared corpus-wide, and the cap-16 all-pairs plus
    rank-successor chains must keep shared-span pair volume linear
    (uncapped would be ~50k²/2 per hot fingerprint)."""
    from otit_swt_spark.pipelines.dedup import winnow_shared_spans

    n = 50_000
    footer = ("subscribe to our newsletter for updates terms of service "
              "privacy policy all rights reserved contact us today")
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("lead token "),
                 F.col("id").cast("string"), F.lit(" body word "),
                 (F.col("id") % 997).cast("string"), F.lit(" " + footer))
        .alias("text"))
    pairs = winnow_shared_spans(docs, k=4, w=4, min_shared=1)
    n_pairs = pairs.count()
    # ~12 hot footer fps x (120 capped pairs + n chain pairs) -> O(n)
    assert 0 < n_pairs <= 16 * n


def test_bm25_common_term_posting_list(spark):
    """A query term present in EVERY one of 200k docs: the score shuffle
    keys on doc id (uniform) and the top-k is distributed TakeOrdered —
    no global-window single partition, runtime bounded, ranking exact."""
    from otit_swt_spark.pipelines.search import bm25_topk

    n = 200_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("common filler words everywhere "),
                 F.when(F.col("id") % 1000 == 0,
                        F.lit("needle needle needle ")).otherwise(F.lit("")),
                 (F.col("id") % 50).cast("string")).alias("text"))
    out = bm25_topk(docs, "common needle", k=10).collect()
    assert len(out) == 10
    # docs carrying the rare term (higher idf, tf=3) dominate the top-k
    assert all(r["doc_id"] % 1000 == 0 for r in out)
    assert [r["rank"] for r in out] == list(range(1, 11))


def test_phrase_search_hot_phrase_corpus(spark):
    """Every one of 100k docs contains the query phrase: postings prune
    to the full corpus but the (doc, start) groupBy keys stay uniform —
    linear, with exact per-doc occurrence counts."""
    from otit_swt_spark.pipelines.search import phrase_search

    n = 100_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma hot pair filler "),
                 (F.col("id") % 97).cast("string"),
                 F.lit(" hot pair trailing")).alias("text"))
    out = phrase_search(docs, "hot pair")
    agg = out.agg(F.count("*").alias("docs"),
                  F.sum("n_occurrences").alias("occ")).first()
    assert agg["docs"] == n and agg["occ"] == 2 * n


def test_fuzzy_join_hot_gram_corpus(spark):
    """Adversarial blocking for the entity-resolution join: 100k distinct
    names drawn from a hex alphabet, so the q-gram domain collapses to
    <= 16^3 = 4096 DISTINCT grams and every single gram is hot (~25
    carriers each, far beyond toy corpora). The per-gram cap-64 must
    bound candidate volume at (distinct grams) x cap^2 regardless of
    corpus size — an uncapped blocker would emit ~100k^2/4096 * grams
    candidates. Two planted near-duplicates that sort below the cap must
    still be found (the stated recall contract)."""
    from otit_swt_spark.pipelines.fuzzy import fuzzy_self_pairs

    n = 100_000
    names = spark.range(n).select(
        F.concat(F.lit("x"), F.md5(F.col("id").cast("string")))
        .alias("name"))
    # planted pair at edit distance 1; '0...' sorts below every md5-hex
    # name under the per-gram cap's orderBy
    planted = spark.createDataFrame(
        [("000planteda",), ("000plantedb",)], "name string")
    pairs = fuzzy_self_pairs(names.unionByName(planted), "name",
                             max_distance=1, q=3, cap=64)
    rows = pairs.collect()
    # hot-gram bound: every candidate came through a <=64x64 gram block;
    # hex md5 names differ in >1 edit almost surely, so true matches are
    # ~just the planted pair — the assertion is boundedness + recall
    assert len(rows) < 4096 * 64 * 64 // 1000  # far below the hard cap
    assert any(r["name_a"] == "000planteda" and r["name_b"] == "000plantedb"
               for r in rows)


def test_bpe_train_giant_distinct_vocab(spark):
    """BPE training against a 2M-row DISTINCT-word table (every word
    unique, 16 hex chars): each round must stay ONE pair-count aggregate
    over the word table plus a map-side fold — the driver reads a single
    argmax row per round, independent of vocabulary size."""
    from otit_swt_spark.pipelines.textstats import bpe_train

    n = 2_000_000
    docs = spark.range(n).select(
        F.substring(F.md5(F.col("id").cast("string")), 1, 16).alias("text"))
    merges = bpe_train(docs, n_merges=3)
    assert len(merges) == 3
    # hex-pair frequencies: ~n*15 total adjacent pairs over a 256-pair
    # domain -> every argmax count is large and positive
    assert all(c > n // 256 for _, _, _, c in merges)
    steps = [s for s, _, _, _ in merges]
    assert steps == [0, 1, 2]


def test_hll_sketch_10m_keys(spark):
    """HLL register sketch at 10M distinct keys: state stays <= 2^10
    rows no matter the cardinality, and the deterministic md5 hashing
    gives a stable estimate within the ~3.2% design error."""
    from otit_swt_spark.pipelines.analytics import hll_estimate, hll_sketch

    n = 10_000_000
    keys = spark.range(n).select(F.col("id").alias("k"))
    sketch = hll_sketch(keys, "k")
    assert sketch.count() <= 1024
    est = hll_estimate(sketch).first()["estimate"]
    assert abs(est - n) / n < 0.05


def test_bloom_build_10m_keys(spark):
    """Bloom set-bit frame at 10M keys / 2^26 bits: the frame is bounded
    by the bit domain (never the key count), present keys always probe
    true (no false negatives), and the absent-key FPR tracks the
    (1 - e^{-kn/m})^k design bound (~4%)."""
    from otit_swt_spark.pipelines.analytics import bloom_build, bloom_probe

    n, m = 10_000_000, 1 << 26
    keys = spark.range(n).select(F.col("id").alias("k"))
    bloom = bloom_build(keys, "k", n_bits=m, k=5)
    n_bits_set = bloom.count()
    assert n_bits_set <= m
    present = spark.range(200).select(F.col("id").alias("k"))
    absent = spark.range(200).select((F.col("id") + n + 1).alias("k"))
    hits = bloom_probe(bloom, present, "k", n_bits=m, k=5)
    assert hits.filter(~F.col("maybe_present")).count() == 0
    fp = bloom_probe(bloom, absent, "k", n_bits=m, k=5) \
        .filter(F.col("maybe_present")).count()
    assert fp <= 30  # design FPR ~4% of 200 = 8; deterministic hashing


def test_ssjoin_distinct_sets_duplicate_mass(spark):
    """200k rows = 2000 distinct token sets x 100 identical copies each:
    the identical-copy mass (which would emit 100^2/2 pairs per set, ~10M
    total, under exact all-rows semantics) must collapse to ONE groupBy —
    the join then runs over 2000 representatives. Disjoint per-set
    vocabularies + 10 planted overlapping set pairs give an exactly-known
    result."""
    from otit_swt_spark.pipelines.fuzzy import ssjoin_distinct_sets

    # 2000 templates with disjoint vocab: "wA wB wC wD" per template t
    tmpl = F.concat_ws(
        " ",
        F.concat(F.lit("t"), F.col("t"), F.lit("a")),
        F.concat(F.lit("t"), F.col("t"), F.lit("b")),
        F.concat(F.lit("t"), F.col("t"), F.lit("c")),
        F.concat(F.lit("t"), F.col("t"), F.lit("d")))
    docs = (spark.range(200_000)
            .select(F.col("id").alias("doc_id"),
                    (F.col("id") % 2000).alias("t"))
            .select("doc_id", tmpl.alias("text")))
    # planted: 10 extra docs whose set shares 3 of 4 tokens with template
    # k (j = 3/5 = 0.6)
    planted = spark.range(10).select(
        (F.col("id") + 1_000_000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat(F.lit("t"), F.col("id"), F.lit("a")),
            F.concat(F.lit("t"), F.col("id"), F.lit("b")),
            F.concat(F.lit("t"), F.col("id"), F.lit("c")),
            F.lit("oddball")).alias("text"))
    pairs = ssjoin_distinct_sets(docs.unionByName(planted),
                                 threshold=0.6).collect()
    # exactly the 10 planted (template-rep, planted-doc) pairs — nothing
    # from the 100-copy duplicate mass, nothing across disjoint vocab
    assert len(pairs) == 10
    assert all(r["jaccard"] == 0.6 for r in pairs)
    assert all(r["id_b"] >= 1_000_000 and r["id_a"] < 2000 for r in pairs)


def test_theta_sketch_single_mega_group(spark):
    """1M distinct keys in ONE group: the salted two-phase top-k keeps
    every task's window bounded (k rows per salt cell), the merged
    sketch is exactly the global k minimum hashes, and the estimate
    lands within the KMV error band."""
    from otit_swt_spark.pipelines.analytics import theta_sketch
    from otit_swt_spark.pipelines.dedup import _md5_60

    n = 1_000_000
    df = spark.range(n).select(F.lit("all").alias("g"),
                               F.col("id").cast("string").alias("k"))
    sk = theta_sketch(df, "k", "g", k=256, salt=64).collect()
    assert len(sk) == 1
    row = sk[0]
    assert row["n_kept"] == 256
    # exact global 256 smallest hashes (top-k merge is a semilattice)
    want = [r["h"] for r in
            df.select(_md5_60(F.col("k")).alias("h"))
            .orderBy("h").limit(256).collect()]
    assert list(row["ks"]) == want
    assert abs(row["est"] - n) / n < 0.15


def test_assoc_rules_mega_basket_clip(spark):
    """One 20k-item bot basket next to 10k normal baskets: unclipped it
    alone would emit 4e8 pairs; with max_basket_size the stage stays
    linear and the rule stats are computed over the surviving baskets
    only (stated contract)."""
    from otit_swt_spark.pipelines.analytics import assoc_rules

    normal = spark.range(10_000).select(
        F.col("id").alias("b"), (F.col("id") % 50).alias("i1"))
    normal = normal.select("b", F.explode(F.array(
        F.col("i1"), F.col("i1") + 1)).alias("i"))
    mega = spark.range(20_000).select(F.lit(-1).alias("b"),
                                      F.col("id").alias("i"))
    df = normal.unionByName(mega)
    out = assoc_rules(df, "b", "i", min_pair=2, top=10,
                      max_basket_size=64).collect()
    assert len(out) == 10
    # every surviving rule comes from the normal baskets' {x, x+1} pairs
    for r in out:
        assert abs(r["antecedent"] - r["consequent"]) == 1
        # support uses the clipped basket total (10k), not 10k+1
        assert r["support"] == round(r["n_ab"] / 10_000, 6)


def test_percentile_rank_constant_value_degenerate(spark):
    """Worst case for the bucketed two-phase rank: EVERY row shares one
    value, so all 1.6M rows land in a single bucket and the per-bucket
    window degrades to the naive single-partition sort — the documented
    semantic floor. It must still finish and produce the exact
    deterministic ranks (ties broken by id)."""
    from otit_swt_spark.pipelines.analytics import percentile_rank

    ev = _amplify(spark.read.parquet(f"{SF_DIR}/events.parquet")
                  .select("event_id"), 16, "event_id", 10_000_000) \
        .withColumn("value", F.lit(42.0))
    n = ev.count()
    assert n == 1_600_000
    out = percentile_rank(ev, "value", "event_id")
    got = out.agg(F.min("pct_rank"), F.max("pct_rank"),
                  F.count(F.lit(1))).first()
    assert got[0] == 0.0 and got[1] == 1.0 and got[2] == n


def test_ks_two_sample_hot_value(spark):
    """KS with 99% of one group's mass on a single value: the per-value
    count frame collapses that mass into ONE row, so the cumulative pass
    is tiny regardless of row count — and the statistic is still exact."""
    from otit_swt_spark.pipelines.analytics import ks_two_sample

    a = spark.range(1_000_000).select(
        F.lit("a").alias("g"), F.lit(7.0).alias("v"))
    b = spark.range(1_000_000).select(
        F.lit("b").alias("g"),
        (F.col("id") % 1000).cast("double").alias("v"))
    r = ks_two_sample(a.unionByName(b), "v", "g", "a", "b").first()
    assert r["n_a"] == 1_000_000 and r["n_b"] == 1_000_000
    # F_a jumps 0 -> 1 at v=7; F_b(7) = 8/1000 -> D = 1 - 0.008
    assert r["ks"] == 0.992


def test_seq_patterns_single_mega_user(spark):
    """One user owns 1.6M events: the lead() window is per-user (one
    partition carries that user — Spark's windowed sort, not a shuffle
    explosion) and the n-gram aggregate output stays bounded by the
    event-type alphabet cubed."""
    from otit_swt_spark.pipelines.analytics import seq_patterns

    ev = _amplify(spark.read.parquet(f"{SF_DIR}/events.parquet")
                  .select("event_id", "ts", "event_type"), 16,
                  "event_id", 10_000_000) \
        .withColumn("user_id", F.lit(1))
    out = seq_patterns(ev, n=3, order_cols=["event_id"]).collect()
    assert 0 < len(out) <= 25
    assert all(r["support"] == 1 for r in out)


def test_pmi_mega_repeated_bigram(spark):
    """A 2-token document repeated 100k times: bigram and unigram frames
    stay one-row-per-distinct (counts absorb the mass map-side) and the
    planted pair dominates PMI."""
    from otit_swt_spark.pipelines.textstats import pmi_collocations

    docs = spark.range(100_000).select(
        F.col("id").alias("doc_id"), F.lit("foo bar").alias("text"))
    out = pmi_collocations(docs, min_count=5, top_n=5).collect()
    assert len(out) == 1
    assert (out[0]["a"], out[0]["b"]) == ("foo", "bar")
    assert out[0]["n_ab"] == 100_000


def test_quantile_sketch_single_mega_group(spark):
    """1M rows in ONE group (the hot-feed shape the streaming p99
    monitor sees): the salted two-phase bottom-k keeps every task's
    window bounded, the kept rows are exactly the global k smallest
    row hashes, and the sample quantiles land inside the k=1024
    sampling envelope of the true uniform quantiles."""
    from otit_swt_spark.pipelines.analytics import (
        quantile_estimate,
        quantile_sketch,
    )

    n = 1_000_000
    df = spark.range(n).select(
        F.lit("all").alias("g"), F.col("id").alias("rid"),
        # deterministic pseudo-uniform value in [0, 1)
        (F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(1_000_000))
         .cast("double") / F.lit(1_000_000.0)).alias("v"))
    sk = quantile_sketch(df, "v", "rid", "g", k=1024, salt=64)
    kept = sk.collect()
    assert len(kept) == 1024
    est = {r["p"]: r["q"] for r in
           quantile_estimate(sk, "g", probs=(0.5, 0.95, 0.99)).collect()}
    for p, q in est.items():
        assert abs(q - p) < 0.06, (p, q)


def test_media_phash_mega_duplicate_group(spark):
    """200k synthetic images where EVERY clip falls into one of only 24
    perceptual groups (8.3k-member duplicate buckets — far beyond any
    real corpus' duplicate-cluster size): the banding successor cap
    must keep emitted pair counts linear in rows, not quadratic in
    bucket size, and the map-side hash pass must stream through
    without collecting."""
    from otit_swt_spark.pipelines.dedup import hamming_banded_pairs
    from otit_swt_spark.pipelines.multimodal import (image_hashes,
                                                     synth_gray_bmp)

    docs = spark.range(0, 200_000).withColumnRenamed("id", "doc_id")
    h = image_hashes(synth_gray_bmp(docs))
    pairs = hamming_banded_pairs(h, id_col="media_id", fp_col="ahash",
                                 max_distance=3)
    n = pairs.count()
    # cap contract: <= 8 successors x 4 chunks per id
    assert 0 < n <= 200_000 * 32


def test_audio_phash_mega_duplicate_group(spark):
    """Same stress for the audio path: 120k WAV clips in 24 envelope
    groups; decode + hash ride the scan, pairs stay cap-bounded."""
    from otit_swt_spark.pipelines.dedup import hamming_banded_pairs
    from otit_swt_spark.pipelines.multimodal import (audio_hashes,
                                                     synth_pcm_wav)

    docs = spark.range(0, 120_000).withColumnRenamed("id", "doc_id")
    h = audio_hashes(synth_pcm_wav(docs))
    pairs = hamming_banded_pairs(h, id_col="media_id", fp_col="ahash",
                                 max_distance=3)
    n = pairs.count()
    assert 0 < n <= 120_000 * 32


def test_bloom_word_map_probe_at_crawl_ledger_scale(spark):
    """The stateless frontier probe at a REAL crawl-ledger size: a
    2^26-bit Bloom (the scale where the bit-frame shuffle-join path of
    bloom_probe is mandatory and a forced broadcast OOMed the driver —
    see bloom_probe's comment) packs into <= 2^26/63 word rows, the
    one-row map broadcasts (~8 MB, inside executor budgets), and a 1M-
    key probe stays a single map-side pass with NO false negatives."""
    from pyspark.sql import functions as F

    from otit_swt_spark.pipelines.analytics import (bloom_build,
                                                    bloom_unseen_flags,
                                                    bloom_word_map)

    n_bits = 1 << 26
    seen = spark.range(0, 2_000_000).select(
        F.concat(F.lit("http://x.com/"), F.col("id").cast("string"))
        .alias("url"))
    bloom = bloom_build(seen, "url", n_bits=n_bits, k=5)
    words = bloom_word_map(bloom, n_bits=n_bits)
    probes = spark.range(1_000_000, 3_000_000).select(
        F.concat(F.lit("http://x.com/"), F.col("id").cast("string"))
        .alias("url"))
    flags = bloom_unseen_flags(probes, words, "url", n_bits=n_bits, k=5)
    # every seen key must flag maybe_present (no false negatives);
    # unseen keys may rarely false-positive — count, don't enumerate
    agg = flags.select(
        F.sum(F.when((F.col("url").substr(14, 10).cast("long")
                      < 2_000_000) & ~F.col("maybe_present"), 1)
              .otherwise(0)).alias("false_neg"),
        F.sum(F.when((F.col("url").substr(14, 10).cast("long")
                      >= 2_000_000) & F.col("maybe_present"), 1)
              .otherwise(0)).alias("false_pos"),
        F.count(F.lit(1)).alias("n")).first()
    assert agg["n"] == 2_000_000
    assert agg["false_neg"] == 0
    # 2M keys in 2^26 bits, k=5: fp rate ~ (1-e^-0.149)^5 ~ 5e-5
    assert agg["false_pos"] < 2_000
