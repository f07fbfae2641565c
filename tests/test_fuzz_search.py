"""Seeded random-differential fuzzer for the search family: random query
term sets (drawn from the corpus vocabulary, plus out-of-vocabulary terms)
run through Spark bm25_topk and the same parameterized DuckDB replay the
oracle uses — order-insensitive comparison, the oracle-gate idea made
combinatorial. Phrase search is fuzzed against a pure-Python sliding-window
reference on the collected corpus."""

import random

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"'{SF_DIR}/documents.parquet'")
    return c


@pytest.fixture(scope="module")
def vocab(spark):
    from otit_swt_spark.pipelines.textstats import vocab_topk

    return [r["term"] for r in
            vocab_topk(spark.read.parquet(f"{SF_DIR}/documents.parquet"),
                       n=40).collect()]


def test_bm25_random_queries_match_duckdb(spark, con, vocab):
    import __spark_entry__ as entry_mod
    from otit_swt_spark.pipelines.search import bm25_topk

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rng = random.Random(6)
    for trial in range(8):
        n_terms = rng.randint(1, 4)
        terms = rng.sample(vocab, n_terms)
        if trial % 3 == 2:
            terms.append(f"oov{trial}")         # absent term: zero postings
        query = " ".join(terms)
        k = rng.choice([5, 10, 25])
        got = sorted(
            (r["doc_id"], r["score"], r["rank"])
            for r in bm25_topk(docs, query, k=k).collect())
        sql = (f"WITH {entry_mod._bm25_ctes(tuple(terms))}"
               f' SELECT doc_id, score, CAST(row_number() OVER '
               f'(ORDER BY score DESC, doc_id) AS INT) AS rank '
               f"FROM bscored QUALIFY rank <= {k}")
        want = sorted(tuple(r) for r in con.execute(sql).fetchall())
        assert got == want, f"query={query!r} k={k}"


def test_phrase_search_random_vs_python_reference(spark, vocab):
    from otit_swt_spark.pipelines.search import phrase_search

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = {r["doc_id"]: (r["text"] or "").lower().strip().split()
              for r in docs.collect()}
    rng = random.Random(7)
    for _ in range(6):
        phrase_toks = rng.sample(vocab, rng.randint(2, 3))
        phrase = " ".join(phrase_toks)
        got = {r["doc_id"]: r["n_occurrences"]
               for r in phrase_search(docs, phrase).collect()}
        want = {}
        m = len(phrase_toks)
        for did, toks in corpus.items():
            n = sum(1 for i in range(len(toks) - m + 1)
                    if toks[i:i + m] == phrase_toks)
            if n:
                want[did] = n
        assert got == want, f"phrase={phrase!r}"


def test_unicode_and_edge_docs_differential(spark, con):
    """Unicode text (CJK, accents, emoji), empty and whitespace-only docs
    through BM25 + winnow + BPE against their DuckDB replays — character
    semantics (substr/len) must agree across engines, not byte
    semantics."""
    import duckdb

    import __spark_entry__ as entry_mod
    from otit_swt_spark.pipelines.dedup import winnow_fingerprints
    from otit_swt_spark.pipelines.search import bm25_topk
    from otit_swt_spark.pipelines.textstats import bpe_train

    rows_ = [(1, "héllo wörld héllo"),
             (2, "数据 处理 引擎 数据"),
             (3, "mixed 数据 text héllo"),
             (4, ""),
             (5, "   "),
             (6, "emoji 🚀 test 🚀 emoji")]
    docs = spark.createDataFrame(rows_, "doc_id long, text string")
    c = duckdb.connect()
    c.execute("CREATE TABLE documents AS SELECT * FROM (VALUES " +
              ", ".join(f"({i}, '{t}')" for i, t in rows_) +
              ") t(doc_id, text)")
    # BM25: unicode query term
    got = sorted((r["doc_id"], r["score"], r["rank"])
                 for r in bm25_topk(docs, "héllo 数据", k=10).collect())
    sql = (f"WITH {entry_mod._bm25_ctes(('héllo', '数据'))}"
           ' SELECT doc_id, score, CAST(row_number() OVER '
           '(ORDER BY score DESC, doc_id) AS INT) AS rank '
           "FROM bscored QUALIFY rank <= 10")
    want = sorted(tuple(r) for r in c.execute(sql).fetchall())
    assert got == want
    # winnow: same fingerprints both engines on the unicode corpus
    got_w = sorted((r["doc_id"], r["gram_pos"], r["fp"])
                   for r in winnow_fingerprints(docs, k=4, w=4).collect())
    want_w = sorted(tuple(r) for r in c.execute(
        entry_mod._winnow_fingerprints_oracle()).fetchall())
    assert got_w == want_w
    # BPE: character-level merges over multi-byte chars agree
    merges = bpe_train(docs, n_merges=3)
    want_m = [tuple(r) for r in c.execute(
        entry_mod._bpe_train_oracle(3)).fetchall()]
    assert [tuple(m) for m in merges] == want_m


def test_ssjoin_random_corpora_vs_python_reference(spark):
    """Random-differential losslessness proof for the prefix filter:
    random corpora (skewed token frequencies, duplicate sets, singleton
    tokens, empty-ish docs) at random thresholds, ssjoin_jaccard vs a
    pure-Python brute-force all-pairs reference."""
    import random

    from otit_swt_spark.pipelines.fuzzy import ssjoin_jaccard

    rng = random.Random(11)
    for trial in range(6):
        n_docs = rng.randint(10, 60)
        vocab_n = rng.randint(5, 30)
        vocab = [f"w{i}" for i in range(vocab_n)]
        # zipf-ish skew: low-index tokens much hotter
        rows = []
        for i in range(n_docs):
            sz = rng.randint(1, 12)
            toks = [vocab[min(int(rng.expovariate(0.35)), vocab_n - 1)]
                    for _ in range(sz)]
            rows.append((i, " ".join(toks)))
        if trial % 2:
            rows.append((n_docs, rows[0][1]))       # exact duplicate set
        tau = rng.choice([0.3, 0.5, 0.7, 0.9])
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {(r["id_a"], r["id_b"]): r["jaccard"]
               for r in ssjoin_jaccard(df, threshold=tau).collect()}
        sets = {i: set(t.split()) for i, t in rows if t.strip()}
        want = {}
        for a in sets:
            for b in sets:
                if a < b:
                    j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
                    if j >= tau:
                        want[(a, b)] = round(j, 6)
        assert got == want, f"trial={trial} tau={tau}"
