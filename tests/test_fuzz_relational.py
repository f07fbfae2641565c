"""Seeded random-differential fuzzer for the relational operator surface:
random (filter-conjunction, group-keys, aggregates) specs are executed both
as a Spark DataFrame plan and as generated SQL on DuckDB, then compared
order-insensitively — the same differential idea as the oracle gate, but
combinatorial instead of hand-written (test-strategy parity with the
reference's randomized mapper suites, SURVEY §5)."""

import random

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
DEC = "decimal(25,6)"

# (spark_lambda, sql_text) filter atoms over lineitem
_FILTERS = [
    (lambda F, t, d: F.col("l_quantity") > t % 50,
     lambda t, d: f"l_quantity > {t % 50}"),
    (lambda F, t, d: F.col("l_discount") <= round(t % 0.1, 3),
     lambda t, d: f"l_discount <= {round(t % 0.1, 3)}"),
    (lambda F, t, d: F.col("l_shipdate") >= "1996-01-01",
     lambda t, d: "l_shipdate >= TIMESTAMP '1996-01-01'"),
    (lambda F, t, d: F.col("l_returnflag") == "R",
     lambda t, d: "l_returnflag = 'R'"),
    (lambda F, t, d: F.col("l_linenumber") != d,
     lambda t, d: f"l_linenumber != {d}"),
    (lambda F, t, d: F.col("l_tax") * 2 < round(t % 0.2, 3),
     lambda t, d: f"l_tax * 2 < {round(t % 0.2, 3)}"),
]

_GROUP_KEYS = ["l_returnflag", "l_linestatus", "l_linenumber"]


def _aggs(F):
    return [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
        F.round(F.min("l_extendedprice"), 6).alias("min_price"),
        F.round(F.max("l_tax"), 6).alias("max_tax"),
    ]


_AGG_SQL = """
    count(*) AS n,
    CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
    round(min(l_extendedprice), 6) AS min_price,
    round(max(l_tax), 6) AS max_tax
"""


def _norm(cols, rows):
    import math

    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.9g}"
        return str(v)

    return sorted(cols), sorted(tuple(cell(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("seed", range(20))
def test_random_filter_group_agg_matches_duckdb(spark, seed):
    from pyspark.sql import functions as F

    rng = random.Random(1000 + seed)
    n_filters = rng.randint(1, 3)
    picks = rng.sample(range(len(_FILTERS)), n_filters)
    t = round(rng.uniform(0, 100), 3)
    d = rng.randint(1, 7)
    keys = rng.sample(_GROUP_KEYS, rng.randint(1, len(_GROUP_KEYS)))

    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    cond = None
    sql_conds = []
    for i in picks:
        c = _FILTERS[i][0](F, t, d)
        cond = c if cond is None else (cond & c)
        sql_conds.append(_FILTERS[i][1](t, d))
    out = df.filter(cond).groupBy(*keys).agg(*_aggs(F))
    s_cols, s_rows = _norm(out.columns, [tuple(r) for r in out.collect()])

    con = duckdb.connect()
    res = con.execute(f"""
        SELECT {', '.join(keys)}, {_AGG_SQL}
        FROM '{SF_DIR}/lineitem.parquet'
        WHERE {' AND '.join(sql_conds)}
        GROUP BY {', '.join(str(i + 1) for i in range(len(keys)))}
    """)
    d_cols = [c[0] for c in res.description]
    d_cols_n, d_rows = _norm(d_cols, res.fetchall())
    assert s_cols == d_cols_n
    assert s_rows == d_rows, f"seed {seed}: diff {s_rows[:2]} vs {d_rows[:2]}"


_JOIN_TYPES = [("inner", "JOIN"), ("left", "LEFT JOIN")]


@pytest.mark.parametrize("seed", range(12))
def test_random_join_shapes_match_duckdb(spark, seed):
    """Random two-table join specs (orders ⋈ customer), random join type,
    filters on either side, grouped rollup on top — Spark vs DuckDB."""
    from pyspark.sql import functions as F

    rng = random.Random(2000 + seed)
    how, sql_join = _JOIN_TYPES[rng.randrange(len(_JOIN_TYPES))]
    bal = round(rng.uniform(-500, 5000), 2)
    price = round(rng.uniform(0, 200000), 2)
    seg = rng.choice(["BUILDING", "MACHINERY", "AUTOMOBILE"])

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet") \
        .filter(F.col("o_totalprice") > price)
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet") \
        .filter((F.col("c_acctbal") > bal) & (F.col("c_mktsegment") == seg))
    out = (o.join(c, o.o_custkey == c.c_custkey, how)
           .groupBy("o_orderpriority")
           .agg(F.count(F.lit(1)).alias("n"),
                F.count("c_custkey").alias("n_matched"),
                F.sum(F.col("o_totalprice").cast(DEC)).cast("double")
                .alias("sum_price")))
    s_cols, s_rows = _norm(out.columns, [tuple(r) for r in out.collect()])

    con = duckdb.connect()
    res = con.execute(f"""
        SELECT o_orderpriority, count(*) AS n,
               count(c_custkey) AS n_matched,
               CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price
        FROM (SELECT * FROM '{SF_DIR}/orders.parquet'
              WHERE o_totalprice > {price}) o
        {sql_join} (SELECT * FROM '{SF_DIR}/customer.parquet'
              WHERE c_acctbal > {bal} AND c_mktsegment = '{seg}') c
          ON o.o_custkey = c.c_custkey
        GROUP BY 1
    """)
    d_cols = [x[0] for x in res.description]
    d_cols_n, d_rows = _norm(d_cols, res.fetchall())
    assert s_cols == d_cols_n
    assert s_rows == d_rows, f"seed {seed} ({how})"


@pytest.mark.parametrize("seed", range(10))
def test_random_semi_anti_shapes_match_duckdb(spark, seed):
    """Random EXISTS / NOT-EXISTS specs (orders probed by a filtered
    lineitem subquery — the Q4/Q21/Q22 pattern family): Spark left_semi /
    left_anti vs DuckDB correlated (NOT) EXISTS, grouped counts on top."""
    from pyspark.sql import functions as F

    rng = random.Random(3000 + seed)
    anti = rng.random() < 0.5
    qty = rng.randint(5, 45)
    flag = rng.choice(["R", "N", "A"])
    how = "left_anti" if anti else "left_semi"
    exists = "NOT EXISTS" if anti else "EXISTS"

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    l = (spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
         .filter((F.col("l_quantity") > qty)
                 & (F.col("l_returnflag") == flag))
         .select("l_orderkey"))
    out = (o.join(l, o.o_orderkey == l.l_orderkey, how)
           .groupBy("o_orderstatus")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.col("o_totalprice").cast(DEC)).cast("double")
                .alias("sum_price")))
    s_cols, s_rows = _norm(out.columns, [tuple(r) for r in out.collect()])

    con = duckdb.connect()
    res = con.execute(f"""
        SELECT o_orderstatus, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price
        FROM '{SF_DIR}/orders.parquet' o
        WHERE {exists} (SELECT 1 FROM '{SF_DIR}/lineitem.parquet' l
                        WHERE l.l_orderkey = o.o_orderkey
                          AND l.l_quantity > {qty}
                          AND l.l_returnflag = '{flag}')
        GROUP BY 1
    """)
    d_cols = [x[0] for x in res.description]
    d_cols_n, d_rows = _norm(d_cols, res.fetchall())
    assert s_cols == d_cols_n
    assert s_rows == d_rows, f"seed {seed} ({how})"


@pytest.mark.parametrize("seed", range(4))
def test_random_token_budget_matches_duckdb(spark, seed):
    """Differential fuzz for the bucketed two-phase token-budget selection:
    random sizes/scores/budgets/bucket-counts vs the naive global-window
    SQL on DuckDB. Exercises the degenerate single-bucket case, ties on
    score (broken by id), zero-token docs, and budgets at both extremes."""
    from pyspark.sql import functions as F

    from otit_swt_spark.pipelines.sampling import token_budget_select

    rng = random.Random(seed)
    rows_in = [(i, " ".join(["w"] * rng.randint(0, 20)), rng.randint(0, 50))
               for i in range(rng.randint(1, 120))]
    budget = rng.choice([0, 1, 10, 100, 1000])
    n_buckets = rng.choice([1, 2, 7, 64])
    df = spark.createDataFrame(rows_in, "doc_id long, text string, score long")
    got = sorted((r["doc_id"], r["n_tok"]) for r in
                 token_budget_select(df, budget, F.col("score"),
                                     n_buckets=n_buckets).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR, score BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows_in)
    want = sorted((int(a), int(b)) for a, b in con.execute(rf"""
        WITH c AS (
            SELECT doc_id,
                   len(regexp_extract_all(text, '\S+', 0)) AS n_tok,
                   coalesce(sum(len(regexp_extract_all(text, '\S+', 0)))
                            OVER (ORDER BY score DESC, doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING), 0) AS before
            FROM t)
        SELECT doc_id, n_tok FROM c WHERE before < {budget}
    """).fetchall())
    assert got == want


@pytest.mark.parametrize("seed", range(4))
def test_random_preference_pairs_match_duckdb(spark, seed):
    """Differential fuzz for the struct-max argmax/argmin pairing:
    random groups/scores (with heavy ties) vs DuckDB's double
    row_number ranking — the tie-break contract (chosen: highest id
    among max scores; rejected: lowest id among min scores) must agree
    exactly."""
    from pyspark.sql import functions as F

    from otit_swt_spark.pipelines.sampling import preference_pairs

    rng = random.Random(100 + seed)
    rows_in = [(i, f"g{rng.randint(0, 6)}", rng.randint(0, 4))
               for i in range(rng.randint(1, 150))]
    df = spark.createDataFrame(rows_in, "doc_id long, g string, s long")
    got = sorted(map(tuple, preference_pairs(df, ["g"], F.col("s"))
                     .select("g", "chosen_id", "rejected_id", "margin")
                     .collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, g VARCHAR, s BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows_in)
    want = sorted((g, int(c), int(r), int(m)) for g, c, r, m in con.execute("""
        WITH r AS (
            SELECT g, doc_id, s,
                   row_number() OVER (PARTITION BY g
                                      ORDER BY s DESC, doc_id DESC) AS rb,
                   row_number() OVER (PARTITION BY g
                                      ORDER BY s ASC, doc_id ASC) AS rw
            FROM t)
        SELECT b.g, b.doc_id, w.doc_id, b.s - w.s
        FROM (SELECT * FROM r WHERE rb = 1) b
        JOIN (SELECT * FROM r WHERE rw = 1) w USING (g)
        WHERE b.s > w.s
    """).fetchall())
    assert got == want
