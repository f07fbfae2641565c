"""Engine — the hybrid query entry point.

Reference parity: ``Engine.execute_hybrid_query``
(hybrid/src/engine.rs:57-134, Python surface py_otit_swt_query/src/lib.rs).
The reference's eight lifecycle stages (parse, preprocess, static rewrite,
endpoint execution, TSQ completion, pushdown prep, TS execution, combine)
collapse to three here: parse -> compile to one DataFrame plan -> finalize
output types. Catalyst performs the optimizations the reference hand-rolls
(SURVEY §4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from otit_swt_spark.graph import GraphStore
from otit_swt_spark.sparql.compiler import Compiler, SolutionMapping
from otit_swt_spark.sparql.parser import parse_query
from otit_swt_spark.terms import XSD_STRING, spark_type_for_xsd
from otit_swt_spark.timeseries import TimeSeriesTable


class Engine:
    def __init__(self, spark: SparkSession, graph: GraphStore | DataFrame | None = None):
        self.spark = spark
        if isinstance(graph, DataFrame):
            graph = GraphStore(spark, graph)
        self.graph = graph or GraphStore(spark)
        self.ts_tables: list[TimeSeriesTable] = []
        #: datatype-probe results per query text — the probe is a Spark job
        #: (engine._finalize) and identical queries infer identical dtypes
        self._dt_cache: dict[str, dict[str, str | None]] = {}

    def set_graph(self, graph: GraphStore | DataFrame) -> "Engine":
        self.graph = GraphStore(self.spark, graph) if isinstance(graph, DataFrame) else graph
        return self

    def add_timeseries_table(self, table: TimeSeriesTable) -> "Engine":
        self.ts_tables.append(table)
        return self

    # -- entry point 1 (reference engine.rs:57-134) -------------------------

    def execute_hybrid_query(self, sparql: str) -> DataFrame:
        """Parse + compile + type-finalize. Returns a lazy DataFrame; the
        caller collects (the reference collects internally at engine.rs:127)."""
        query = parse_query(sparql)
        compiler = Compiler(self.spark, self.graph.df, self.ts_tables)
        sm = compiler.compile_query(query)
        return self._finalize(sm, query.variables, cache_key=sparql)

    def query(self, sparql: str) -> DataFrame:
        return self.execute_hybrid_query(sparql)

    def explain(self, sparql: str, mode: str = "formatted") -> str:
        """Return Spark's explain output for a SPARQL query — the rebuild's
        window into what the reference's rewrite stages became (pushdown,
        pruning, join selection are visible in the physical plan)."""
        df = self.execute_hybrid_query(sparql)
        return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), mode)

    def register_views(self, triples_view: str = "triples",
                       ts_view: str = "timeseries") -> "Engine":
        """Spark-first interop: expose the triple store and the (unioned)
        normalized time-series tables as temp views so users can mix
        ``spark.sql`` with engine queries on the same session."""
        self.graph.df.createOrReplaceTempView(triples_view)
        ts = None
        for t in self.ts_tables:
            n = t.normalized(self.spark)
            ts = n if ts is None else ts.unionByName(n)
        if ts is not None:
            ts.createOrReplaceTempView(ts_view)
        return self

    # -- entry point 3 (reference dsl/src/translator.rs via §3.3) -----------

    def execute_dsl_query(self, dsl: str, translator) -> DataFrame:
        """Path-DSL entry point: parse the ts query, translate to SPARQL
        (otit_swt_spark.dsl.Translator), execute as one DataFrame plan."""
        from otit_swt_spark.dsl import parse_ts_query

        return self.query(translator.translate(parse_ts_query(dsl)))

    def _finalize(self, sm: SolutionMapping, variables: list[str],
                  cache_key: str | None = None) -> DataFrame:
        """Type the output like the reference's dtype-inference over SPARQL
        JSON solutions (hybrid/src/sparql_result_to_polars.rs:119-160): for
        term columns, infer the datatype from the first non-null ``__dt`` and
        cast the canonical lexical form to the matching Spark type."""
        term_vars = [v for v in variables if sm.vars.get(v) and sm.vars[v].kind == "term"
                     and v in sm.dt_vars]
        dt_of: dict[str, str | None] = {}
        if term_vars and cache_key is not None and cache_key in self._dt_cache:
            dt_of = self._dt_cache[cache_key]
        elif term_vars:
            # probe only a prefix — datatype columns are constant per variable
            # in practice, and this avoids executing the full plan twice
            probe = (
                sm.df.select([F.col(f"{v}__dt").alias(v) for v in term_vars])
                .limit(100)
                .agg(*[F.first(F.col(v), ignorenulls=True).alias(v) for v in term_vars])
                .first()
            )
            if probe is not None:
                dt_of = probe.asDict()
            if cache_key is not None:
                self._dt_cache[cache_key] = dt_of
        cols = []
        for v in variables:
            m = sm.vars.get(v)
            if m is None:
                cols.append(F.lit(None).cast("string").alias(v))
            elif m.kind == "term" and dt_of.get(v) and dt_of[v] != XSD_STRING:
                cols.append(F.col(v).cast(spark_type_for_xsd(dt_of[v])).alias(v))
            else:
                cols.append(F.col(v).alias(v))
        return sm.df.select(*cols)
