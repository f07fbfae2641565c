"""Arrow Flight (SQL) source.

Reference parity: hybrid/src/timeseries_database/arrow_flight_sql_database.rs
:121-230 — the reference authenticates, sends the SQL text as a CMD
FlightDescriptor, calls get_flight_info, then do_get(ticket) per endpoint and
stacks the record batches into one DataFrame on a single node.

Spark-first restructuring: only ``get_flight_info`` runs on the driver. The
returned endpoints (ticket + locations) are parallelized into a DataFrame and
each EXECUTOR opens its own FlightClient and streams its ticket's batches via
``mapInPandas`` — a Flight server that shards a big result across N endpoints
scales the fetch across the cluster instead of bottlenecking the driver.
A driver-side fallback (``distributed=False``) collects batches in-process
for small results / servers that hand out a single endpoint.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

from otit_swt_spark.timeseries import TimeSeriesTable


def _require_flight():
    try:
        import pyarrow.flight as flight  # noqa: F401

        return flight
    except ImportError as e:  # pragma: no cover - env always has pyarrow
        raise ImportError(
            "pyarrow.flight is required for the Arrow Flight source") from e


def _call_options(flight, username: str | None, password: str | None,
                  client=None):
    """Bearer-token call options from a basic-auth handshake (the
    reference's authenticate() + per-call auth header)."""
    if username is None or client is None:
        return None
    pair = client.authenticate_basic_token(username, password or "")
    return flight.FlightCallOptions(headers=[pair])


def flight_sql_read(
    spark: SparkSession,
    location: str,
    query: str,
    *,
    username: str | None = None,
    password: str | None = None,
    distributed: bool = True,
) -> DataFrame:
    """Execute ``query`` against an Arrow Flight SQL endpoint and return the
    result as a Spark DataFrame.

    ``location`` is a Flight URI (``grpc://host:port``). The SQL text is
    sent as a CMD FlightDescriptor exactly like the reference (it notes the
    same workaround: Dremio-style servers accept the raw query bytes where
    the spec says CommandStatementQuery). Endpoint fan-out is executed on
    the cluster when ``distributed`` (default)."""
    flight = _require_flight()
    from pyspark.sql.pandas.types import from_arrow_schema

    client = flight.FlightClient(location)
    opts = _call_options(flight, username, password, client)
    descriptor = flight.FlightDescriptor.for_command(query.encode("utf-8"))
    info = client.get_flight_info(descriptor, opts) if opts is not None \
        else client.get_flight_info(descriptor)
    spark_schema = from_arrow_schema(info.schema)

    endpoints = [
        (ep.ticket.ticket,
         [loc.uri.decode() if isinstance(loc.uri, bytes) else str(loc.uri)
          for loc in ep.locations] or [location])
        for ep in info.endpoints
    ]

    if not distributed:
        import pyarrow as pa

        tables = []
        for ticket_bytes, locs in endpoints:
            c = flight.FlightClient(locs[0])
            o = _call_options(flight, username, password, c)
            reader = c.do_get(flight.Ticket(ticket_bytes), o) if o is not None \
                else c.do_get(flight.Ticket(ticket_bytes))
            tables.append(reader.read_all())
        merged = pa.concat_tables(tables) if tables else info.schema.empty_table()
        return spark.createDataFrame(merged.to_pandas(), schema=spark_schema)

    # distributed fetch: one row per endpoint, executors stream their ticket
    ep_df = spark.createDataFrame(
        [(t, locs) for t, locs in endpoints],
        "ticket binary, locations array<string>",
    ).repartition(max(len(endpoints), 1))
    creds = (username, password)

    def fetch(batches: Iterator) -> Iterator:
        import pyarrow.flight as fl

        for pdf in batches:
            for _, row in pdf.iterrows():
                c = fl.FlightClient(row["locations"][0])
                o = _call_options(fl, creds[0], creds[1], c)
                ticket = fl.Ticket(bytes(row["ticket"]))
                reader = c.do_get(ticket, o) if o is not None else c.do_get(ticket)
                for chunk in reader:
                    yield chunk.data.to_pandas()

    return ep_df.mapInPandas(fetch, schema=spark_schema)


def _sql_str_literal(v) -> str:
    return "'" + str(v).replace("'", "''") + "'"


def _sql_ts_literal(dtv) -> str:
    """Render a Python datetime as an ANSI/PostgreSQL timestamp literal.
    tz-aware values are normalized to UTC and rendered naive — the same
    UTC convention the engine's session and the partition-prune rewrite
    use, and what Dremio-style stores expect for TIMESTAMP columns."""
    import datetime as _dt

    if dtv.tzinfo is not None:
        dtv = dtv.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return "TIMESTAMP " + _sql_str_literal(dtv.isoformat(sep=" "))


def render_restricted_sql(
    base_query: str,
    *,
    identifier_column: str,
    timestamp_column: str,
    value_column: str = "value",
    ids: list[str] | None = None,
    ts_lower=None,
    ts_upper=None,
    value_eq=None,
) -> str:
    """Render the composed time-series restriction into PostgreSQL-dialect
    SQL executed BY the external store, wrapping the user's registered
    query as a derived table.

    Reference parity: timeseries_sql_rewrite.rs:115-205 (create_query —
    external-id IN-list + timestamp bounds + value conditions rendered
    with sea-query's PostgresQueryBuilder) as executed through
    arrow_flight_sql_database.rs:121-230. Against a remote 100 TB TSDB
    this is THE fetch lever: the store sends only the series and window
    the query touches instead of the whole registered result set.

    Identifiers are double-quoted (PG dialect), string literals
    single-quote-escaped; bounds are INCLUSIVE supersets (strict bounds
    are relaxed by the caller) because every constraint is re-applied
    Spark-side — the rendered WHERE only has to be implied-by, never
    equivalent-to, the query's filters."""
    conds: list[str] = []
    qid = '"' + identifier_column.replace('"', '""') + '"'
    qts = '"' + timestamp_column.replace('"', '""') + '"'
    qval = '"' + value_column.replace('"', '""') + '"'
    if ids is not None:
        in_list = ", ".join(_sql_str_literal(i) for i in sorted(ids))
        conds.append(f"{qid} IN ({in_list})" if in_list else "1 = 0")
    if ts_lower is not None:
        conds.append(f"{qts} >= {_sql_ts_literal(ts_lower)}")
    if ts_upper is not None:
        conds.append(f"{qts} <= {_sql_ts_literal(ts_upper)}")
    if value_eq is not None:
        if isinstance(value_eq, bool):
            conds.append(f"{qval} = {'TRUE' if value_eq else 'FALSE'}")
        elif isinstance(value_eq, (int, float)):
            conds.append(f"{qval} = {value_eq!r}")
        else:
            conds.append(f"{qval} = {_sql_str_literal(value_eq)}")
    if not conds:
        return base_query
    return (f"SELECT * FROM ({base_query}) ts_pushdown "
            f"WHERE {' AND '.join(conds)}")


def render_grouped_sql(
    base_query: str,
    *,
    identifier_column: str,
    timestamp_column: str,
    value_column: str = "value",
    granule: tuple = ("all",),
    ids: list[str] | None = None,
    ts_lower=None,
    ts_upper=None,
    agg_cast: str = "DOUBLE",
    value_aggs: bool = True,
) -> str:
    """Render the reference's GroupedTimeSeriesQuery
    (timeseries_sql_rewrite.rs:470-560 create_grouped_query, decided by
    preparing/graph_patterns/group_pattern.rs:18-105) as a remote
    PARTIAL aggregation: the store groups by (id, time granule) and
    returns COUNT/SUM/MIN/MAX partials plus each group's MIN(timestamp)
    as a representative instant — Spark recomputes the exact grouping
    keys from the representative and re-aggregates, so the remote
    grouping only has to REFINE the query's granularity, never replicate
    its expression semantics. Against a remote 100 TB TSDB this is THE
    downsampling lever: a 10-minute AVG over a year fetches ~52k rows
    per series instead of every point.

    Unlike render_restricted_sql's implied-by bounds, ``ts_lower`` /
    ``ts_upper`` arrive as ``(value, strict)`` pairs and render EXACTLY:
    a relaxed bound would fold out-of-window boundary points into
    surviving groups' partials, which no Spark-side re-filter could
    undo.

    granule: ``("all",)`` — one row per id; ``("bucket", K)`` —
    FLOOR(epoch/K) tumbling buckets (K whole seconds, epoch-aligned like
    the engine's DateTimeAsSeconds bucketing); ``("trunc", unit)`` —
    DATE_TRUNC calendar buckets. All forms are plain ANSI/PostgreSQL
    SQL a Dremio/DuckDB/PG-dialect Flight store executes as-is."""
    qid = '"' + identifier_column.replace('"', '""') + '"'
    qts = '"' + timestamp_column.replace('"', '""') + '"'
    qval = '"' + value_column.replace('"', '""') + '"'
    conds: list[str] = []
    if ids is not None:
        in_list = ", ".join(_sql_str_literal(i) for i in sorted(ids))
        conds.append(f"{qid} IN ({in_list})" if in_list else "1 = 0")
    if ts_lower is not None:
        v, strict = ts_lower
        conds.append(f"{qts} {'>' if strict else '>='} {_sql_ts_literal(v)}")
    if ts_upper is not None:
        v, strict = ts_upper
        conds.append(f"{qts} {'<' if strict else '<='} {_sql_ts_literal(v)}")
    keys = [qid]
    if granule[0] == "bucket":
        keys.append(f"FLOOR(EXTRACT(EPOCH FROM {qts}) / {int(granule[1])})")
    elif granule[0] == "trunc":
        unit = str(granule[1])
        if unit not in ("year", "month", "day", "hour", "minute", "second"):
            raise ValueError(f"unsupported granule unit {unit!r}")
        keys.append(f"DATE_TRUNC('{unit}', {qts})")
    elif granule[0] != "all":
        raise ValueError(f"unsupported granule {granule!r}")
    where = f" WHERE {' AND '.join(conds)}" if conds else ""
    # a count-only query (COUNT(*)/COUNT(v), incl. value-less chains)
    # must not render SUM/MIN/MAX casts — against a VARCHAR value
    # column those would hard-error remotely for no benefit
    if value_aggs:
        val_cols = (f'CAST(SUM({qval}) AS {agg_cast}) AS "__gp_sum", '
                    f'CAST(MIN({qval}) AS {agg_cast}) AS "__gp_min", '
                    f'CAST(MAX({qval}) AS {agg_cast}) AS "__gp_max"')
    else:
        val_cols = (f'CAST(NULL AS {agg_cast}) AS "__gp_sum", '
                    f'CAST(NULL AS {agg_cast}) AS "__gp_min", '
                    f'CAST(NULL AS {agg_cast}) AS "__gp_max"')
    return (
        f"SELECT {qid}, MIN({qts}) AS {qts}, "
        f'CAST(COUNT(*) AS BIGINT) AS "__gp_cnt", '
        f'CAST(COUNT({qval}) AS BIGINT) AS "__gp_n", '
        f"{val_cols} "
        f"FROM ({base_query}) ts_pushdown{where} "
        f"GROUP BY {', '.join(keys)}")


def render_grouped_probe_sql(
    base_query: str,
    *,
    identifier_column: str,
    timestamp_column: str,
    granule: tuple,
    ids: list[str] | None = None,
    ts_lower=None,
    ts_upper=None,
) -> str:
    """One-row cost probe for the grouped pushdown: how many points does
    the restricted window hold, and how many (id, granule) groups would
    the grouped form return? Rendered over the IDENTICAL restriction and
    grouping keys as :func:`render_grouped_sql` (same bounds strictness,
    same bucket arithmetic), so the comparison is exact. Plain ANSI SQL —
    the same dialect envelope as the grouped query itself."""
    qid = '"' + identifier_column.replace('"', '""') + '"'
    qts = '"' + timestamp_column.replace('"', '""') + '"'
    conds: list[str] = []
    if ids is not None:
        in_list = ", ".join(_sql_str_literal(i) for i in sorted(ids))
        conds.append(f"{qid} IN ({in_list})" if in_list else "1 = 0")
    if ts_lower is not None:
        v, strict = ts_lower
        conds.append(f"{qts} {'>' if strict else '>='} {_sql_ts_literal(v)}")
    if ts_upper is not None:
        v, strict = ts_upper
        conds.append(f"{qts} {'<' if strict else '<='} {_sql_ts_literal(v)}")
    keys = [qid]
    if granule[0] == "bucket":
        keys.append(f"FLOOR(EXTRACT(EPOCH FROM {qts}) / {int(granule[1])})")
    elif granule[0] == "trunc":
        unit = str(granule[1])
        if unit not in ("year", "month", "day", "hour", "minute", "second"):
            raise ValueError(f"unsupported granule unit {unit!r}")
        keys.append(f"DATE_TRUNC('{unit}', {qts})")
    elif granule[0] != "all":
        raise ValueError(f"unsupported granule {granule!r}")
    where = f" WHERE {' AND '.join(conds)}" if conds else ""
    return (
        'SELECT CAST(COALESCE(SUM("__pp_cnt"), 0) AS BIGINT) AS "__pts", '
        'CAST(COUNT(*) AS BIGINT) AS "__bkts" FROM ('
        f'SELECT COUNT(*) AS "__pp_cnt" '
        f"FROM ({base_query}) ts_pushdown{where} "
        f"GROUP BY {', '.join(keys)}) ts_probe")


def render_sync_grouped_sql(
    base_query: str,
    *,
    identifier_column: str,
    timestamp_column: str,
    value_column: str = "value",
    n_chains: int,
    value_aggs: list[bool],
    granule: tuple = ("all",),
    id_tuples: list[tuple] | None = None,
    ts_lower=None,
    ts_upper=None,
    agg_cast: str = "DOUBLE",
) -> str:
    """Render the SYNCHRONIZED grouped pushdown: the store inner-joins
    the registered relation against itself on the timestamp (the
    reference's inner_join_selects, timeseries_sql_rewrite.rs:356-428),
    pins the chain identities to the (id_1..id_n) tuples the static
    side binds — a row-value IN list, PostgreSQL/DuckDB dialect — and
    aggregates per-chain COUNT/SUM/MIN/MAX partials per (tuple,
    granule) exactly like render_grouped_sql. COUNT(*) counts JOINED
    rows, so duplicate timestamps multiply precisely as the engine's
    Spark-side synchronized join multiplies them."""
    if n_chains < 2:
        raise ValueError("sync grouped render needs >= 2 chains")
    if len(value_aggs) != n_chains:
        raise ValueError("value_aggs must have one flag per chain")
    qid = '"' + identifier_column.replace('"', '""') + '"'
    qts = '"' + timestamp_column.replace('"', '""') + '"'
    qval = '"' + value_column.replace('"', '""') + '"'
    sel = [f'c{i}.{qid} AS "id_{i + 1}"' for i in range(n_chains)]
    sel.append(f"MIN(c0.{qts}) AS {qts}")
    sel.append('CAST(COUNT(*) AS BIGINT) AS "__gp_cnt"')
    for i in range(n_chains):
        sel.append(f'CAST(COUNT(c{i}.{qval}) AS BIGINT) AS "__gp_n_{i + 1}"')
        if value_aggs[i]:
            sel.append(f'CAST(SUM(c{i}.{qval}) AS {agg_cast}) '
                       f'AS "__gp_sum_{i + 1}"')
            sel.append(f'CAST(MIN(c{i}.{qval}) AS {agg_cast}) '
                       f'AS "__gp_min_{i + 1}"')
            sel.append(f'CAST(MAX(c{i}.{qval}) AS {agg_cast}) '
                       f'AS "__gp_max_{i + 1}"')
        else:
            for k in ("sum", "min", "max"):
                sel.append(f'CAST(NULL AS {agg_cast}) AS "__gp_{k}_{i + 1}"')
    joins = "".join(
        f" JOIN ({base_query}) c{i} ON c{i}.{qts} = c0.{qts}"
        for i in range(1, n_chains))
    conds: list[str] = []
    if id_tuples is not None:
        lhs = "(" + ", ".join(f"c{i}.{qid}" for i in range(n_chains)) + ")"
        vals = ", ".join(
            "(" + ", ".join(_sql_str_literal(x) for x in t) + ")"
            for t in id_tuples)
        conds.append(f"{lhs} IN ({vals})" if vals else "1 = 0")
    if ts_lower is not None:
        v, strict = ts_lower
        conds.append(f"c0.{qts} {'>' if strict else '>='} "
                     f"{_sql_ts_literal(v)}")
    if ts_upper is not None:
        v, strict = ts_upper
        conds.append(f"c0.{qts} {'<' if strict else '<='} "
                     f"{_sql_ts_literal(v)}")
    keys = [f"c{i}.{qid}" for i in range(n_chains)]
    if granule[0] == "bucket":
        keys.append(f"FLOOR(EXTRACT(EPOCH FROM c0.{qts}) "
                    f"/ {int(granule[1])})")
    elif granule[0] == "trunc":
        unit = str(granule[1])
        if unit not in ("year", "month", "day", "hour", "minute", "second"):
            raise ValueError(f"unsupported granule unit {unit!r}")
        keys.append(f"DATE_TRUNC('{unit}', c0.{qts})")
    elif granule[0] != "all":
        raise ValueError(f"unsupported granule {granule!r}")
    where = f" WHERE {' AND '.join(conds)}" if conds else ""
    return (f"SELECT {', '.join(sel)} FROM ({base_query}) c0{joins}"
            f"{where} GROUP BY {', '.join(keys)}")


class FlightTimeSeriesTable(TimeSeriesTable):
    """A TimeSeriesTable backed by a REMOTE Flight SQL store, fetched
    lazily so the compiler can render the composed restriction (id
    IN-list, timestamp bounds, value equality) into the remote query
    BEFORE anything is pulled — the reference's ArrowFlightSQLDatabase
    (arrow_flight_sql_database.rs:121-230) + timeseries_sql_rewrite.rs
    pushdown, restructured so the restricted result still streams to
    EXECUTORS per endpoint rather than through the driver."""

    supports_pushdown = True

    def __init__(self, location: str, query: str, *,
                 username: str | None = None, password: str | None = None,
                 distributed: bool = True, **ts_kwargs):
        super().__init__(path=f"flight://{location}", **ts_kwargs)
        # NOTE: deliberately no SparkSession anywhere on this object —
        # it is driver-side state, every method takes the session
        # explicitly, and keeping it off the instance guarantees an
        # accidental closure capture can never try to pickle it
        self.location = location
        self.base_query = query
        self._username = username
        self._password = password
        self._distributed = distributed
        self._value_xsd_cache: str | None = None

    # Grouped pushdown fires only when it actually shrinks the fetch:
    # opt out when the grouped row count exceeds this fraction of the
    # point count (a grouped partial row carries cnt/n/sum/min/max — at
    # buckets ~= points it ships MORE bytes than the raw points it
    # replaces). 0.5 ~= the partial-row/point-row width ratio.
    GROUPED_PUSHDOWN_MAX_RATIO = 0.5

    def _read(self, spark: SparkSession, sql: str) -> DataFrame:
        return flight_sql_read(spark, self.location, sql,
                               username=self._username,
                               password=self._password,
                               distributed=self._distributed)

    def _probe_one_row(self, sql: str):
        """Driver-side one-row fetch (no Spark job): get_flight_info +
        do_get on the first endpoint — the probe result is a single row
        of two BIGINTs, never worth a distributed read."""
        flight = _require_flight()
        client = flight.FlightClient(self.location)
        opts = _call_options(flight, self._username, self._password, client)
        descriptor = flight.FlightDescriptor.for_command(sql.encode("utf-8"))
        info = client.get_flight_info(descriptor, opts) \
            if opts is not None else client.get_flight_info(descriptor)
        rows = []
        for ep in info.endpoints:
            reader = client.do_get(ep.ticket, opts) \
                if opts is not None else client.do_get(ep.ticket)
            t = reader.read_all()
            if t.num_rows:
                rows.append(t)
        if not rows:
            return None
        return rows[0].to_pylist()[0]

    def load(self, spark: SparkSession) -> DataFrame:
        if self._df is None:
            self._df = self._read(spark, self.base_query)
        return self._df

    def value_xsd(self, spark: SparkSession) -> str:
        """Value datatype WITHOUT triggering a remote data fetch: the
        declared hint wins; otherwise one get_flight_info round-trip
        yields the result schema (no record batches move). The base
        implementation would call load() — a full fetch of the
        unrestricted base query, the exact thing the lazy table exists
        to avoid."""
        if self.value_datatype:
            return self.value_datatype
        if self._value_xsd_cache is None:
            from pyspark.sql.pandas.types import from_arrow_schema

            from otit_swt_spark.terms import xsd_for_spark_type

            flight = _require_flight()
            client = flight.FlightClient(self.location)
            opts = _call_options(flight, self._username, self._password,
                                 client)
            descriptor = flight.FlightDescriptor.for_command(
                self.base_query.encode("utf-8"))
            info = client.get_flight_info(descriptor, opts) \
                if opts is not None else client.get_flight_info(descriptor)
            schema = from_arrow_schema(info.schema)
            self._value_xsd_cache = xsd_for_spark_type(
                schema[self.value_column].dataType)
        return self._value_xsd_cache

    def restricted_normalized(self, spark: SparkSession, *,
                              ids: list[str] | None = None,
                              ts_lower=None, ts_upper=None,
                              value_eq=None) -> DataFrame:
        sql = render_restricted_sql(
            self.base_query,
            identifier_column=self.identifier_column,
            timestamp_column=self.timestamp_column,
            value_column=self.value_column,
            ids=ids, ts_lower=ts_lower, ts_upper=ts_upper,
            value_eq=value_eq)
        if sql == self.base_query:
            return self.normalized(spark)
        return self._normalize(self._read(spark, sql))

    def grouped_restricted_normalized(self, spark: SparkSession, *,
                                      granule: tuple,
                                      ids: list[str] | None = None,
                                      ts_lower=None, ts_upper=None,
                                      agg_type: str = "double",
                                      value_aggs: bool = True):
        """Execute the grouped pushdown on the remote store — one row
        per (id, granule) crosses the wire instead of one per point.
        The value column is NULL-typed: _analyze_group_pushdown proved
        nothing downstream reads it, every consumer aggregates the
        partial columns instead."""
        cast = {"long": "BIGINT", "double": "DOUBLE"}.get(agg_type)
        if cast is None:
            return None
        # Cost model (r13-verdict item 8): a sub-point-interval bucket
        # (or a calendar trunc finer than the sampling rate) makes
        # buckets ~= points, and the grouped form then ships as many —
        # and WIDER — rows than the raw fetch. One cheap remote COUNT
        # probe over the identical restriction decides; on opt-out the
        # caller falls back to the (always-correct) point fetch.
        # granule ("all",) is one row per id — always worthwhile.
        if granule[0] != "all":
            try:
                probe = self._probe_one_row(render_grouped_probe_sql(
                    self.base_query,
                    identifier_column=self.identifier_column,
                    timestamp_column=self.timestamp_column,
                    granule=granule, ids=ids,
                    ts_lower=ts_lower, ts_upper=ts_upper))
            except Exception:
                probe = None  # unprobeable store: keep the pushdown
            if probe is not None and probe["__pts"] and \
                    (probe["__bkts"]
                     > self.GROUPED_PUSHDOWN_MAX_RATIO * probe["__pts"]):
                return None
        sql = render_grouped_sql(
            self.base_query,
            identifier_column=self.identifier_column,
            timestamp_column=self.timestamp_column,
            value_column=self.value_column,
            granule=granule, ids=ids,
            ts_lower=ts_lower, ts_upper=ts_upper, agg_cast=cast,
            value_aggs=value_aggs)
        df = self._read(spark, sql)
        spark_t = {"long": "long", "double": "double"}[agg_type]
        return df.select(
            F.col(self.identifier_column).cast("string").alias("id"),
            F.col(self.timestamp_column).alias("timestamp"),
            F.lit(None).cast(spark_t).alias("value"),
            F.lit(None).cast("int").alias("__part_year"),
            F.lit(None).cast("int").alias("__part_month"),
            F.lit(None).cast("int").alias("__part_day"),
            F.col("__gp_cnt").cast("long").alias("__gp_cnt"),
            F.col("__gp_n").cast("long").alias("__gp_n"),
            F.col("__gp_sum").cast(spark_t).alias("__gp_sum"),
            F.col("__gp_min").cast(spark_t).alias("__gp_min"),
            F.col("__gp_max").cast(spark_t).alias("__gp_max"))

    def sync_grouped_restricted_normalized(self, spark: SparkSession, *,
                                           n_chains: int,
                                           value_aggs: list[bool],
                                           granule: tuple,
                                           id_tuples: list[tuple],
                                           ts_lower=None, ts_upper=None,
                                           agg_type: str = "double"):
        """Execute the synchronized grouped pushdown remotely — one row
        per ((id_1..id_n), granule) crosses the wire instead of N point
        streams. Returns the (id_1..id_n, representative timestamp,
        __gp_cnt, per-chain partials) frame the compiler's
        _apply_sync_grouped_joins consumes."""
        cast = {"long": "BIGINT", "double": "DOUBLE"}.get(agg_type)
        if cast is None:
            return None
        sql = render_sync_grouped_sql(
            self.base_query,
            identifier_column=self.identifier_column,
            timestamp_column=self.timestamp_column,
            value_column=self.value_column,
            n_chains=n_chains, value_aggs=value_aggs,
            granule=granule, id_tuples=id_tuples,
            ts_lower=ts_lower, ts_upper=ts_upper, agg_cast=cast)
        df = self._read(spark, sql)
        spark_t = {"long": "long", "double": "double"}[agg_type]
        cols = [F.col(f"id_{i + 1}").cast("string").alias(f"id_{i + 1}")
                for i in range(n_chains)]
        cols.append(F.col(self.timestamp_column).alias("timestamp"))
        cols.append(F.col("__gp_cnt").cast("long").alias("__gp_cnt"))
        for i in range(n_chains):
            cols.append(F.col(f"__gp_n_{i + 1}").cast("long")
                        .alias(f"__gp_n_{i + 1}"))
            for k in ("sum", "min", "max"):
                cols.append(F.col(f"__gp_{k}_{i + 1}").cast(spark_t)
                            .alias(f"__gp_{k}_{i + 1}"))
        return df.select(*cols)


def flight_timeseries(
    spark: SparkSession,
    location: str,
    query: str,
    *,
    identifier_column: str = "id",
    timestamp_column: str = "timestamp",
    value_column: str = "value",
    value_datatype: str | None = None,
    username: str | None = None,
    password: str | None = None,
    distributed: bool = True,
) -> TimeSeriesTable:
    """Register a Flight SQL result set as a TimeSeriesTable (the
    reference's ArrowFlightSQLDatabase role in its TimeSeriesQueryable
    registry). Returns the LAZY pushdown-capable table: nothing is
    fetched at registration; per query the compiler renders the id
    IN-list / timestamp bounds into the remote SQL and the store sends
    only the touched slice."""
    return FlightTimeSeriesTable(
        location, query,
        username=username, password=password, distributed=distributed,
        identifier_column=identifier_column,
        timestamp_column=timestamp_column,
        value_column=value_column,
        value_datatype=value_datatype,
    )
