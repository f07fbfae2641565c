"""Local stand-in for the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() twin on DuckDB at the given sf, compare
row count, column set, and order-insensitive values."""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from otit_swt_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def run_sweep(spark, sf_dir: str = "/root/testdata/sf0.01",
              only: list[str] | None = None) -> list[tuple[str, str]]:
    """Run every queries() entry on Spark and its oracle_sql() twin on
    DuckDB, returning (name, reason) failures — importable so the pytest
    suite runs the full sweep by default (driver subsetting can't hide
    drift)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            pdf_rows = [tuple(r) for r in df.collect()]
            s_cols = df.columns
        except Exception as e:
            failures.append((name, f"SPARK ERROR {type(e).__name__}: {str(e)[:300]}"))
            print(f"FAIL  {name}: spark error {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(pdf_rows)} rows, {time.time()-t0:.1f}s)")
            if len(pdf_rows) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [c[0] for c in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {str(e)[:300]}"))
            print(f"FAIL  {name}: duckdb error {str(e)[:200]}")
            continue
        sc, sr = norm_rows(s_cols, pdf_rows)
        dc, dr = norm_rows(d_cols, d_rows)
        if sc != dc:
            failures.append((name, f"schema mismatch {sc} vs {dc}"))
            print(f"FAIL  {name}: schema {sc} vs {dc}")
        elif len(sr) != len(dr):
            failures.append((name, f"rowcount {len(sr)} vs {len(dr)}"))
            print(f"FAIL  {name}: rowcount {len(sr)} vs {len(dr)}")
        elif sr != dr:
            diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            failures.append((name, f"values differ, e.g. {diff}"))
            print(f"FAIL  {name}: values differ e.g. {diff}")
        else:
            print(f"PASS  {name} ({len(sr)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} ok; {len(failures)} failures")
    for n, msg in failures:
        print(f"  - {n}: {msg}")
    return failures


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    failures = run_sweep(get_spark("oracle_check"), sf_dir, only)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
