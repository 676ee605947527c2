"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__ query on Spark and its oracle on DuckDB at the
given sf dir, compares row count, column names, and exact values after
sorting columns by name and rows by all columns. Reports per-query status.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from tslib_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            s = pd.to_datetime(df[c])
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            df[c] = s.astype("datetime64[ns]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, only: list[str] | None = None):
    spark = get_spark("contract-check", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    if only:
        unknown = sorted(set(only) - set(qs))
        if unknown:
            print(f"unknown query names: {unknown}")
            return 1
        qs = {k: v for k, v in qs.items() if k in only}
    else:
        e = entrymod.entry(spark)
        n = e.count()
        print(f"entry: {n} rows, schema={e.schema.simpleString()}")
        assert n >= 0
    failures = []
    seen = set()  # explicit verdict-row accounting: every registered query
    # must produce exactly one verdict line (round-4 lesson: an ABSENT row
    # is worse than a red one — it reads as coverage that isn't). Names
    # enter `seen` only AFTER their verdict line prints, so the MISSING
    # check below is live accounting, not a tautology (r5 ADVICE: the old
    # version added every name up front and could never fire).
    for name, fn in qs.items():
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(ex).__name__}: {str(ex)[:200]}")
            seen.add(name)
            continue
        if name not in osql:
            print(f"rows-only  {name}: {len(got)} rows  ({time.time()-t0:.1f}s)")
            seen.add(name)
            continue
        try:
            want = con.execute(osql[name]).fetchdf()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {str(ex)[:200]}")
            seen.add(name)
            continue
        try:
            g, w = canon(got), canon(want)
            status = []
            if len(g) != len(w):
                status.append(f"rowcount {len(g)} vs {len(w)}")
            if list(g.columns) != list(w.columns):
                status.append(f"cols {list(g.columns)} vs {list(w.columns)}")
            if not status:
                for c in g.columns:
                    if pd.api.types.is_float_dtype(g[c]):
                        a, b = g[c].to_numpy(), w[c].to_numpy()
                        both_nan = np.isnan(a) & np.isnan(b)
                        exact = (a == b) | both_nan
                        if not exact.all():
                            md = np.nanmax(np.abs(a - b))
                            status.append(f"{c}: {(~exact).sum()} diffs, maxabs={md:.3e}")
                    else:
                        if not g[c].equals(w[c]):
                            status.append(f"{c}: value mismatch")
        except Exception as ex:
            # a checker bug must not abort the loop — it would silently
            # drop every later query's verdict row
            failures.append(name)
            print(f"FAIL  {name}: checker error {type(ex).__name__}: {str(ex)[:200]}")
            seen.add(name)
            continue
        if status:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(status)}  ({time.time()-t0:.1f}s)")
        else:
            print(f"OK    {name}: {len(g)} rows exact  ({time.time()-t0:.1f}s)")
        seen.add(name)

    spark.stop()
    missing = sorted(set(qs) - seen)
    if missing:
        failures.extend(missing)
        print(f"MISSING verdict rows (registered but never checked): {missing}")
    if not only and set(osql) != set(qs):
        failures.append("oracle/query key mismatch")
        print(
            f"KEY MISMATCH: only-in-queries={sorted(set(qs) - set(osql))} "
            f"only-in-oracle={sorted(set(osql) - set(qs))}"
        )
    print(f"\nverdict rows: {len(seen)}/{len(qs)} registered; {len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    # usage: check_contract.py [sf_dir] [query_name ...]
    sys.exit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
            only=sys.argv[2:] or None,
        )
    )
