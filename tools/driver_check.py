#!/usr/bin/env python3
"""Replicate the grading driver locally: run `__spark_entry__.queries()`
against `oracle_sql()` side-by-side on DuckDB views of the same parquet
(default sf0.01, the driver's correctness scale) with a VANILLA Spark
session, and report per-query rows/schema/values matches as JSON.

Usage:
  python tools/driver_check.py [--sf /root/testdata/sf0.01] [--first 50]
                               [--names q1,q2,...]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if df.empty:
        return df.reset_index(drop=True)
    key = df.astype(str).agg("|".join, axis=1)
    return df.loc[key.sort_values().index].reset_index(drop=True)


def _values_equal(a, b) -> bool:
    import pandas as pd

    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if pd.isna(a) and pd.isna(b):
        return True
    return a == b


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--first", type=int, default=50)
    ap.add_argument("--names", default="")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    duck = duckdb.connect()
    for t in TABLES:
        path = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(path):
            duck.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    queries, oracles = entry.queries(), entry.oracle_sql()
    if args.names:
        names = [n for n in args.names.split(",") if n]
    else:
        names = list(queries)[: args.first]

    results: dict[str, dict] = {}
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        rec: dict = {}
        try:
            sdf = queries[name](spark, args.sf).toPandas()
            rec["spark_rows"] = len(sdf)
        except Exception as ex:  # noqa: BLE001 - report, don't die
            rec["err"] = f"spark: {str(ex)[:200]}"
            results[name] = rec
            n_fail += 1
            print(f"FAIL {name}: spark error", flush=True)
            continue
        if name not in oracles:
            rec["err"] = "no_oracle"
            results[name] = rec
            n_rows_only += 1
            print(f"rows-only {name}: {len(sdf)} rows", flush=True)
            continue
        try:
            ddf = duck.execute(oracles[name]).fetchdf()
        except Exception as ex:  # noqa: BLE001
            rec["err"] = f"oracle: {str(ex)[:200]}"
            results[name] = rec
            n_fail += 1
            print(f"FAIL {name}: oracle error", flush=True)
            continue
        rec["oracle_rows"] = len(ddf)
        rec["rows_match"] = len(sdf) == len(ddf)
        rec["schema_match"] = sorted(sdf.columns) == sorted(ddf.columns)
        values_match = rec["rows_match"] and rec["schema_match"]
        if values_match:
            s, d = _normalize(sdf), _normalize(ddf)
            for col in s.columns:
                for x, y in zip(s[col].tolist(), d[col].tolist()):
                    if not _values_equal(x, y):
                        values_match = False
                        rec["first_mismatch"] = f"{col}: {x!r} vs {y!r}"
                        break
                if not values_match:
                    break
        rec["values_match"] = values_match
        results[name] = rec
        ok = rec["rows_match"] and rec["schema_match"] and values_match
        n_pass += ok
        n_fail += not ok
        print(("PASS" if ok else "FAIL") + f" {name}", flush=True)

    summary = {"pass": n_pass, "fail": n_fail, "rows_only": n_rows_only,
               "checked": len(names), "sf": args.sf}
    print(json.dumps(summary))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "DRIVER_CHECK.json")
    # merge into any prior run so partial (--names) passes extend the
    # artifact instead of clobbering it
    merged: dict = {}
    if os.path.exists(out):
        try:
            with open(out) as f:
                merged = json.load(f).get("results", {})
        except (OSError, json.JSONDecodeError):
            merged = {}
    merged.update(results)
    ok = sum(
        1 for v in merged.values()
        if v.get("rows_match") and v.get("schema_match") and v.get("values_match")
    )
    totals = {
        "pass": ok,
        "rows_only": sum(1 for v in merged.values() if v.get("err") == "no_oracle"),
        "fail": sum(
            1 for v in merged.values()
            if v.get("err") not in (None, "no_oracle")
            or v.get("values_match") is False
        ),
        "checked": len(merged),
        "sf": args.sf,
    }
    with open(out, "w") as f:
        json.dump({"summary": totals, "results": merged}, f, indent=1)
    spark.stop()
    return 0 if n_fail == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
