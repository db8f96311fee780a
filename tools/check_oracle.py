"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and, where an ``oracle_sql()``
entry exists, the oracle on DuckDB over the same parquet tables; then
compares row count, column names, and an order-insensitive value hash
(strict canonical stringification — if this passes, any reasonable
driver normalization passes).

Usage: python tools/check_oracle.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v) -> str:
    import datetime
    import decimal

    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, (datetime.datetime,)):
        return v.isoformat()
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def frame_hash(pdf) -> tuple[int, str, list[str]]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    lines = sorted(
        "|".join(canon(v) for v in row) for row in pdf.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return len(lines), h.hexdigest(), cols


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    # Deliberately a PLAIN session (no hermes_spark.build_session config):
    # the driver runs queries() under Spark defaults, so the local gate
    # must too — notably parquet NTZ inference stays ON here.
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check_oracle")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            continue
        spark_s = time.monotonic() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{spark_s:.1f}s]")
            if len(sdf) == 0:
                failures.append(name)
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            continue
        ns, hs, cs = frame_hash(sdf)
        no, ho, co = frame_hash(odf)
        ok = (ns == no) and (hs == ho) and (cs == co)
        status = "OK   " if ok else "MISMATCH"
        print(f"{status} {name}: spark={ns} duck={no} cols={'=' if cs == co else f'{cs} vs {co}'} hash={'=' if hs == ho else 'DIFF'} [{spark_s:.1f}s]")
        if not ok:
            failures.append(name)
            if cs == co and ns == no:
                # show first differing rows
                import pandas as pd

                a = sdf[sorted(sdf.columns)].astype(str).apply("|".join, axis=1).sort_values().reset_index(drop=True)
                b = odf[sorted(odf.columns)].astype(str).apply("|".join, axis=1).sort_values().reset_index(drop=True)
                diff = a.compare(b) if len(a) == len(b) else None
                if diff is not None and len(diff):
                    print(diff.head(4).to_string())
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nall queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
