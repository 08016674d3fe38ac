"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB, compare row count,
schema (column names), and order-insensitive value hash.

Usage: python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return format(v, ".10g")
    if isinstance(v, int):
        return str(v)
    return str(v)


def value_hash(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from docling_metrics_spark.session import build_session
    import __spark_entry__ as E

    spark = build_session(master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    ok = fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            fail += 1
            continue
        dt = time.time() - t0
        # The driver's rows canonicalizer sorts/hashes every cell: nested
        # values (MapType/ArrayType/StructType) are unhashable in pandas and
        # crash it (VERDICT r2 #1) — flag them HERE, before the driver does.
        nested = {
            columns_name
            for r in rows
            for columns_name, v in zip(cols, r)
            if isinstance(v, (dict, list, tuple, set, bytearray))
            or type(v).__module__ == "numpy" and getattr(v, "ndim", 0) > 0
        }
        if nested:
            print(f"FAIL  {name}: nested output columns {sorted(nested)} "
                  "(driver canonicalizer cannot hash these)")
            fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(rows)} rows ({dt:.1f}s, no oracle)")
            ok += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {exc}")
            fail += 1
            continue
        problems = []
        if len(rows) != len(drows):
            problems.append(f"rowcount {len(rows)} vs {len(drows)}")
        if sorted(cols) != sorted(dcols):
            problems.append(f"schema {sorted(cols)} vs {sorted(dcols)}")
        if not problems:
            h1, h2 = value_hash(rows, cols), value_hash(drows, dcols)
            if h1 != h2:
                problems.append("value hash mismatch")
                for r1, r2 in list(zip(sorted(map(str, rows)), sorted(map(str, drows))))[:3]:
                    if r1 != r2:
                        problems.append(f"  spark: {r1}")
                        problems.append(f"  duck : {r2}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            fail += 1
        else:
            print(f"OK    {name}: {len(rows)} rows ({dt:.1f}s)")
            ok += 1
    print(f"\n{ok} ok, {fail} fail")
    spark.stop()
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
