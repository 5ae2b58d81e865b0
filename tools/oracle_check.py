"""Local stand-in for the driver's correctness gate: runs every
``__spark_entry__.queries()`` entry on Spark AND its ``oracle_sql()`` twin on
DuckDB over the same parquet dir, then compares row count, sorted column
names, and an order-insensitive value hash (floats at full shortest-round-trip
precision, NaN/None canonicalized — strict, like the driver).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        # full precision (shortest round-trip repr), matching the driver's
        # strict hash — any last-ulp cross-engine difference must FAIL here
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(canon_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def duck_rows_pandas_path(rel) -> list[tuple]:
    """Fetch a DuckDB relation the way the DRIVER does: via ``.df()`` (pandas).

    This is the path that exposed the round-2 HUGEINT bug: ``fetchall()``
    yields Python ints for HUGEINT sums, but pandas has no int128 dtype so
    ``.df()`` coerces the column to float64 — ``26100`` becomes ``26100.0``
    and the strict hash diverges from Spark's BIGINT.  Fetching here through
    pandas (numpy scalars unwrapped with ``.item()``, exactly the coercion
    the driver sees) makes local green predict driver green.
    """
    import numpy as np
    import pandas as pd

    def conv(x):
        if isinstance(x, np.ndarray):
            return [conv(v) for v in x.tolist()]
        if isinstance(x, np.generic):
            return x.item()
        if x is pd.NaT:
            return None
        if isinstance(x, pd.Timestamp):
            return x.to_pydatetime()
        return x

    df = rel.df()
    return [
        tuple(conv(x) for x in row)
        for row in df.itertuples(index=False, name=None)
    ]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from html_parser_spark.spark.session import get_spark

    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = duck_rows_pandas_path(rel)
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            failures.append(name)
            continue
        ok_count = len(srows) == len(drows)
        ok_schema = sorted(c.lower() for c in scols) == sorted(c.lower() for c in dcols)
        sh = value_hash([c.lower() for c in scols], srows)
        dh = value_hash([c.lower() for c in dcols], drows)
        ok_hash = sh == dh
        status = "OK  " if (ok_count and ok_schema and ok_hash) else "FAIL"
        print(
            f"{status} {name}: rows {len(srows)}/{len(drows)} schema={ok_schema} "
            f"hash={ok_hash} ({time.time()-t0:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_schema:
                print(f"   spark cols: {scols}\n   duck  cols: {dcols}")
            elif not ok_hash and len(srows) == len(drows):
                order = sorted(range(len(scols)), key=lambda i: scols[i].lower())
                sset = sorted("|".join(canon_cell(r[i]) for i in order) for r in srows)
                dorder = sorted(range(len(dcols)), key=lambda i: dcols[i].lower())
                dset = sorted("|".join(canon_cell(r[i]) for i in dorder) for r in drows)
                for a, b in zip(sset, dset):
                    if a != b:
                        print(f"   spark: {a[:220]}\n   duck : {b[:220]}")
                        break
    spark.stop()
    print("FAILURES:", failures or "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
