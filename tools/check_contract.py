"""Local replica of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB at sf0.01,
compare row count, column names, and order-insensitive value hash."""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from cuda_selection_criteria_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None


def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    return str(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(",".join(norm_cell(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        df = fn(spark, SF_DIR)
        cols = df.columns
        rows = [tuple(r) for r in df.collect()]
        t1 = time.time()
        if name not in oracles:
            print(f"{name:28s} rows={len(rows):6d} (rows-only) {t1-t0:5.1f}s")
            continue
        o = con.execute(oracles[name])
        ocols = [d[0] for d in o.description]
        orows = o.fetchall()
        ok_n = len(rows) == len(orows)
        ok_c = sorted(cols) == sorted(ocols)
        ok_h = value_hash(rows, cols) == value_hash(orows, ocols)
        status = "OK" if (ok_n and ok_c and ok_h) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name:28s} rows={len(rows):6d}/{len(orows):6d} cols={'OK' if ok_c else cols} "
            f"hash={'OK' if ok_h else 'MISMATCH'} {t1-t0:5.1f}s {status}"
        )
        if not ok_h and ok_n and ok_c:
            sp = {",".join(norm_cell(r[i]) for i in sorted(range(len(cols)), key=lambda i: cols[i])) for r in rows}
            du = {",".join(norm_cell(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i])) for r in orows}
            print("   spark-only:", list(sp - du)[:3])
            print("   duck-only :", list(du - sp)[:3])
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
