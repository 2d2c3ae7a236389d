"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 and compares
row-count / schema / order-insensitive value-hash against oracle_sql()
via DuckDB. Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")
import __spark_entry__ as entrymod  # noqa: E402
from lash_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def value_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    # canonical: round-trip through sorted records; floats via repr
    rows = []
    for tup in pdf.itertuples(index=False):
        rows.append(tuple(_canon(v) for v in tup))
    rows.sort()
    import hashlib

    h = hashlib.sha256()
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest()[:16]


def _canon(v):
    import numpy as np

    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, (float, np.floating)):
        return float(v)
    if isinstance(v, (int, np.integer)):
        return int(v)
    return str(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

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
            print(f"FAIL  {name}: spark error {e}")
            continue
        spark_s = time.monotonic() - t0
        if name not in oracles:
            print(f"rows-only  {name}: {len(sdf)} rows, cols={list(sdf.columns)}  ({spark_s:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        hs, ho = value_hash(sdf), value_hash(odf)
        ok_hash = hs == ho
        status = "OK   " if (ok_rows and ok_cols and ok_hash) else "FAIL "
        if status.startswith("FAIL"):
            failures.append(name)
        print(
            f"{status} {name}: rows {len(sdf)}/{len(odf)} cols_match={ok_cols} "
            f"hash={'=' if ok_hash else f'{hs}!={ho}'} ({spark_s:.1f}s)"
        )
        if not ok_hash and ok_rows and ok_cols and len(sdf) < 10000:
            s = sdf.reindex(sorted(sdf.columns), axis=1)
            d = odf.reindex(sorted(odf.columns), axis=1)
            key = list(s.columns[:2])
            m = s.merge(d, on=key, how="outer", suffixes=("_s", "_o"), indicator=True)
            bad = m[m["_merge"] != "both"]
            if len(bad):
                print(bad.head(6).to_string())
            else:
                for c in s.columns:
                    if c in key:
                        continue
                    mm = m[abs(m.get(c + "_s", 0) != m.get(c + "_o", 0))] if c + "_s" in m else None
                    if mm is not None and len(mm):
                        print(f"  col {c}: {len(mm)} diffs"); print(mm.head(4).to_string())
    print("FAILURES:", failures or "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
