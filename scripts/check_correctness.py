"""Self-check harness mimicking the driver's CORRECTNESS gate: run each
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB over the
same parquet tables, compare row count + column names + order-insensitive
values. Usage: python scripts/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        s = pdf[c]
        if s.dtype == object:
            # unify bytes/None representations
            pdf[c] = s.map(lambda v: None if v is None else v)
        elif np.issubdtype(s.dtype, np.floating):
            pdf[c] = s.round(6)
    pdf = pdf.sort_values(by=list(pdf.columns), na_position="first")
    return pdf.reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount {len(spark_pdf)} vs {len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns {sc} vs {dc}")
        return problems
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            try:
                if av.dtype != object and bv.dtype != object:
                    ok = np.array_equal(av.to_numpy(), bv.to_numpy(), equal_nan=True)
                else:
                    ok = av.astype(str).equals(bv.astype(str))
            except Exception as exc:
                problems.append(f"col {c}: compare error {exc}")
                continue
            if not ok:
                mism = (av.astype(str) != bv.astype(str))
                idx = mism[mism].index[:3].tolist()
                examples = [(c, i, av.iloc[i], bv.iloc[i]) for i in idx]
                problems.append(f"col {c}: value mismatch, e.g. {examples}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[2:])

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "entrymod", os.path.join(REPO, "__spark_entry__.py"))
    entrymod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entrymod)

    from supercrawler_spark.session import get_spark
    spark = get_spark("correctness-check", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_ok = n_fail = n_rows_only = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            status = "ROWS" if len(spdf) >= 0 else "FAIL"
            print(f"{status}  {name}: rows={len(spdf)} "
                  f"cols={sorted(spdf.columns)} ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            dpdf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        problems = compare(spdf, dpdf)
        if problems:
            print(f"FAIL  {name}: {problems} ({time.time()-t0:.1f}s)")
            n_fail += 1
        else:
            print(f"OK    {name}: rows={len(spdf)} ({time.time()-t0:.1f}s)")
            n_ok += 1
    print(f"\n{n_ok} oracle-matched, {n_rows_only} rows-only, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
