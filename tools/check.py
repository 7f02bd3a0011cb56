#!/usr/bin/env python3
"""Dev-only oracle parity checker — mirrors the driver's DuckDB gate.

NOT part of the shipped library (the Scala code never calls this);
it exists so operators can be validated against DuckDB locally before
the driver's per-round CORRECTNESS run.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
where <outDir> is what `sbt "runMain graft.Verify <sfDir> <outDir>"`
produced.
"""
import sys, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sys.argv[3:] or sorted(oracle)
    fails = 0
    for name in names:
        try:
            got = pd.read_parquet(f"{outdir}/{name}")
        except Exception as e:
            print(f"✗ {name}: no spark result ({e})")
            fails += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"✗ {name}: oracle SQL failed: {e}")
            fails += 1
            continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"✗ {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            fails += 1
            continue
        cols = list(got.columns)
        sortable = [c for c in cols
                    if got[c].dtype != object or
                    not got[c].map(lambda v: isinstance(v, (list, dict,
                                                            bytes))).any()]
        g = got.sort_values(by=sortable).reset_index(drop=True)
        e = exp.sort_values(by=sortable).reset_index(drop=True)
        if len(g) != len(e):
            print(f"✗ {name}: rows {len(g)} vs {len(e)}")
            fails += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                          check_exact=True)
            print(f"✓ {name}: {len(g)} rows exact")
        except AssertionError as ex:
            msg = str(ex).replace("\n", " | ")[:400]
            print(f"✗ {name}: {msg}")
            fails += 1
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
