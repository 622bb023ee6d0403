#!/usr/bin/env python3
"""Local dev-loop mimic of the driver's correctness gate: run DuckDB oracle
SQL against the testdata tables, compare against Verify's parquet output.
Dev tooling only — not part of the engine (the engine is Scala/Spark)."""
import duckdb, glob, json, math, os, sys

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return repr(v)


def canon(df):
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(r[c]) for c in cols)
            for r in df.to_dict("records")]
    return cols, sorted(rows)


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = sys.argv[3:] or None
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = con.sql(
                f"SELECT * FROM read_parquet({files!r})").df()
            ora_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        sc, sr = canon(spark_df)
        oc, orows = canon(ora_df)
        if sc != oc:
            print(f"FAIL {name}: columns spark={sc} oracle={oc}")
            n_fail += 1
        elif sr != orows:
            n_fail += 1
            print(f"FAIL {name}: rows spark={len(sr)} oracle={len(orows)}")
            diff_s = [r for r in sr if r not in set(orows)][:3]
            diff_o = [r for r in orows if r not in set(sr)][:3]
            print(f"  spark-only: {diff_s}")
            print(f"  oracle-only: {diff_o}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(sr)} rows)")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
