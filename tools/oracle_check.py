#!/usr/bin/env python3
"""Dev-only local mirror of the driver's DuckDB correctness gate.

NOT part of the shipped Scala library — it reproduces what the driver does
with Verify's output so oracle pairs can be debugged before the round runs:
run `sbt "runMain graft.Verify <sfDir> <outDir>"` first, then this script
compares each <outDir>/<name> parquet against its oracle_sql.json entry
executed in DuckDB over the same sf tables.
"""
import json, math, sys
import duckdb

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:200]}")
            n_bad += 1
            continue
        # mirror the driver: sort columns by name, compare values in row order
        sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}")
            n_bad += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            n_bad += 1
            continue
        spark_df, duck_df = spark_df[sc], duck_df[sc]
        bad = None
        # dtype-strict: the driver hashes values, so int64 5 vs float64 5.0
        # mismatch even though Python == says equal (DuckDB sum(int) returns
        # HUGEINT -> pandas float64 — CAST oracle sums to BIGINT).
        kind = lambda d: "f" if d.kind == "f" else ("i" if d.kind in "iu" else d.kind)
        dt_bad = [c for c in sc if kind(spark_df[c].dtype) != kind(duck_df[c].dtype)]
        if dt_bad:
            print(f"FAIL {name}: dtype mismatch {[ (c, str(spark_df[c].dtype), str(duck_df[c].dtype)) for c in dt_bad ]}")
            n_bad += 1
            continue
        for c in sc:
            a, b = spark_df[c].tolist(), duck_df[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                same = (x == y) or (x is None and y is None)
                if not same and isinstance(x, float) and isinstance(y, float):
                    same = (math.isnan(x) and math.isnan(y)) or x == y
                if not same:
                    try:
                        if x != x and y != y: same = True  # NaN
                    except Exception: pass
                if not same:
                    bad = (c, i, x, y)
                    break
            if bad: break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: col={c} row={i}: spark={x!r} duck={y!r}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(spark_df)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sys.exit(main(sf, out))
