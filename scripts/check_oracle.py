#!/usr/bin/env python3
"""Dev harness mirroring the driver's DuckDB oracle compare.

Usage: python3 scripts/check_oracle.py <verifyOutDir> <sfDir>

For each query dumped by `graft.Verify` (<out>/<name>/ parquet +
<out>/oracle_sql.json), runs the oracle SQL in DuckDB against views over
the same testdata parquet and diff-checks: column names (sorted), row
count, and cell values (rows sorted by all columns). Exact equality is
required — floats too — because the driver hash-compares; near-misses
are reported with magnitudes so rounding bugs are diagnosable.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            spark_cols = sorted(spark_rel.columns)
            s_rows = con.sql(
                f"SELECT {', '.join(q(c) for c in spark_cols)} FROM spark_rel "
                f"ORDER BY ALL").fetchall()
            duck_rel = con.sql(sql)
            duck_cols = sorted(duck_rel.columns)
            d_rows = con.sql(
                f"SELECT {', '.join(q(c) for c in duck_cols)} FROM duck_rel "
                f"ORDER BY ALL").fetchall()
        except Exception as e:
            print(f"FAIL  {name}: error: {e}")
            n_fail += 1
            continue
        if spark_cols != duck_cols:
            print(f"FAIL  {name}: columns spark={spark_cols} duck={duck_cols}")
            n_fail += 1
            continue
        # Dtype gate: the driver's hash is type-sensitive, so an oracle
        # column whose DuckDB type differs from the Spark parquet type
        # (e.g. sum(BIGINT) -> HUGEINT vs Spark LongType) hash-mismatches
        # even when every value agrees. Compare per-column DuckDB types.
        s_types = dict(zip(spark_rel.columns, (str(t) for t in spark_rel.types)))
        d_types = dict(zip(duck_rel.columns, (str(t) for t in duck_rel.types)))
        type_bad = [f"{c}: spark={s_types[c]} oracle={d_types[c]}"
                    for c in spark_cols if s_types[c] != d_types[c]]
        if type_bad:
            print(f"FAIL  {name}: dtype mismatch ({'; '.join(type_bad)})")
            n_fail += 1
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL  {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
            for j, (a, b) in enumerate(zip(sr, dr)):
                a, b = norm(a), norm(b)
                if a != b:
                    detail = ""
                    if isinstance(a, float) and isinstance(b, float):
                        detail = f" (|diff|={abs(a-b):.3e})"
                    bad = f"row {i} col {spark_cols[j]}: spark={a!r} duck={b!r}{detail}"
                    break
            if bad:
                break
        if bad:
            print(f"FAIL  {name}: {bad}")
            n_fail += 1
        else:
            print(f"MATCH {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} match, {n_fail} fail")
    return 1 if n_fail else 0

def q(c):
    return '"' + c.replace('"', '""') + '"'

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
