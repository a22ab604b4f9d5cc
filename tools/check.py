#!/usr/bin/env python3
"""Self-check mirroring the driver's DuckDB-oracle compare.

Usage: tools/check.py <sfDir> <verifyOutDir>

For each query output parquet under <verifyOutDir>, runs the matching oracle
SQL from oracle_sql.json in DuckDB (tables = <sfDir>/*.parquet registered as
views), sorts columns by name, sorts rows, and compares values exactly.
"""
import sys, os, json, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(rows):
    out = []
    for row in rows:
        r = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v): r.append("NaN")
                else: r.append(f"{v!r}")
            elif hasattr(v, "isoformat"): r.append(v.isoformat())
            elif isinstance(v, (list, tuple)): r.append(json.dumps([str(x) for x in v]))
            else: r.append(repr(v))
        out.append(tuple(r))
    return sorted(out)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        spark_rel = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        spark_cols = [c[0] for c in spark_rel.description]
        spark_rows = spark_rel.fetchall()
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(spark_rows)} rows "
                  f"{'OK' if len(spark_rows) > 0 else 'EMPTY!'}")
            n_rowsonly += 1
            continue
        try:
            ora_rel = con.execute(oracles[name])
            ora_cols = [c[0] for c in ora_rel.description]
            ora_rows = ora_rel.fetchall()
        except Exception as e:
            print(f"  [FAIL-oracle-sql] {name}: {str(e)[:200]}")
            n_fail += 1
            continue
        # sort columns by name (driver semantics)
        s_ord = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
        o_ord = sorted(range(len(ora_cols)), key=lambda i: ora_cols[i])
        if sorted(spark_cols) != sorted(ora_cols):
            print(f"  [FAIL-cols] {name}: spark={sorted(spark_cols)} oracle={sorted(ora_cols)}")
            n_fail += 1
            continue
        s = canon([[r[i] for i in s_ord] for r in spark_rows])
        o = canon([[r[i] for i in o_ord] for r in ora_rows])
        if s == o:
            print(f"  [PASS] {name}: {len(s)} rows")
            n_pass += 1
        else:
            print(f"  [FAIL-values] {name}: spark {len(s)} rows vs oracle {len(o)} rows")
            for i, (a, b) in enumerate(zip(s, o)):
                if a != b:
                    print(f"    first diff row {i}:\n      spark : {a}\n      oracle: {b}")
                    break
            if len(s) != len(o):
                only_s = set(s) - set(o)
                only_o = set(o) - set(s)
                if only_s: print(f"    spark-only sample: {list(only_s)[:2]}")
                if only_o: print(f"    oracle-only sample: {list(only_o)[:2]}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
