#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: runs each oracle SQL in
DuckDB over the sf tables and compares against the Spark parquet dumps that
graft.Verify wrote. Columns sorted by name, rows sorted, exact value compare
(floats exact — the point is to catch nondeterministic float math early).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import sys, glob, json, math
import duckdb

def canon(rows, names):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t)), [names[i] for i in order]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            # The driver's comparator (pandas sort_values + hash) cannot
            # handle composite cells (ndarray/dict); reject them here so the
            # local gate catches driver-incomparable shapes first.
            bad_cols = [(c, str(t)) for c, t in
                        zip(spark_rel.columns, spark_rel.types)
                        if "[]" in str(t) or str(t).startswith(("STRUCT", "MAP"))]
            if bad_cols:
                print(f"FAIL {name}: driver-incomparable column type(s) "
                      f"{bad_cols} — the driver's pandas comparator cannot "
                      f"hash array/struct/map cells; declare scalar or "
                      f"to_json legs instead")
                n_fail += 1
                continue
            s_rows, s_names = canon(spark_rel.fetchall(), spark_rel.columns)
            duck_rel = con.sql(oracle[name])
            d_rows, d_names = canon(duck_rel.fetchall(), duck_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if s_names != d_names:
            print(f"FAIL {name}: columns {s_names} vs {d_names}")
            n_fail += 1
        elif len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows {len(s_rows)} vs {len(d_rows)}")
            n_fail += 1
        elif s_rows != d_rows:
            bad = next(i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b)
            print(f"FAIL {name}: first diff at row {bad}:")
            print(f"   spark: {s_rows[bad]}")
            print(f"   duck : {d_rows[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} passed, {n_fail} failed ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
