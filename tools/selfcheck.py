#!/usr/bin/env python3
"""Self-check harness mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/selfcheck.py <verify_out_dir> <sf_dir>

Faithful to the driver's comparator: BOTH sides are materialized as
pandas DataFrames via duckdb's .df() (so DuckDB HUGEINT becomes float64,
exactly as the driver sees it), columns are sorted by name, rows are
sorted with pandas sort_values over all columns (which crashes on
array-typed columns — reported as FAIL, matching the driver's 'err'),
and the verdict is a hash over the dtype-sensitive CSV rendering (so
123.0 vs 123 mismatches even though Python == would call them equal).
"""
import hashlib, json, sys
import duckdb

def prep(df):
    df = df[sorted(df.columns)]
    # driver sorts rows by all columns before hashing; array columns
    # raise TypeError('unhashable type: numpy.ndarray') here, like the driver
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def df_hash(df):
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

def first_diff(g, w):
    for i in range(len(g)):
        for c in g.columns:
            a, b = g[c].iloc[i], w[c].iloc[i]
            if str(a) != str(b):
                return f"row {i} col {c}: {a!r} ({type(a).__name__}) != {b!r} ({type(b).__name__})"
    return "no cell-level diff found (ordering/rendering difference)"

def main(outdir, sfdir, json_out=None):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    results = {}
    def record(name, rows, schema, hashm, note=""):
        results[name] = {"rows_match": rows, "schema_match": schema,
                         "hash_match": hashm}
        if note:
            results[name]["note"] = note
    for name, sql in sorted(oracle.items()):
        try:
            gdf = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
            wdf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            record(name, False, False, False, f"exec error: {e}")
            n_fail += 1
            continue
        if sorted(gdf.columns) != sorted(wdf.columns):
            print(f"FAIL {name}: columns {sorted(gdf.columns)} != {sorted(wdf.columns)}")
            record(name, False, False, False, "schema mismatch")
            n_fail += 1
            continue
        try:
            g, w = prep(gdf), prep(wdf)
        except Exception as e:
            print(f"FAIL {name}: driver-sort error: {type(e).__name__}: {e}")
            record(name, False, True, False, "driver-sort error")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rowcount {len(g)} != {len(w)}")
            record(name, False, True, False)
            n_fail += 1
            continue
        if list(map(str, g.dtypes)) != list(map(str, w.dtypes)):
            # not a driver failure by itself (the driver hashes values, and
            # e.g. int32 vs int64 hash alike) — but it is the early-warning
            # sign for HUGEINT→float64-style mismatches, so surface it
            print(f"WARN {name}: pandas dtypes differ: "
                  f"{dict(zip(g.columns, map(str, g.dtypes)))} != "
                  f"{dict(zip(w.columns, map(str, w.dtypes)))}")
        if df_hash(g) != df_hash(w):
            print(f"FAIL {name}: hash mismatch; {first_diff(g, w)}")
            record(name, True, True, False)
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(g)}")
            record(name, True, True, True)
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"n_pass": n_pass, "n_fail": n_fail,
                       "queries": results}, f, indent=0, sort_keys=True)
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
