#!/usr/bin/env python3
"""Self-check harness mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/selfcheck.py <verify_out_dir> <sf_dir>

For each <name>/ parquet dump under verify_out_dir, runs the matching
statement from oracle_sql.json in DuckDB (tables registered as views on
the sf_dir parquet files), sorts columns by name and rows by all
columns, and compares cell values exactly (floats: bit-exact, with a
1e-9-relative fallback reported separately).
"""
import json, math, sys
import duckdb

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in idx) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in idx], out

def cmp_cell(a, b):
    if a is None and b is None: return "eq"
    if isinstance(a, float) and isinstance(b, float):
        if a == b or (math.isnan(a) and math.isnan(b)): return "eq"
        if abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b)): return "approx"
        return "ne"
    return "eq" if a == b else "ne"

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
            want = con.execute(sql)
            wcols = [d[0] for d in want.description]
            wrows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(wcols):
            print(f"FAIL {name}: columns {sorted(gcols)} != {sorted(wcols)}")
            n_fail += 1
            continue
        _, g = canon(grows, gcols)
        _, w = canon(wrows, wcols)
        if len(g) != len(w):
            print(f"FAIL {name}: rowcount {len(g)} != {len(w)}")
            n_fail += 1
            continue
        bad = approx = 0
        example = None
        for rg, rw in zip(g, w):
            for a, b in zip(rg, rw):
                r = cmp_cell(a, b)
                if r == "ne":
                    bad += 1
                    if example is None: example = (a, b)
                elif r == "approx":
                    approx += 1
        if bad:
            print(f"FAIL {name}: {bad} mismatched cells, e.g. {example}")
            n_fail += 1
        elif approx:
            print(f"WARN {name}: exact rows={len(g)} but {approx} cells only approx-equal (hash compare would fail)")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(g)}")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
