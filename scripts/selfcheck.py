#!/usr/bin/env python3
"""Local correctness self-check mimicking the driver's DuckDB oracle.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir> [only_query]

Reads each <verifyOutDir>/<name>/ parquet (Spark output) plus
<verifyOutDir>/oracle_sql.json, runs the oracle SQL in DuckDB with views over
<sfDir>/*.parquet, and compares: column names (sorted), row counts, and
values over rows sorted by all columns. Floats compared exactly AND with
1e-9 tolerance, so we can see which queries are FP-fragile.
"""
import sys, os, json, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(v):
    if v is None: return None
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    if isinstance(v, (list, tuple)): return tuple(canon(x) for x in v)
    if isinstance(v, dict): return tuple(sorted((k, canon(x)) for k, x in v.items()))
    return v

def fetch(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return sorted(cols), out

def approx_eq(a, b):
    if a is b: return True
    if isinstance(a, bool) or isinstance(b, bool): return a == b
    if isinstance(a, float) and isinstance(b, (float, int)):
        if a == "NaN" or b == "NaN": return a == b
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(approx_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = sys.argv[3] if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        if only and name != only: continue
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output"); failures += 1; continue
        try:
            gc, gr = fetch(con, f"SELECT * FROM '{spark_path}/*.parquet'")
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}"); failures += 1; continue
        try:
            wc, wr = fetch(con, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); failures += 1; continue
        if gc != wc:
            print(f"FAIL {name}: columns {gc} vs {wc}"); failures += 1; continue
        if len(gr) != len(wr):
            print(f"FAIL {name}: rows {len(gr)} vs {len(wr)}"); failures += 1; continue
        if gr == wr:
            print(f"PASS {name} ({len(gr)} rows, exact)")
        else:
            ok = all(approx_eq(a, b) for a, b in zip(gr, wr))
            if ok:
                print(f"WARN {name} ({len(gr)} rows): approx match only (FP-fragile)")
                for a, b in zip(gr, wr):
                    if a != b:
                        print(f"   first diff:\n    spark={a}\n    duck ={b}")
                        break
            else:
                failures += 1
                print(f"FAIL {name}: value mismatch ({len(gr)} rows)")
                shown = 0
                for a, b in zip(gr, wr):
                    if not approx_eq(a, b):
                        print(f"    spark={a}\n    duck ={b}")
                        shown += 1
                        if shown >= 3: break
    missing = [n for n in os.listdir(out_dir)
               if os.path.isdir(f"{out_dir}/{n}") and n not in oracle]
    for n in missing:
        print(f"INFO {n}: rows-only (no oracle)")
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
