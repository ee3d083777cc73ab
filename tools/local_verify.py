#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs graft.Verify (already executed by caller into OUT_DIR), then executes
each oracle_sql.json entry in DuckDB against views named after the parquet
tables in SF_DIR, and compares: column names (sorted), row counts, and
values (rows sorted, exact equality; floats reported with max abs diff).

Usage: python3 tools/local_verify.py SF_DIR OUT_DIR [query ...]
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if v is None: return None
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    if hasattr(v, "isoformat"):  # datetime / Timestamp
        return str(getattr(v, "to_pydatetime", lambda: v)())
    if isinstance(v, bytes): return v.hex()
    try:
        import decimal
        if isinstance(v, decimal.Decimal): return float(v)
    except Exception: pass
    return v

def rows_of(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in data:
        out.append(tuple(norm(row[i]) for i in order))
    key = lambda t: tuple((x is None, str(type(x)), str(x)) for x in t)
    return sorted(out, key=key), [cols[i] for i in order]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path): continue
        if only and name not in only: continue
        tbl = pq.read_table(path)
        scols = tbl.column_names
        sdata = [tuple(r[c] for c in scols) for r in tbl.to_pylist()] if tbl.num_rows else []
        srows, scols_sorted = rows_of(scols, [[r[c] for c in scols] for r in tbl.to_pylist()])
        if name not in oracle:
            print(f"  {name}: NO-ORACLE rows={tbl.num_rows}" + (" *** EMPTY ***" if tbl.num_rows==0 else ""))
            continue
        try:
            res = con.sql(oracle[name])
            ocols = res.columns
            odata = res.fetchall()
        except Exception as e:
            print(f"✗ {name}: ORACLE SQL ERROR: {str(e)[:200]}")
            n_fail += 1
            continue
        orows, ocols_sorted = rows_of(ocols, odata)
        if [c.lower() for c in scols_sorted] != [c.lower() for c in ocols_sorted]:
            print(f"✗ {name}: COLUMNS spark={scols_sorted} oracle={ocols_sorted}")
            n_fail += 1; continue
        if len(srows) != len(orows):
            print(f"✗ {name}: ROWS spark={len(srows)} oracle={len(orows)}")
            n_fail += 1; continue
        bad = 0; maxdiff = 0.0; example = None
        for sr, orow in zip(srows, orows):
            if sr != orow:
                # measure float near-misses
                rowdiff = 0.0; hard = False
                for a, b in zip(sr, orow):
                    if a == b: continue
                    if isinstance(a, float) and isinstance(b, float):
                        rowdiff = max(rowdiff, abs(a - b))
                    else:
                        hard = True
                if hard or rowdiff > 0:
                    bad += 1; maxdiff = max(maxdiff, rowdiff)
                    if example is None: example = (sr, orow)
        if bad:
            print(f"✗ {name}: {bad}/{len(srows)} rows differ, max_float_diff={maxdiff:.3e}")
            if example: print(f"    spark:  {example[0]}\n    oracle: {example[1]}")
            n_fail += 1
        else:
            print(f"✓ {name}: {len(srows)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
