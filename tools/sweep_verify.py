#!/usr/bin/env python3
"""Scale-sweep differ: DuckDB-internal compare for big Verify dumps.

tools/local_verify.py mirrors the driver's t2 gate faithfully (python
row materialization, exact tuple compare) but is O(rows) in python
memory — a 10M-row output OOMs the box long before the engines break a
sweat. This differ keeps the comparison INSIDE DuckDB so memory stays
bounded (DuckDB spills) and multi-million-row outputs take seconds.

Two scale lessons are baked in:
 - Each side is materialized ONCE into a temp table. An expensive
   oracle behind a view would otherwise be re-evaluated per compare
   query (count + both difference passes = 3x; q09's struct-min/max
   over 1M groups takes minutes per evaluation at sfx1).
 - Multiset difference is GROUP BY ALL + plain EXCEPT on (row, count),
   not EXCEPT ALL: DuckDB lowers EXCEPT ALL to ROW_NUMBER windows
   partitioned by every column, which degenerates into ~1 partition
   per row on typical (all-rows-distinct) query outputs. The grouped
   form is two hash aggs + a hash anti-join — the multiset semantics
   are identical (row r appears n times <=> group (r, n) on both
   sides).

Equality is DuckDB set-op equality: exact per value (NULL-safe, NaN
equals NaN), with the engine's implicit numeric coercion across
lossless widths. Use local_verify.py when you need the driver's exact
hash semantics at sf0.01; use this for sf1+ sweeps.

Usage: python3 tools/sweep_verify.py SF_DIR OUT_DIR [query ...]
"""
import sys, os, json
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.sql("SET memory_limit='24GB'")
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        if only and name not in only:
            continue
        if name not in oracle:
            n = con.sql(f"SELECT COUNT(*) FROM '{path}/*.parquet'").fetchone()[0]
            print(f"  {name}: NO-ORACLE rows={n}"
                  + (" *** EMPTY ***" if n == 0 else ""), flush=True)
            continue
        try:
            con.sql(f"CREATE OR REPLACE TEMP TABLE _s AS SELECT * FROM '{path}/*.parquet'")
            con.sql(f"CREATE OR REPLACE TEMP TABLE _o AS ({oracle[name]})")
            scols = [r[0] for r in con.sql("DESCRIBE _s").fetchall()]
            ocols = [r[0] for r in con.sql("DESCRIBE _o").fetchall()]
            if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
                print(f"✗ {name}: COLUMNS spark={sorted(scols)} oracle={sorted(ocols)}",
                      flush=True)
                n_fail += 1
                continue
            cols = ", ".join('"' + c + '"' for c in sorted(scols, key=str.lower))
            sn = con.sql("SELECT COUNT(*) FROM _s").fetchone()[0]
            on = con.sql("SELECT COUNT(*) FROM _o").fetchone()[0]
            if sn != on:
                print(f"✗ {name}: ROWS spark={sn} oracle={on}", flush=True)
                n_fail += 1
                continue
            grouped = ("(SELECT {c}, COUNT(*) AS _n FROM {t} GROUP BY {c})"
                       .format)
            extra = con.sql(
                f"SELECT COUNT(*) FROM ({grouped(c=cols, t='_s')} EXCEPT "
                f"{grouped(c=cols, t='_o')})").fetchone()[0]
            missing = con.sql(
                f"SELECT COUNT(*) FROM ({grouped(c=cols, t='_o')} EXCEPT "
                f"{grouped(c=cols, t='_s')})").fetchone()[0]
        except Exception as e:
            print(f"✗ {name}: ERROR: {str(e)[:300]}", flush=True)
            n_fail += 1
            continue
        if extra or missing:
            print(f"✗ {name}: {extra} spark-only / {missing} oracle-only "
                  f"distinct rows of {sn}", flush=True)
            n_fail += 1
        else:
            print(f"✓ {name}: {sn} rows", flush=True)
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail", flush=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
