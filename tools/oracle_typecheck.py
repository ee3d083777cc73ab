#!/usr/bin/env python3
"""Oracle output-type guard: fail on driver-hash-hostile DuckDB types.

The driver's correctness hash is representation-sensitive: a DuckDB
HUGEINT (INT128) column hash-mismatches a value-identical Spark INT64
even when every value fits in 64 bits. DuckDB types a bare
`SUM(BIGINT)` as HUGEINT, so any new oracle that forgets the
`CAST(SUM(...) AS BIGINT)` convention (functions/Exact.scala scaladoc)
ships green locally and red on the driver gate — exactly the
q79/t20/t22 failure that stood through rounds 7-8.

This tool types EVERY oracle query in an existing Verify dump against
DuckDB and fails if any output column is HUGEINT/UHUGEINT (or errors).
Run it after local_verify in any round that touched oracle SQL:

    python3 tools/oracle_typecheck.py SF_DIR OUT_DIR
"""
import sys, json
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]
BAD = ("HUGEINT", "UHUGEINT")

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sf_dir}/{t}.parquet')")
        except Exception:
            pass  # SF dirs may lack a table; queries over it will error below
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = []
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(sql)
            hits = [(c, str(ty)) for c, ty in zip(rel.columns, rel.types)
                    if any(b in str(ty).upper() for b in BAD)]
            if hits:
                bad.append((name, hits))
                print(f"✗ {name}: {hits}")
        except Exception as e:
            bad.append((name, [("<error>", str(e).splitlines()[0][:120])]))
            print(f"✗ {name}: ERROR {str(e).splitlines()[0][:120]}")
    print(f"\n{len(oracle) - len(bad)} clean, {len(bad)} hash-hostile/errored")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
