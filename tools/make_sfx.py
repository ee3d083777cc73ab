#!/usr/bin/env python3
"""Build an N-x replicated copy of a testdata SF dir for local scale sweeps.

The driver ships sf0.001/0.01/0.1 only; the sf1-ish spot-verification
sweep (VERDICT r4 task #4) needs a bigger input that BOTH engines read
identically. This replicates every fact table N times with a per-copy
key shift (stride 10_000_000) applied consistently across every foreign
-key family, so intra-copy join semantics are exactly the original's
and all surrogate keys stay globally unique (deterministic tie-breaks
survive). Dimension tables (region, nation) are copied once and their
keys never shift, so star joins fan out N-x — which is the point: group
sums grow N-x, exercising the cross-engine float/envelope contracts
(graft.functions.Exact) at magnitudes the shipped SFs never reach.

Timestamp physical types are preserved (coerce_timestamps=None), so the
replica carries whatever layout the source generation shipped —
TIMESTAMP(NANOS) in rounds 1-5, TIMESTAMP(MICROS) since round 6.
Tables.events branches on the ingested type and reads both.

Usage: python3 tools/make_sfx.py SRC_DIR DST_DIR N
"""
import sys, os
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

STRIDE = 10_000_000  # > every key max in the shipped SFs (<= ~2.4M at sf0.1)

# table -> columns shifted by copy_index * STRIDE (one shared stride keeps
# every foreign-key family consistent without a per-family map)
SHIFT = {
    "customer":   ["c_custkey"],
    "supplier":   ["s_suppkey"],
    "part":       ["p_partkey"],
    "orders":     ["o_orderkey", "o_custkey"],
    "lineitem":   ["l_orderkey", "l_partkey", "l_suppkey"],
    "events":     ["event_id", "user_id"],
    "documents":  ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]  # single copy, keys untouched


def main():
    src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    for t in DIMS:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        pq.write_table(tbl, f"{dst}/{t}.parquet", version="2.6",
                       coerce_timestamps=None)
        print(f"{t}: {tbl.num_rows} rows (dim, 1x)")
    for t, keys in SHIFT.items():
        tbl = pq.read_table(f"{src}/{t}.parquet")
        for k in keys:
            assert pc.max(tbl[k]).as_py() < STRIDE, f"{t}.{k} exceeds stride"
        copies = []
        for i in range(n):
            c = tbl
            for k in keys:
                idx = c.column_names.index(k)
                shifted = pc.add(c[k], pa.scalar(i * STRIDE, type=c[k].type))
                c = c.set_column(idx, c.field(idx), shifted)
            copies.append(c)
        out = pa.concat_tables(copies)
        # Cap row-group size so the file SPLITS: parquet scans
        # parallelize per row group, and a single-group 500k-doc file
        # serializes every documents query onto one task (measured: the
        # whole t-series ~70x instead of ~25x at the 100x sweep).
        # rows//64 targets ~64 groups per fact table; the 32k floor
        # keeps groups big enough that scan overhead stays negligible.
        rg = max(32768, out.num_rows // 64)
        pq.write_table(out, f"{dst}/{t}.parquet", version="2.6",
                       coerce_timestamps=None, row_group_size=rg)
        print(f"{t}: {tbl.num_rows} -> {out.num_rows} rows "
              f"(row_group={rg})")


if __name__ == "__main__":
    main()
