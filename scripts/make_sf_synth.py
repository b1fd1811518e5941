"""Synthesize a larger scale factor from an existing testdata dir by
replicating every table K times with join-preserving key offsets —
the r10 volume ritual's data generator (the gini/HHI overflow class
was caught by synthetic past-2^63 fixtures; hash-collision density,
AQE behavior, and decimal-range branches only show at volume).

Key discipline: each copy k offsets every PRIMARY key and every
FOREIGN key that references it by k × (max_key + 1) of the source
table, so referential joins (orders→customer, lineitem→orders/part/
supplier) hold exactly; the nation/region dims stay fixed (as in
TPC-H, their cardinality is scale-free). Text/embedding payloads
repeat verbatim — dedup operators then see a corpus that is 90%
near-duplicates, which is exactly the hostile shape they exist for.

Usage: python scripts/make_sf_synth.py SRC_DIR DST_DIR K
(e.g. sf0.1 × 10 ≈ sf1: 6M lineitem rows)

DuckDB does the replication (single-process, out-of-core) so the
Spark session under test sees plain parquet inputs it had no hand in
writing.
"""

from __future__ import annotations

import os
import sys

import duckdb

# table -> {column: key-space it belongs to}; key spaces are offset
# per copy by (max over their owning table's key) + 1
KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem": {
        "l_orderkey": "ord",
        "l_partkey": "part",
        "l_suppkey": "supp",
    },
    "events": {"event_id": "evt", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
KEY_OWNER = {  # key space -> (table, column) that defines its extent
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "ord": ("orders", "o_orderkey"),
    "evt": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}
FIXED = ["region", "nation"]  # scale-free dims: copied verbatim


def main() -> None:
    src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    strides = {}
    for space, (tbl, col) in KEY_OWNER.items():
        (mx,) = con.sql(
            f"SELECT max({col}) FROM '{src}/{tbl}.parquet'"
        ).fetchone()
        strides[space] = int(mx) + 1
    for t in FIXED:
        con.sql(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
            f"'{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied verbatim")
    for t, keyed_cols in KEYED.items():
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + k.copy_id * {strides[keyed_cols[c]]} AS {c}"
            if c in keyed_cols
            else c
            for c in cols
        )
        con.sql(
            f"COPY (SELECT {sel} FROM '{src}/{t}.parquet', "
            f"(SELECT unnest(range({k})) AS copy_id) k) TO "
            f"'{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        (n,) = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()
        print(f"{t}: {n} rows ({k}x)")


if __name__ == "__main__":
    main()
