"""Generate an sf1-equivalent local dataset for the scaling study.

10× duplication of /root/testdata/sf0.1 with consistently re-keyed
ids (copy i adds i*stride to every key column, and to every foreign
key referencing it), so joins keep exactly the TPC-H fan-out while
row counts scale 10×. nation/region stay fixed (they are fixed-size
in TPC-H); events/documents/embeddings re-key their id columns so
dedup/grouping cardinalities scale like a real bigger corpus.

Output: /tmp/sf1/*.parquet (never written inside the repo; testdata
is read-only). Usage:

    python scripts/make_sf1.py [outdir]                    # sf0.1 -> sf1
    python scripts/make_sf1.py /tmp/sf10 --src /tmp/sf1 \
        --copies 10 --stride 10000000000                   # sf1 -> sf10

(r15: --src/--copies/--stride generalize the 10x hop, so the next
decade builds FROM the previous one — the stride must exceed the
source's max key so re-keyed copies never collide.)
"""

from __future__ import annotations

import argparse
import os

import duckdb

SRC = "/root/testdata/sf0.1"
STRIDE = 100_000_000
COPIES = 10

# table -> {column: stride-multiplier-key}; every column listed gets
# `+ i*STRIDE` in copy i. Offsets are shared per logical entity so
# foreign keys stay consistent (l_orderkey matches o_orderkey, etc.).
REKEY = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONLY = ["nation", "region"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="/tmp/sf1")
    ap.add_argument("--src", default=SRC)
    ap.add_argument("--copies", type=int, default=COPIES)
    ap.add_argument("--stride", type=int, default=STRIDE)
    args = ap.parse_args()
    out, src, copies, stride = args.out, args.src, args.copies, args.stride
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_ONLY:
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied")
    for t, keys in REKEY.items():
        cols = con.sql(
            f"SELECT * FROM read_parquet('{src}/{t}.parquet') LIMIT 0"
        ).columns
        arms = []
        for i in range(copies):
            sel = ", ".join(
                f"{c} + {i * stride} AS {c}" if c in keys else c for c in cols
            )
            arms.append(f"SELECT {sel} FROM read_parquet('{src}/{t}.parquet')")
        con.sql(
            f"COPY ({' UNION ALL '.join(arms)}) TO '{out}/{t}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 122880)"
        )
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(t, n, "rows")


if __name__ == "__main__":
    main()
