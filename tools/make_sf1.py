"""Build an sf1-EQUIVALENT dataset for full-sweep stress runs.

The driver generates sf0.001/0.01/0.1 only (TESTDATA.md) and its data
dir is read-only, so a true driver-generated sf1 does not exist in
this sandbox. This tool produces the closest honest substitute: a
deterministic 10× replication of the driver's own sf0.1 with
key-domain shifts that keep every primary/foreign-key relationship
intact (replica i shifts o_orderkey and l_orderkey by the SAME
offset, etc.), document text made unique per replica (suffix
`" r<i>"`, n_chars recomputed — so exact-dup semantics aren't
degenerate 10-way clones), and dimension tables (region, nation)
kept as-is. Both engines of the oracle sweep read the SAME parquet,
so the value-exact compare is as strict as at any driver scale —
what changes is only the data volume.

    PYTHONPATH=/root/repo python tools/make_sf1.py [out_dir] [replicas]

At the default 10 replicas (sf1-equivalent) row counts are ~1.5 GB
scale: lineitem 6.0M, orders 1.5M, events 1.0M, documents 50k,
embeddings 20k. ``replicas=100`` builds the sf10-equivalent
(VERDICT r9 task 3's 100×-class sweep): lineitem 60M, documents
500k — every key stride below clears its sf0.1 domain by ≥100×, so
the same shifts stay collision-free (largest key ≈ 10⁹, int64-safe),
and the text-uniquing suffix `" r<i>"` keeps duplicate-group SIZES
fixed while group COUNTS scale with the replicas — pair stages grow
linearly, exactly the 100 TB shape.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPLICAS = 10

#: per-table (key column → shift stride) — strides clear each key's
#: sf0.1 range so replica domains never collide
SHIFTS = {
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 100_000,
    },
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 100_000},
    "part": {"p_partkey": 1_000_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
COPY_AS_IS = ("region", "nation")


def main() -> None:
    global REPLICAS
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_replica"
    if len(sys.argv) > 2:
        REPLICAS = int(sys.argv[2])
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    for t, shifts in SHIFTS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        exprs = []
        for c in cols:
            if c in shifts:
                exprs.append(f"{c} + i * {shifts[c]} AS {c}")
            elif t == "documents" and c == "text":
                exprs.append(
                    "CASE WHEN i = 0 THEN text"
                    " ELSE text || ' r' || i END AS text"
                )
            elif t == "documents" and c == "n_chars":
                exprs.append(
                    "CASE WHEN i = 0 THEN n_chars"
                    " ELSE length(text || ' r' || i) END AS n_chars"
                )
            else:
                exprs.append(c)
        sel = ", ".join(exprs)
        con.execute(
            f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet' "
            f"CROSS JOIN range({REPLICAS}) r(i)) TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
