"""Deterministically scale the driver's testdata parquet by tiling.

Each tile is a key-shifted copy of the source: every key column gets
``+ tile * 1_000_000_000``, so joins match only within a tile (preserving
per-tile join cardinalities — the standard dbgen-style scale-up) and keys
never collide across tiles.  Document text is salted per tile so dedup
operators keep constant duplicate-group sizes instead of inheriting a
K-times exact-duplicate blowup that no real corpus has.

region/nation stay fixed (they are fixed-size at every TPC-H scale factor).

Usage::

    python tools/scale_testdata.py [src_dir] [dst_dir] [tiles]
    # default: /root/testdata/sf0.1 -> /root/repo/.scaled/sf1, 10 tiles
"""

from __future__ import annotations

import os
import sys

import duckdb

OFFSET = 1_000_000_000

# table -> list of key columns to shift per tile
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ["region", "nation"]


def scale(src: str, dst: str, tiles: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in FIXED:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"  {t}: copied")
    for t, keys in KEYED.items():
        cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        sel = []
        for c in cols:
            if c in keys:
                sel.append(f"{c} + r.i * {OFFSET} AS {c}")
            elif t == "documents" and c == "text":
                # per-tile salt: keeps shingle/duplicate structure per tile
                sel.append(f"text || ' r' || r.i AS text")
            else:
                sel.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(sel)} FROM '{src}/{t}.parquet', "
            f"UNNEST(range({tiles})) AS r(i)) TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"  {t}: {n} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scaled/sf1"
    tiles = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    scale(src, dst, tiles)
    print(f"scaled {src} x{tiles} -> {dst}")
