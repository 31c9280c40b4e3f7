#!/usr/bin/env python3
"""Build a 5x copy of an SF dir with referential integrity preserved,
then (optionally) run Verify + compare_local against it.

Key columns per table are offset by copy*10M so joins stay consistent
(o_custkey still finds its customer, l_orderkey its order, ...); the
events table goes through pyarrow so its timestamp[ns] physical type
survives (DuckDB's writer would silently rewrite it as timestamp[us],
which breaks the ns->us truncation contract in Tables.events).

Usage:
  python3 tools/stress5x.py /root/testdata/sf0.1 /tmp/sf05
  sbt "runMain graft.Verify /tmp/sf05 /tmp/vout_sf05"
  python3 tools/compare_local.py /tmp/vout_sf05 /tmp/sf05

Expected at 5x of sf0.1: ALL oracle queries match. (Two historical
diffs — q1_pricing_summary, agg_stats — came from DuckDB's direct
DECIMAL->DOUBLE cast rounding 1 ulp off past 2^53 of significand;
fixed by routing the oracle SQL's decimal->double casts through
VARCHAR, whose parse is correctly rounded. See SCALING.md
"cross-engine compare envelope".)
"""
import sys, os
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

B = 10_000_000
KEYMAP = {
    'region': ['r_regionkey'],
    'nation': ['n_nationkey', 'n_regionkey'],
    'customer': ['c_custkey', 'c_nationkey'],
    'supplier': ['s_suppkey', 's_nationkey'],
    'part': ['p_partkey'],
    'orders': ['o_orderkey', 'o_custkey'],
    'lineitem': ['l_orderkey', 'l_partkey', 'l_suppkey'],
    'events': ['event_id', 'user_id'],
    'documents': ['doc_id'],
    'embeddings': ['vec_id'],
}


def copy_pyarrow(src, dst, keys, copies):
    t = pq.read_table(src)
    parts = [t]
    for c in range(1, copies):
        cols = {}
        for name in t.column_names:
            col = t[name]
            if name in keys:
                col = pc.add(col, pa.scalar(c * B, type=col.type))
            cols[name] = col
        parts.append(pa.table(cols, schema=t.schema))
    pq.write_table(pa.concat_tables(parts), dst)


def copy_duckdb(con, src, dst, keys, copies):
    types = {k: str(con.sql(f"SELECT {k} FROM '{src}' LIMIT 0").types[0])
             for k in keys}
    parts = [f"SELECT * FROM '{src}'"]
    for c in range(1, copies):
        repl = ", ".join(f"CAST({k} + {c * B} AS {types[k]}) AS {k}"
                         for k in keys)
        parts.append(f"SELECT * REPLACE ({repl}) FROM '{src}'")
    q = " UNION ALL ".join(parts)
    con.sql(f"COPY ({q}) TO '{dst}' (FORMAT PARQUET)")


def build(src_dir, dst_dir, copies):
    """Build the N-times dir (callable from tools/envelope.py)."""
    os.makedirs(dst_dir, exist_ok=True)
    con = duckdb.connect()
    for t, keys in KEYMAP.items():
        src = f'{src_dir}/{t}.parquet'
        dst = f'{dst_dir}/{t}.parquet'
        if t == 'events':  # preserve timestamp[ns]
            copy_pyarrow(src, dst, keys, copies)
        else:
            copy_duckdb(con, src, dst, keys, copies)
        n = con.sql(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f'{t}: {n} rows')


def main():
    src_dir, dst_dir = sys.argv[1], sys.argv[2]
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    build(src_dir, dst_dir, copies)


if __name__ == '__main__':
    main()
