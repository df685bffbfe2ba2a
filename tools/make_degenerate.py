#!/usr/bin/env python3
"""Build the degenerate-input mirrors of a testdata directory.

Reproduces the four round-9 robustness regimes (COVERAGE.md):

  empty    zero-row copies of every table, schemas preserved exactly
  onerow   first row of every table
  nullval  keys intact; every 3rd/5th NON-KEY value NULL
           (text/lang/source, embedding/label, value/props,
            l_quantity/l_extendedprice/l_returnflag, o_totalprice/
            o_orderpriority)
  nullkey  the KEYS themselves: ts, event_type, o_orderdate, l_shipdate

Check a regime end-to-end (same two commands as the scale factors):

  python3 tools/make_degenerate.py /root/testdata/sf0.001 /tmp/sf_empty empty
  sbt -batch "runMain graft.Verify /tmp/sf_empty /tmp/out_empty"
  python3 tools/check_strict.py /tmp/sf_empty /tmp/out_empty

All 289 gates are expected crash-free AND hash-identical to DuckDB in
every regime (the per-family NULL/empty contracts are documented at
their enforcement sites and pinned by EmptyInputSpec).
"""
import os
import shutil
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

NULLVAL = {
    "documents": ("SELECT doc_id, CASE WHEN doc_id%3=1 THEN NULL ELSE text END AS text, "
                  "CASE WHEN doc_id%5=2 THEN NULL ELSE lang END AS lang, "
                  "CASE WHEN doc_id%7=3 THEN NULL ELSE source END AS source, n_chars FROM t"),
    "embeddings": ("SELECT vec_id, CASE WHEN vec_id%3=1 THEN NULL ELSE embedding END AS embedding, "
                   "CASE WHEN vec_id%5=2 THEN NULL ELSE label END AS label FROM t"),
    "events": ("SELECT event_id, ts, user_id, event_type, "
               "CASE WHEN event_id%3=1 THEN NULL ELSE value END AS value, "
               "CASE WHEN event_id%5=2 THEN NULL ELSE props END AS props FROM t"),
    "lineitem": ("SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, "
                 "CASE WHEN l_orderkey%3=1 THEN NULL ELSE l_quantity END AS l_quantity, "
                 "CASE WHEN l_orderkey%5=2 THEN NULL ELSE l_extendedprice END AS l_extendedprice, "
                 "l_discount, l_tax, "
                 "CASE WHEN l_orderkey%7=3 THEN NULL ELSE l_returnflag END AS l_returnflag, "
                 "l_linestatus, l_shipdate FROM t"),
    "orders": ("SELECT o_orderkey, o_custkey, o_orderstatus, "
               "CASE WHEN o_orderkey%3=1 THEN NULL ELSE o_totalprice END AS o_totalprice, "
               "o_orderdate, "
               "CASE WHEN o_orderkey%5=2 THEN NULL ELSE o_orderpriority END AS o_orderpriority FROM t"),
}

NULLKEY = {
    "events": ("SELECT event_id, CASE WHEN event_id%7=4 THEN NULL ELSE ts END AS ts, "
               "user_id, CASE WHEN event_id%11=5 THEN NULL ELSE event_type END AS event_type, "
               "value, props FROM t"),
    "orders": ("SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, "
               "CASE WHEN o_orderkey%9=4 THEN NULL ELSE o_orderdate END AS o_orderdate, "
               "o_orderpriority FROM t"),
    "lineitem": ("SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, "
                 "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
                 "CASE WHEN l_orderkey%9=4 THEN NULL ELSE l_shipdate END AS l_shipdate FROM t"),
}


def build(src: str, dst: str, regime: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    plans = {"nullval": NULLVAL, "nullkey": NULLKEY}.get(regime, {})
    for t in TABLES:
        f = f"{t}.parquet"
        ref = pq.read_table(f"{src}/{f}")
        if regime == "empty":
            # schema.empty_table() keeps the exact arrow schema (ns
            # timestamps etc.) — DuckDB COPY would rewrite physical types
            pq.write_table(ref.schema.empty_table(), f"{dst}/{f}")
        elif regime == "onerow":
            pq.write_table(ref.slice(0, 1), f"{dst}/{f}")
        elif t in plans:
            con.execute("CREATE OR REPLACE VIEW t AS "
                        f"SELECT * FROM read_parquet('{src}/{f}')")
            out = con.execute(plans[t]).arrow().cast(ref.schema)
            pq.write_table(out, f"{dst}/{f}")
        else:
            shutil.copy(f"{src}/{f}", f"{dst}/{f}")
        got = pq.read_table(f"{dst}/{f}")
        nulls = [c for c in got.column_names if got.column(c).null_count > 0]
        print(f"[{regime}] {t}: rows={got.num_rows}"
              + (f" nulls={nulls}" if nulls else ""))


if __name__ == "__main__":
    if len(sys.argv) != 4 or sys.argv[3] not in ("empty", "onerow",
                                                 "nullval", "nullkey"):
        sys.exit(__doc__)
    build(sys.argv[1], sys.argv[2], sys.argv[3])
