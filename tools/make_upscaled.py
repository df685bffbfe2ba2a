#!/usr/bin/env python3
"""Build a deterministic K-times upscaled mirror of a testdata directory
(the round-14 strict-hash-above-sf0.1 certification input).

Construction: K disjoint copies of every fact-ish table, copy c's keys
offset by c*10_000_000 so joins stay within-copy and every FK keeps
resolving (customer/orders/lineitem/part/supplier key families move
together; nation/region are fixed dimensions and are NOT replicated).
Two content transforms keep the heavy similarity gates LINEAR in K
instead of quadratic:

  documents   copy c>0 prefixes every non-leading word with "c<c>q" —
              within-copy shingle/minhash/simhash structure (and the
              planted-twin conventions on doc_id residues) is preserved
              per copy, while cross-copy word sets are disjoint, so
              co-shingle truth joins and LSH bands never pair rows from
              different copies.
  embeddings  copy c adds c*0.003 to every component (stored as float32
              in the mirror, so both engines read identical bytes) —
              cross-copy vectors are no longer bit-identical, keeping
              exact-duplicate blowup out of the byte-band blocking.

Everything else (timestamps, prices, text of copy 0) is byte-identical
to the source, and the whole construction is pure SQL over the source
parquet — no randomness, same mirror every run.

  python3 tools/make_upscaled.py /root/testdata/sf0.1 /tmp/sf1_mirror 10
  sbt -batch "runMain graft.Verify /tmp/sf1_mirror /tmp/out_up <gates>"
  python3 tools/check_oracle.py /tmp/sf1_mirror /tmp/out_up
  python3 tools/check_strict.py /tmp/sf1_mirror /tmp/out_up
"""
import os
import shutil
import sys

import duckdb
import pyarrow.parquet as pq

OFF = 10_000_000

# per-copy SELECT over view t (parameter {c} = copy index, 0-based)
PLANS = {
    "customer": "SELECT c_custkey + {off} AS c_custkey, * EXCLUDE (c_custkey) FROM t",
    "supplier": "SELECT s_suppkey + {off} AS s_suppkey, * EXCLUDE (s_suppkey) FROM t",
    "part": "SELECT p_partkey + {off} AS p_partkey, * EXCLUDE (p_partkey) FROM t",
    "orders": ("SELECT o_orderkey + {off} AS o_orderkey, "
               "o_custkey + {off} AS o_custkey, "
               "* EXCLUDE (o_orderkey, o_custkey) FROM t"),
    "lineitem": ("SELECT l_orderkey + {off} AS l_orderkey, "
                 "l_partkey + {off} AS l_partkey, "
                 "l_suppkey + {off} AS l_suppkey, "
                 "* EXCLUDE (l_orderkey, l_partkey, l_suppkey) FROM t"),
    "events": ("SELECT event_id + {off} AS event_id, "
               "user_id + {off} AS user_id, "
               "* EXCLUDE (event_id, user_id) FROM t"),
    "documents": ("SELECT doc_id + {off} AS doc_id, "
                  "CASE WHEN {c} = 0 THEN text "
                  "     ELSE replace(text, ' ', ' c{c}q') END AS text, "
                  "* EXCLUDE (doc_id, text) FROM t"),
    "embeddings": ("SELECT vec_id + {off} AS vec_id, "
                   "CASE WHEN {c} = 0 THEN embedding ELSE "
                   "list_transform(embedding, x -> CAST(x + {c} * 0.003 AS FLOAT)) "
                   "END AS embedding, * EXCLUDE (vec_id, embedding) FROM t"),
}

FIXED = ["region", "nation"]


def build(src: str, dst: str, k: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in FIXED:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
        print(f"[upscale] {t}: fixed dimension, copied")
    for t, plan in PLANS.items():
        f = f"{t}.parquet"
        ref = pq.read_table(f"{src}/{f}")
        con.execute("CREATE OR REPLACE VIEW t AS "
                    f"SELECT * FROM read_parquet('{src}/{f}')")
        union = " UNION ALL ".join(
            f"({plan.format(off=c * OFF, c=c)})" for c in range(k))
        # column order back to the source schema (EXCLUDE moved keys first)
        cols = ", ".join(ref.schema.names)
        out = con.execute(f"SELECT {cols} FROM ({union})").arrow()
        out = out.cast(ref.schema)
        pq.write_table(out, f"{dst}/{f}")
        got = pq.read_table(f"{dst}/{f}")
        assert got.num_rows == ref.num_rows * k, (t, got.num_rows)
        print(f"[upscale] {t}: rows={ref.num_rows} -> {got.num_rows} ({k}x)")


if __name__ == "__main__":
    if len(sys.argv) not in (3, 4):
        sys.exit(__doc__)
    build(sys.argv[1], sys.argv[2],
          int(sys.argv[3]) if len(sys.argv) == 4 else 10)
