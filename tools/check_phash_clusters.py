#!/usr/bin/env python3
"""Exact independent verifier for dd_phash_clusters on large mirrors.

dd_phash_clusters' DuckDB oracle computes the near-dup pair graph AND its
transitive closure as one recursive CTE. The closure (`reach` = every
(node, reachable-node) pair) is quadratic in component size, so on a K x
upscaled mirror — where the 8-bit phash bands saturate and components
grow with K — the recursion is the one oracle in the suite whose cost
explodes while both ENGINES' operators stay fine (Spark's gate uses
alternating-minimum label propagation, linear per round). This checker
replaces only the closure, keeping the evidence chain exact:

  1. `mm_phash_pairs` (the SAME cand/dist SQL, no recursion) must already
     be oracle + strict green on the mirror — that certifies the pair
     graph bit-for-bit.
  2. This script union-finds the ORACLE-VERIFIED pair graph in O(E a(E))
     and labels every document with the min doc_id of its component —
     definitionally the fixpoint the recursive CTE computes.
  3. Compares (doc_id, comp) exactly against Spark's dd_phash_clusters
     parquet.

Usage: python3 tools/check_phash_clusters.py SFDIR PAIRS_PARQUET_DIR CLUSTERS_PARQUET_DIR
  e.g. python3 tools/check_phash_clusters.py /tmp/sf1_mirror \\
         /tmp/out_up/mm_phash_pairs /tmp/out_up_excluded/dd_phash_clusters
"""
import sys

import duckdb


def main(sfdir: str, pairs_dir: str, clusters_dir: str) -> int:
    con = duckdb.connect()
    docs = [r[0] for r in con.execute(
        f"SELECT doc_id FROM read_parquet('{sfdir}/documents.parquet')"
    ).fetchall()]
    pairs = con.execute(
        f"SELECT id_a, id_b FROM read_parquet('{pairs_dir}/*.parquet')"
    ).fetchall()

    parent = {d: d for d in docs}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    known = set(docs)
    for a, b in pairs:
        # pairs and documents must come from the SAME mirror; a mismatched
        # dir pairing would otherwise surface as an opaque KeyError inside
        # find() instead of a diagnostic
        if a not in known or b not in known:
            print(f"[FAIL] pair ({a}, {b}) references a doc_id absent from "
                  f"{sfdir}/documents.parquet — pairs/clusters dirs don't "
                  f"match the mirror")
            return 1
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    expected = {d: find(d) for d in docs}
    got = dict(con.execute(
        f"SELECT doc_id, comp FROM read_parquet('{clusters_dir}/*.parquet')"
    ).fetchall())

    if len(got) != len(expected):
        print(f"[FAIL] row count: spark={len(got)} expected={len(expected)}")
        return 1
    bad = [(d, got.get(d), c) for d, c in expected.items() if got.get(d) != c]
    if bad:
        print(f"[FAIL] {len(bad)} mismatched components; first 5: {bad[:5]}")
        return 1
    ncomp = len(set(expected.values()))
    print(f"[ok]   dd_phash_clusters: rows={len(got)} components={ncomp} "
          f"pairs={len(pairs)} (union-find over the oracle-verified pair "
          f"graph == spark exactly)")
    return 0


if __name__ == "__main__":
    if len(sys.argv) != 4:
        sys.exit(__doc__)
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
