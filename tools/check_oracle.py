#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py SFDIR OUTDIR [CACHEDIR]
  SFDIR  = /root/testdata/sf0.01   (parquet tables)
  OUTDIR = dir written by `sbt "runMain graft.Verify SFDIR OUTDIR"`
  CACHEDIR (optional) = directory to materialize each oracle result set as
    parquet (`CACHEDIR/<name>.parquet`) plus a `manifest.json`. Each entry
    records the md5 of the oracle SQL, the ABSOLUTE SFDIR the result was
    materialized against (round 17, per the r16 ADVICE: an md5-only key let
    one CACHEDIR reused across scale factors silently compare the wrong
    dataset's oracle rows), and the pandas dtypes a DIRECT `.df()` yields
    (so check_strict can verify the parquet round-trip reproduced them
    rather than trusting the docstring's claim that it does).
    check_strict.py treats any mismatch — or a pre-r17 string-valued
    entry — as a cache miss and re-executes the SQL. The cache exists
    because the iterated-fold graph oracles cost CPU-hours at mirror
    scale, and before round 16 the strict pass paid that price a second
    time (r15 verdict #4).

For each query parquet in OUTDIR with an entry in oracle_sql.json, runs the
SQL in DuckDB over views named after the tables and compares: schema (sorted
column names), row count, and a hash over sorted rows of sorted columns with
canonical value rendering. Prints one line per query.
"""
import sys, os, json, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rendered = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for line in rendered:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    cachedir = sys.argv[3] if len(sys.argv) > 3 else None
    manifest = {}
    if cachedir:
        os.makedirs(cachedir, exist_ok=True)
        mp = os.path.join(cachedir, "manifest.json")
        if os.path.exists(mp):
            with open(mp) as f:
                manifest = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    for name in names:
        got = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')"
        ).fetchall()
        gcols = [d[0] for d in con.description]
        if name not in oracle:
            print(f"[rows-only] {name}: rows={len(got)} cols={sorted(gcols)}")
            continue
        try:
            if cachedir:
                # materialize ONCE, then fetch + export from the temp table:
                # the expensive oracle SQL must not run again in check_strict
                con.execute(
                    f"CREATE OR REPLACE TEMP TABLE _oracle_res AS {oracle[name]}")
                want = con.execute("SELECT * FROM _oracle_res").fetchall()
                wcols = [d[0] for d in con.description]
                pq = os.path.join(cachedir, f"{name}.parquet")
                con.execute(f"COPY _oracle_res TO '{pq}' (FORMAT PARQUET)")
                # record what a DIRECT .df() yields for this result set —
                # the dtype sensitivity check_strict exists to reproduce —
                # so the cached round-trip can be verified against it
                dtypes = {c: str(t) for c, t in
                          con.execute("SELECT * FROM _oracle_res").df()
                          .dtypes.items()}
                manifest[name] = {
                    "md5": hashlib.md5(oracle[name].encode()).hexdigest(),
                    "sfdir": os.path.abspath(sfdir),
                    "dtypes": dtypes,
                }
                # write-through per gate: an interrupted run keeps every
                # result set it already paid for (the gr_* oracles are the
                # expensive ones precisely when interruption is likely)
                with open(os.path.join(cachedir, "manifest.json"), "w") as f:
                    json.dump(manifest, f, indent=1, sort_keys=True)
            else:
                want = con.execute(oracle[name]).fetchall()
                wcols = [d[0] for d in con.description]
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        ok_schema = sorted(gcols) == sorted(wcols)
        ok_rows = len(got) == len(want)
        ok_hash = ok_schema and ok_rows and \
            table_hash(gcols, got) == table_hash(wcols, want)
        if ok_hash:
            print(f"[ok]   {name}: rows={len(got)}")
            n_pass += 1
        else:
            print(f"[FAIL] {name}: schema_ok={ok_schema} "
                  f"(got {sorted(gcols)} want {sorted(wcols)}) "
                  f"rows {len(got)} vs {len(want)} hash_ok={ok_hash}")
            if ok_schema and ok_rows:
                order = sorted(range(len(gcols)), key=lambda i: gcols[i])
                gs = sorted("|".join(canon(r[i]) for i in order) for r in got)
                worder = sorted(range(len(wcols)), key=lambda i: wcols[i])
                ws = sorted("|".join(canon(r[i]) for i in worder) for r in want)
                for a, b in zip(gs, ws):
                    if a != b:
                        print(f"        first diff:\n        got  {a}\n        want {b}")
                        break
            n_fail += 1
    if cachedir:
        with open(os.path.join(cachedir, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        print(f"== oracle cache: {len(manifest)} result sets in {cachedir}")
    print(f"== {n_pass} ok, {n_fail} fail, {len(names)} outputs")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
